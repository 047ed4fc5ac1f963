"""Rotating JSON-lines log-file sink (SURVEY.md A10 — the reference's
logging_service consumes ``log_events`` and appends raw JSON lines
through a RotatingFileHandler, ``src/utils/logging_setup.py:49-77`` +
``services/logging_service.py:33-46``).

The engine's primary observability path is structured metrics TABLES
(queryable, per-partition lineage); this sink is the file-shaped analog
for operators that want tailable logs. Driver-side by design: metrics
rows are a per-round aggregate (#partitions x #rounds rows), so the
collect is tiny — raw events stay in tables and never funnel through
the driver.
"""

from __future__ import annotations

import json
import logging
import os
from logging.handlers import RotatingFileHandler

from pyspark.sql import DataFrame

LOG_MAX_BYTES = 10 * 1024 * 1024
LOG_BACKUP_COUNT = 3


class RotatingJsonLogSink:
    """Append DataFrame rows as JSON lines to a size-rotated file.

    Mirrors the reference sink's shape: minimal formatter (the raw JSON
    message only), rotation on max_bytes. ``backup_count`` keeps N rolled
    files (the reference leaves the default 0 = truncate-in-place; we
    keep history because a crawl's logs are its audit trail).
    """

    def __init__(
        self,
        path: str,
        max_bytes: int = LOG_MAX_BYTES,
        backup_count: int = LOG_BACKUP_COUNT,
    ):
        import uuid

        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        # a dedicated, non-propagating logger per sink instance — the
        # reference isolates its file writer the same way. Keyed by a
        # uuid, NOT id(self): CPython reuses addresses, and a collision
        # with an unclosed sink's registry entry would double-append its
        # stale handler (review r2)
        self._logger = logging.getLogger(
            f"RotatingJsonLogSink.{uuid.uuid4().hex}"
        )
        self._logger.setLevel(logging.INFO)
        self._logger.propagate = False
        self._handler = RotatingFileHandler(
            path, maxBytes=max_bytes, backupCount=backup_count
        )
        self._handler.setFormatter(logging.Formatter("%(message)s"))
        self._logger.addHandler(self._handler)

    def write(self, df: DataFrame, order_by: list[str] | None = None) -> int:
        """Append every row of ``df`` as one JSON line; returns the row
        count. ``order_by`` makes the line order deterministic."""
        if order_by:
            df = df.orderBy(*order_by)
        n = 0
        for row in df.toLocalIterator():
            self._logger.info(json.dumps(row.asDict(), default=str, sort_keys=True))
            n += 1
        return n

    def close(self) -> None:
        self._handler.close()
        self._logger.removeHandler(self._handler)
