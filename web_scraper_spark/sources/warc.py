"""WARC source/sink — crawl-archive interop (ISO 28500 / WARC 1.0).

The reference pipeline keeps fetched pages only as transient Kafka
messages (``services/scraper_service.py`` produces body bytes straight
to the extractor topic); any real crawl corpus instead lands in WARC —
the format Common Crawl, Heritrix, and wget share. This module gives
the engine that interop edge both ways:

- ``write_warc(df, path)`` — export fetch results as gzipped WARC
  response records, ONE file per partition written executor-side inside
  a ``mapInPandas`` pass (no driver funnel, no shuffle); returns a
  manifest DataFrame (file, n_records, n_bytes) the caller can checkpoint.
- ``read_warc(spark, path)`` — load a WARC directory back as rows via
  Spark's distributed ``binaryFile`` source + an Arrow-batched parser
  (each .warc.gz is one input split; records-per-file bounds memory the
  same way the fetch stage bounds page batches).

Per-record gzip members (the WARC convention) keep files splittable at
record granularity for tools that seek; Python's zlib handles the
concatenated members transparently on read.

Scale note: a 100 TB crawl writes WARC exactly like this — partition =
file = sequential local write, manifest rows (one per partition) are the
only driver-visible data. Readers fan out one task per file; larger
archives just mean more files, never bigger tasks.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = "\r\n"
_SOFTWARE = "web_scraper_spark/0.5"
_DEFAULT_DATE = "2026-01-01T00:00:00Z"


def _record_id(url: str) -> str:
    """Deterministic urn:uuid derived from the target URI (md5-based,
    RFC 4122 version-3 shape) — reruns produce byte-identical archives."""
    h = hashlib.md5(url.encode("utf-8")).hexdigest()
    return (
        f"<urn:uuid:{h[:8]}-{h[8:12]}-3{h[13:16]}-"
        f"{(int(h[16], 16) & 0x3 | 0x8):x}{h[17:20]}-{h[20:32]}>"
    )


def _warc_record(headers: list[tuple[str, str]], payload: bytes) -> bytes:
    head = "WARC/1.0" + _CRLF
    head += "".join(f"{k}: {v}{_CRLF}" for k, v in headers)
    head += f"Content-Length: {len(payload)}{_CRLF}{_CRLF}"
    return gzip.compress(head.encode("utf-8") + payload + b"\r\n\r\n", 6)


def _response_payload(status: int, content_type: str, body: bytes) -> bytes:
    reason = {200: "OK", 301: "Moved Permanently", 404: "Not Found"}.get(
        int(status), "Unknown"
    )
    http = (
        f"HTTP/1.1 {int(status)} {reason}{_CRLF}"
        f"Content-Type: {content_type or 'application/octet-stream'}{_CRLF}"
        f"Content-Length: {len(body)}{_CRLF}{_CRLF}"
    )
    return http.encode("utf-8") + body


def write_warc(
    df: DataFrame,
    path: str,
    *,
    warc_date: str = _DEFAULT_DATE,
    url_col: str = "url",
    status_col: str = "status",
    content_type_col: str = "content_type",
    body_col: str = "body",
) -> DataFrame:
    """Write fetch results as <path>/part-<pid>.warc.gz; returns the
    manifest (file, n_records, n_bytes). The write happens inside the
    returned DataFrame's evaluation — call an action (or hand it to a
    SnapshotTable) to materialize.

    Rows with NULL url are skipped (the fetch stage's malformed-message
    filter contract, SURVEY.md B4); NULL body writes an empty payload
    (timeout rows keep their status line so the archive preserves the
    no-retry audit trail, SURVEY.md H7).
    """
    os.makedirs(path, exist_ok=True)
    slim = df.select(
        F.col(url_col).alias("url"),
        F.col(status_col).cast("int").alias("status"),
        F.col(content_type_col).alias("content_type"),
        F.col(body_col).cast("binary").alias("body"),
    )

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        fname = os.path.join(path, f"part-{pid:05d}.warc.gz")
        n = 0
        buf = io.BytesIO()
        info_payload = (
            f"software: {_SOFTWARE}{_CRLF}format: WARC File Format 1.0{_CRLF}"
        ).encode("utf-8")
        buf.write(
            _warc_record(
                [
                    ("WARC-Type", "warcinfo"),
                    ("WARC-Record-ID", _record_id(f"warcinfo:{pid}")),
                    ("WARC-Date", warc_date),
                    ("Content-Type", "application/warc-fields"),
                ],
                info_payload,
            )
        )
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                if row.url is None:
                    continue
                body = bytes(row.body) if row.body is not None else b""
                payload = _response_payload(
                    row.status if row.status is not None else 0,
                    row.content_type,
                    body,
                )
                buf.write(
                    _warc_record(
                        [
                            ("WARC-Type", "response"),
                            ("WARC-Record-ID", _record_id(row.url)),
                            ("WARC-Date", warc_date),
                            ("WARC-Target-URI", row.url),
                            ("Content-Type", "application/http;msgtype=response"),
                        ],
                        payload,
                    )
                )
                n += 1
        if n == 0:
            yield pd.DataFrame({"file": [], "n_records": [], "n_bytes": []})
            return
        data = buf.getvalue()
        tmp = fname + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, fname)  # atomic publish, same as SnapshotTable
        yield pd.DataFrame(
            {"file": [fname], "n_records": [n], "n_bytes": [len(data)]}
        )

    return slim.mapInPandas(_write, "file string, n_records long, n_bytes long")


def _parse_warc_bytes(data: bytes) -> list[dict]:
    """Parse concatenated (possibly gzipped) WARC records. Independent of
    the writer above beyond the spec itself — the roundtrip test feeds it
    foreign-composed records too."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)  # handles concatenated members
    out = []
    pos = 0
    while True:
        start = data.find(b"WARC/", pos)
        if start < 0:
            break
        head_end = data.find(b"\r\n\r\n", start)
        if head_end < 0:
            break
        headers = {}
        for line in data[start:head_end].decode("utf-8", "replace").split(_CRLF)[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        clen = int(headers.get("content-length", "0"))
        payload = data[head_end + 4 : head_end + 4 + clen]
        pos = head_end + 4 + clen
        if headers.get("warc-type") != "response":
            continue
        http_end = payload.find(b"\r\n\r\n")
        status, ctype, body = 0, None, b""
        if http_end >= 0:
            body = payload[http_end + 4 :]
            lines = payload[:http_end].decode("utf-8", "replace").split(_CRLF)
            parts = lines[0].split(" ", 2)
            if len(parts) >= 2 and parts[1].isdigit():
                status = int(parts[1])
            for line in lines[1:]:
                k, _, v = line.partition(":")
                if k.strip().lower() == "content-type":
                    ctype = v.strip()
        out.append(
            {
                "url": headers.get("warc-target-uri"),
                "status": status,
                "content_type": ctype,
                "body": body,
                "warc_date": headers.get("warc-date"),
                "record_id": headers.get("warc-record-id"),
            }
        )
    return out


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC read: one task per .warc.gz file via the
    binaryFile source, parsed in Arrow batches."""
    files = spark.read.format("binaryFile").load(
        os.path.join(path, "*.warc.gz")
    )

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content in pdf["content"]:
                rows.extend(_parse_warc_bytes(bytes(content)))
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "status", "content_type", "body",
                    "warc_date", "record_id",
                ],
            )

    return files.select("content").mapInPandas(
        _parse,
        "url string, status int, content_type string, body binary, "
        "warc_date string, record_id string",
    )
