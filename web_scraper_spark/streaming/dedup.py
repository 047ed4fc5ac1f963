"""Streaming URL-seen dedup: the continuous-ingest twin of the batch
partitioned seen set (operators/seen.py), built on
``applyInPandasWithState`` (SURVEY.md input-hint: custom stateful
operators go through the Arrow-batched state API).

Design mirrors the batch layout 1:1: urls are keyed by
``pmod(xxhash64(url), P)`` — the SAME partitioning the batch Bloom/exact
sets use — and each key's GroupState holds the sorted int64 hash array of
everything that partition has seen. A micro-batch emits only the novel
urls. State is hashes, not urls (64-bit; collision probability ~n²/2⁻⁶⁴
per partition — the same compaction trade the batch Bloom mode makes,
except here collisions are the ONLY FP source).

The batch oracle in tests is a plain ``dropDuplicates`` over the
concatenated micro-batches: first occurrence wins in both.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "url string"
STATE_SCHEMA = "hashes binary"
DEFAULT_PARTITIONS = 8


def _dedup_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        seen = set(np.frombuffer(state.get[0], dtype=np.int64).tolist())
    else:
        seen = set()
    out: list[str] = []
    for pdf in pdfs:
        # in-batch first-occurrence order, then the cross-batch state test
        pdf = pdf.drop_duplicates("url")
        for url, h in zip(pdf["url"], pdf["hash"]):
            h = int(h)
            if h not in seen:
                seen.add(h)
                out.append(url)
    state.update((np.array(sorted(seen), dtype=np.int64).tobytes(),))
    yield pd.DataFrame({"url": out})


def dedup_stream(urls: DataFrame, num_partitions: int = DEFAULT_PARTITIONS) -> DataFrame:
    """url stream -> novel-url stream (exactly the urls a batch
    ``dropDuplicates`` would keep, emitted in the micro-batch where each
    first appeared)."""
    keyed = urls.select("url", F.xxhash64("url").alias("hash")).withColumn(
        "partition_id", F.pmod(F.col("hash"), F.lit(num_partitions)).cast("int")
    )
    return keyed.groupBy("partition_id").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
