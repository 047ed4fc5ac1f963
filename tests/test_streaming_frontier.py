"""Streaming frontier ingest vs the batch twin: identical seed files
replayed through prepare+dedup+assign_rounds must produce the same
(url, round_offset) sets per micro-batch."""

import os
import time

from pyspark.sql import functions as F

from web_scraper_spark.functions.urls import host_of
from web_scraper_spark.operators.politeness import assign_rounds
from web_scraper_spark.oracle.simulator import prepare_url
from web_scraper_spark.sources.tables import SnapshotTable
from web_scraper_spark.streaming.frontier import ingest_seed_stream

BATCH1 = [
    "hot.test/a", "hot.test/b", "hot.test/c", "cool.test/x",
    "", "  ", "hot.test/a",          # blanks + in-batch dup
]
BATCH2 = [
    "hot.test/b",                     # cross-batch dup -> dropped
    "hot.test/d", "warm.test/y",
]


def _write(seed_dir, name, lines):
    with open(os.path.join(seed_dir, name), "w") as f:
        f.write("\n".join(lines) + "\n")


def test_stream_matches_batch_twin(spark, tmp_path):
    seed_dir = tmp_path / "seeds"
    seed_dir.mkdir()
    _write(seed_dir, "b1.txt", BATCH1)

    q = ingest_seed_stream(
        spark, str(seed_dir), str(tmp_path), politeness_budget=2
    )
    try:
        q.processAllAvailable()
        _write(seed_dir, "b2.txt", BATCH2)
        # the file source lists on trigger; processAllAvailable after the
        # write drains the new file as its own micro-batch
        time.sleep(0.5)
        q.processAllAvailable()
    finally:
        q.stop()

    table = SnapshotTable(spark, str(tmp_path / "frontier_stream"))
    got = [
        (r.seed_idx, r.url, r.round_offset)
        for r in table.read().collect()
    ]

    # batch twin: same files, same dedup-across-batches, same scheduler
    seen: set[str] = set()
    expected = []
    for b, lines in enumerate([BATCH1, BATCH2]):
        urls, in_batch = [], set()
        for line in lines:
            if not line.strip():
                continue
            u = prepare_url(line)
            if u in seen or u in in_batch:
                continue
            in_batch.add(u)
            urls.append(u)
        seen |= in_batch
        df = spark.createDataFrame(
            [(u,) for u in urls], "url string"
        ).select(
            "url", host_of(F.col("url")).alias("host"),
            F.lit(0).cast("int").alias("depth"),
            F.lit(b).cast("long").alias("seed_idx"),
            F.col("url").alias("seed_url"),
            F.lit(None).cast("string").alias("caption"),
            F.lit(float(b)).alias("priority"),
        )
        expected += [
            (b, r.url, r.round_offset)
            for r in assign_rounds(df, 2).collect()
        ]
    assert sorted(got) == sorted(expected)
    # the hot host actually split into politeness rounds in batch 0
    assert {ro for (b, u, ro) in got if b == 0 and "hot.test" in u} == {0, 1}
