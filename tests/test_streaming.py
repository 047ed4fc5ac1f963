"""Structured Streaming surface: windowed metrics report + stateful
sessionizer, each cross-checked against its batch twin on the same data."""

import os
import shutil

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def events_dir(spark, sf_dir, tmp_path):
    """Split the events table into 3 time-sliced parquet files (3
    micro-batches arriving in event-time order, like a real stream —
    the stateful operator assumes per-user in-order arrival within its
    watermarkless design)."""
    src = spark.read.parquet(f"{sf_dir}/events.parquet").cache()
    bounds = src.approxQuantile("value", [0.0], 0.0)  # warm cache
    lo, hi = src.agg(F.min("ts"), F.max("ts")).collect()[0]
    out = str(tmp_path / "events_stream")
    os.makedirs(out, exist_ok=True)
    span = (hi - lo) / 3
    # three sequential appends -> strictly increasing file mtimes, so the
    # file stream source replays the slices in event-time order
    import time as _time

    for i in range(3):
        start = lo + span * i
        end = hi if i == 2 else lo + span * (i + 1)
        cond = (F.col("ts") >= start) & (
            (F.col("ts") <= end) if i == 2 else (F.col("ts") < end)
        )
        (
            src.where(cond)
            .orderBy("ts", "event_id")
            .coalesce(1)
            .write.mode("append")
            .parquet(out)
        )
        _time.sleep(1.1)  # distinct whole-second mtimes
    return out


def test_windowed_report_matches_batch(spark, events_dir):
    from web_scraper_spark.streaming.metrics import (
        events_stream, run_to_memory, windowed_coverage_report,
    )

    stream = events_stream(spark, events_dir)
    assert stream.isStreaming
    q = run_to_memory(windowed_coverage_report(stream, "1 hour"), "rep")
    got = {
        r.window_start: (r.n_events, r.total_value)
        for r in spark.table("rep").collect()
    }

    batch = (
        spark.read.parquet(events_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("ws"), "n", "v"
        )
    )
    exp = {r.ws: (r.n, r.v) for r in batch.collect()}
    assert got == exp
    q.stop()


def test_stateful_sessionize_matches_batch(spark, events_dir, tmp_path):
    from web_scraper_spark.streaming.metrics import events_stream
    from web_scraper_spark.streaming.sessionize import sessionize_stream

    stream = events_stream(spark, events_dir)
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sess")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode: last row per user wins
    got_df = spark.table("sess")
    from pyspark.sql import Window

    rows = got_df.collect()
    # aggregate: take the max (monotone counters) per user
    got = {}
    for r in rows:
        cur = got.get(r.user_id, (0, 0))
        got[r.user_id] = (max(cur[0], r.n_sessions), max(cur[1], r.n_events))

    # batch oracle (same semantics as contract stream_sessionize)
    e = spark.read.parquet(events_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sess = F.sum(F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)).over(w)
    exp = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in e.withColumn("sid", sess)
        .groupBy("user_id")
        .agg(F.countDistinct("sid").alias("n_sessions"), F.count("*").alias("n_events"))
        .collect()
    }
    assert got == exp
    q.stop()


def test_streaming_dedup_matches_batch_distinct(spark, events_dir, tmp_path):
    """The streaming URL-seen twin: novel urls across micro-batches ==
    batch dropDuplicates over the whole stream (first occurrence wins),
    with the same pmod(xxhash64) partitioning as the batch seen set."""
    from web_scraper_spark.streaming.dedup import dedup_stream

    # derive a url column with heavy cross-batch duplication
    def urls_of(df):
        return df.select(
            F.concat(
                F.lit("http://u"), F.col("user_id").cast("string"),
                F.lit(".test/e/"), F.pmod(F.col("event_id"), F.lit(7)).cast("string"),
            ).alias("url")
        )

    stream = (
        spark.readStream.schema(spark.read.parquet(events_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    q = (
        dedup_stream(urls_of(stream))
        .writeStream.format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ck_dedup"))
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {r.url for r in spark.sql("SELECT url FROM dedup_out").collect()}
    exp = {r.url for r in urls_of(spark.read.parquet(events_dir)).distinct().collect()}
    assert got == exp
    # and no url was emitted twice (dedup actually deduped)
    n_emitted = spark.sql("SELECT count(*) c FROM dedup_out").collect()[0].c
    assert n_emitted == len(exp)
