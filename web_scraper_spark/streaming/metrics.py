"""Structured-Streaming metrics path (reference analytics_service.py:41-71
emitted a JSON report every 30 s; SURVEY.md G3 maps that to a tumbling
processing-time window — here implemented as a real ``readStream`` with
event-time windows + watermark, the scalable form for the crawl's
log-event firehose).

The crawl's batch path appends metrics rows per round (plans/crawl);
this module is the continuous alternative: a file-source stream over the
same events schema -> watermarked windowed aggregation -> any sink.
At 100 TB scale the input would be the fetcher fleet's event stream
(Kafka/files); the query shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over events-shaped parquet (one file per
    micro-batch in tests; on a cluster this is the landing dir the
    fetcher fleet appends to)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def windowed_coverage_report(events: DataFrame, window: str = "1 hour",
                             watermark: str = "2 hours") -> DataFrame:
    """G1/G3 streaming form: per event-time window, produced/fetched
    distinct-user counts + value sum. Watermark bounds state for late
    data; approx_count_distinct keeps state O(1) per window (exact
    distinct is unbounded state on an infinite stream)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.approx_count_distinct(
                F.when(F.col("event_type") == "view", F.col("user_id"))
            ).alias("produced"),
            F.approx_count_distinct(
                F.when(F.col("event_type") == "purchase", F.col("user_id"))
            ).alias("fetched"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm").alias("window_start"),
            "produced", "fetched", "n_events", "total_value",
        )
    )


def run_to_memory(stream_df: DataFrame, name: str, timeout_s: float = 60.0):
    """Drain a bounded file-source stream into an in-memory table
    (test/report harness): processes all available data then stops."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q
