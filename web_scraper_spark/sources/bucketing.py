"""Bucketed-table co-location: the exchange-free big-big join recipe.

The scale claim "co-locate joins via bucketing" needs working machinery,
not a README sentence. This module is that machinery on a local
SparkSession: ``write_bucketed`` persists a DataFrame as a Spark
bucketed + sorted table (``bucketBy`` requires ``saveAsTable`` — plain
``parquet()`` writes lose bucket metadata), and two bucketed tables that
share (bucket count, key) then sort-merge join with ZERO Exchange and
ZERO per-join Sort — verified by tests/test_plan_quality.py, which
asserts the physical plan for the join has no Exchange at all.

Where this slots in at 100 TB: the big-big joins in this engine are the
url_seen anti-join (frontier vs seen set) and the company_records MERGE
(batch vs accumulated table). Their SnapshotTable storage keeps
hash-layout files but Spark's reader can't PROVE the layout, so each
batch pays one exchange per side. On a real cluster the fix is exactly
this module's shape via the table format's bucket transform (Iceberg
``bucket(N, key)``, the SnapshotTable swap-out documented in README):
writes cluster by bucket once, every subsequent join of both sides reads
co-located splits. We keep SnapshotTable (atomic manifest commits,
crash-sweep-tested) for the crawl state and expose this as the recipe +
proof for the cluster deployment; the bucketed path also works stand-
alone for corpus joins that don't need snapshot semantics (dedup links,
token stats, embedding shards).

Bucket-count discipline: both sides MUST use the same ``buckets`` and
key; Spark joins bucketed tables without exchange only when counts match
(or one divides the other with ``spark.sql.sources.bucketing.maxBuckets``
compat). Pick buckets ~= cluster cores at the target shard size, a
power of two so a future split/merge stays aligned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    key: str | list[str],
    buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed, per-bucket-sorted parquet table in
    the session catalog. Overwrites any existing table of that name."""
    keys = [key] if isinstance(key, str) else list(key)
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(buckets, *keys)
        .sortBy(*keys)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket key. With
    matching bucket specs the physical plan is a SortMergeJoin whose both
    children read pre-bucketed, pre-sorted splits — no Exchange, no Sort."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), keys, how)
