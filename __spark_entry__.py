"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)``: flagship crawl-shaped pipeline on sf0.001.
``queries()``/``oracle_sql()``: one entry per implemented operator from
SURVEY.md §2 plus the training-data ops, defined in
``web_scraper_spark/plans/contract*.py`` and DuckDB-checked by the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's merge pipeline shape on sf0.001 —
    seed-dedup -> semi-join scope gate -> keyed merge -> weighted top-1
    per group (SURVEY.md E1/E5/F1/E6 composed)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    customer = spark.read.parquet(f"{sf}/customer.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")

    merged = (
        orders.groupBy("o_custkey")
        .agg(
            F.array_sort(F.array_distinct(F.collect_list("o_orderpriority"))).alias("priorities"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.count("*").alias("n_orders"),
        )
    )
    scored = (
        customer.join(merged, customer["c_custkey"] == merged["o_custkey"], "inner")
        .withColumn(
            "score",
            F.lit(10.0) * F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0)
            + F.col("total") / F.lit(100000.0),
        )
    )
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("score"), F.asc("c_custkey"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "c_nationkey", "c_custkey", "c_name", "n_orders",
            F.round("score", 4).alias("score"),
            F.array_join("priorities", "|").alias("priorities"),
        )
    )


def _registry(attr: str) -> dict:
    # NO silent except here: a failed contract-module import must surface,
    # not quietly shrink the registry (r02 recorded only 50 of 64 queries;
    # a swallowed ImportError produces exactly that symptom)
    import importlib

    from web_scraper_spark.plans.contract import ORACLES, QUERIES

    out = dict(QUERIES if attr == "QUERIES" else ORACLES)
    for mod in ("contract_training", "contract_extract"):
        m = importlib.import_module(f"web_scraper_spark.plans.{mod}")
        out.update(getattr(m, attr))
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry("QUERIES")


def oracle_sql() -> dict[str, str]:
    return _registry("ORACLES")
