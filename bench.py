"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "throughput": {...}}

Headline set:
- ``frontier_dedup``: the graft's core loop at bench scale — a synthetic
  frontier (hot-host skew baked in) pushed through canonicalize ->
  xxhash64 -> Bloom seen-set filter+insert, two batches (second batch
  50% dupes, must be filtered). Reports urls/sec.
- ``crawl_e2e``: the full HTML crawl (fetch-join + extract UDF + merge +
  image landing) over a generated synthetic web. Reports pages/sec.
- contract flagships: q1 / q5 / merge / minhash-LSH / ANN top-k /
  sessionize over the sf parquet tables.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from pyspark.sql import functions as F

    from web_scraper_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    throughput: dict[str, float] = {}

    # ---- frontier dedup at bench scale ---------------------------------
    n_urls = int(2_000_000 * max(sf, 0.01))
    t0 = time.monotonic()
    workdir = tempfile.mkdtemp(prefix="bench_seen_")
    try:
        from web_scraper_spark.operators.seen import BloomURLSeenSet

        seen = BloomURLSeenSet(spark, workdir, num_partitions=max(cpus, 8))
        urls = spark.range(n_urls).select(
            F.concat(
                F.lit("http://host-"),
                # hot-host skew: 10% of urls on host 0
                F.when(F.col("id") % 10 == 0, F.lit(0)).otherwise(
                    F.col("id") % 5000
                ).cast("string"),
                F.lit(".test/page/"),
                F.col("id").cast("string"),
            ).alias("url")
        )
        novel1 = seen.filter_and_add(urls).count()
        # second batch: half duplicates of batch 1, half new
        urls2 = spark.range(n_urls // 2, n_urls + n_urls // 2).select(
            F.concat(
                F.lit("http://host-"),
                F.when(F.col("id") % 10 == 0, F.lit(0)).otherwise(
                    F.col("id") % 5000
                ).cast("string"),
                F.lit(".test/page/"),
                F.col("id").cast("string"),
            ).alias("url")
        )
        novel2 = seen.filter_and_add(urls2).count()
        dt = time.monotonic() - t0
        timings["frontier_dedup"] = round(dt, 3)
        throughput["frontier_dedup_urls_per_sec"] = round((n_urls * 2) / dt, 1)
        # Bloom is approximate: all true dupes must be dropped; a small
        # false-positive fraction of genuinely-new URLs may be dropped too
        assert novel1 >= 0.99 * n_urls, novel1
        assert 0.98 * (n_urls // 2) <= novel2 <= n_urls // 2, novel2
        throughput["frontier_dedup_fp"] = (n_urls + n_urls // 2) - novel1 - novel2
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    # ---- end-to-end crawl over synthetic web ---------------------------
    n_domains = max(int(3000 * max(sf, 0.01)), 60)
    t0 = time.monotonic()
    workdir = tempfile.mkdtemp(prefix="bench_crawl_")
    try:
        from web_scraper_spark.plans.crawl import run_crawl
        from web_scraper_spark.sources.synthetic_web import build_web, web_host_df

        seeds, _ = build_web(n_domains)
        webdf = web_host_df(spark, n_domains)
        result = run_crawl(spark, seeds, webdf, None, workdir=workdir)
        pages = result.crawl_log.count()
        dt = time.monotonic() - t0
        timings["crawl_e2e"] = round(dt, 3)
        throughput["crawl_pages_per_sec"] = round(pages / dt, 1)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    # ---- contract flagships over the sf parquet -------------------------
    import __spark_entry__ as entry

    queries = entry.queries()
    for name in (
        "q1_pricing_summary",
        "q5_region_revenue",
        "e1_merge_records",
        "dedup_minhash_lsh",
        "ann_cosine_topk",
        "stream_sessionize",
    ):
        t0 = time.monotonic()
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.monotonic() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline suite wall time (frontier dedup + e2e crawl + flagship queries)",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "throughput": throughput,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
