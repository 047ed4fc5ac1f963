"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "throughput": {...}}

Noise robustness (VERDICT r2 item 4): this VM shows ~12% hypervisor
steal, so single-shot timings vary +-30% — every headline item runs
``$SPARK_GRAFT_BENCH_REPS`` times (default 3) and reports the BEST, so
one steal-dominated driver invocation can't poison the round's record.
Per-rep raw timings ride along under "reps" for spread inspection.

Headline set:
- ``frontier_dedup``: the graft's core loop at bench scale — a synthetic
  frontier (hot-host skew baked in) pushed through canonicalize ->
  xxhash64 -> Bloom seen-set filter+insert, two batches (second batch
  50% dupes, must be filtered). Reports urls/sec.
- ``crawl_e2e``: the full HTML crawl (fetch-join + extract UDF + merge +
  image landing) over a generated synthetic web. Reports pages/sec.
- contract flagships: q1 / q5 / merge / minhash-LSH / ANN top-k /
  sessionize, plus the r3 additions dedup_cluster_labels (iterative
  pointer-jumping components) and image_phash_neardup (banded Hamming)
  over the sf parquet tables.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))


def best_of(fn, reps: int = REPS) -> tuple[float, list[float]]:
    """Run ``fn`` ``reps`` times; return (best seconds, all raw seconds).
    ``fn`` must be self-contained (own setup/teardown) so reps are
    independent."""
    raw: list[float] = []
    for _ in range(reps):
        t0 = time.monotonic()
        fn()
        raw.append(time.monotonic() - t0)
    return min(raw), raw


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    from pyspark.sql import functions as F

    from web_scraper_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}
    reps_raw: dict[str, list[float]] = {}
    throughput: dict[str, float] = {}

    # ---- frontier dedup at bench scale ---------------------------------
    n_urls = int(2_000_000 * max(sf, 0.01))

    def _urls(lo: int, hi: int):
        return spark.range(lo, hi).select(
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

    fp_box: list[int] = []

    def run_frontier_dedup() -> None:
        from web_scraper_spark.operators.seen import BloomURLSeenSet

        workdir = tempfile.mkdtemp(prefix="bench_seen_")
        try:
            seen = BloomURLSeenSet(spark, workdir, num_partitions=max(cpus, 8))
            novel1 = seen.filter_and_add(_urls(0, n_urls)).count()
            # second batch: half duplicates of batch 1, half new
            novel2 = seen.filter_and_add(
                _urls(n_urls // 2, n_urls + n_urls // 2)
            ).count()
            # Bloom is approximate: all true dupes must be dropped; a small
            # false-positive fraction of genuinely-new URLs may drop too
            assert novel1 >= 0.99 * n_urls, novel1
            assert 0.98 * (n_urls // 2) <= novel2 <= n_urls // 2, novel2
            fp_box.append((n_urls + n_urls // 2) - novel1 - novel2)
        finally:
            shutil.rmtree(workdir, ignore_errors=True)

    dt, raw = best_of(run_frontier_dedup)
    timings["frontier_dedup"] = round(dt, 3)
    reps_raw["frontier_dedup"] = [round(r, 3) for r in raw]
    throughput["frontier_dedup_urls_per_sec"] = round((n_urls * 2) / dt, 1)
    throughput["frontier_dedup_fp"] = fp_box[-1]

    # ---- end-to-end crawl over synthetic web ---------------------------
    # timed region matches r1/r2 (fixture gen included) for comparability
    n_domains = max(int(3000 * max(sf, 0.01)), 60)
    pages_box: list[int] = []

    def run_crawl_e2e() -> None:
        from web_scraper_spark.plans.crawl import run_crawl
        from web_scraper_spark.sources.synthetic_web import build_web, web_host_df

        workdir = tempfile.mkdtemp(prefix="bench_crawl_")
        try:
            seeds, _ = build_web(n_domains)
            webdf = web_host_df(spark, n_domains)
            result = run_crawl(spark, seeds, webdf, None, workdir=workdir)
            pages_box.append(result.crawl_log.count())
        finally:
            shutil.rmtree(workdir, ignore_errors=True)

    dt, raw = best_of(run_crawl_e2e)
    timings["crawl_e2e"] = round(dt, 3)
    reps_raw["crawl_e2e"] = [round(r, 3) for r in raw]
    throughput["crawl_pages_per_sec"] = round(pages_box[-1] / dt, 1)

    # ---- steady-state crawl at 5k domains (VERDICT r4 item 6) ----------
    # The 300-domain crawl_e2e is noise-dominated and includes fixture
    # generation in the timed region (kept for r1-r4 comparability). This
    # variant pre-generates a 5k-domain web (~21k pages) ONCE, caches it
    # as parquet, and times run_crawl only — per-round fixed costs
    # amortize, so pages/s approaches the politeness+fetch+extract
    # steady state (the closest local[32] proxy to the 100x-scale claim).
    # One rep: the ~2-min run self-averages over hypervisor-steal bursts
    # better than best-of-3 over 3 s runs, and keeps bench wall bounded.
    n_5k = 5000
    pages5k_box: list[int] = []
    fixture_dir = tempfile.mkdtemp(prefix="bench_web5k_")

    def run_crawl_5k() -> None:
        from web_scraper_spark.plans.crawl import run_crawl

        workdir = tempfile.mkdtemp(prefix="bench_crawl5k_")
        try:
            result = run_crawl(
                spark, seeds5k_box[0], webdf5k_box[0], None, workdir=workdir
            )
            pages5k_box.append(result.crawl_log.count())
        finally:
            shutil.rmtree(workdir, ignore_errors=True)

    from web_scraper_spark.sources.synthetic_web import build_web, web_host_df

    seeds5k, _ = build_web(n_5k)
    web_host_df(spark, n_5k).write.mode("overwrite").parquet(
        f"{fixture_dir}/web.parquet"
    )
    seeds5k_box = [seeds5k]
    webdf5k_box = [spark.read.parquet(f"{fixture_dir}/web.parquet")]
    dt, raw = best_of(run_crawl_5k, reps=1)
    timings["crawl_e2e_5k"] = round(dt, 3)
    reps_raw["crawl_e2e_5k"] = [round(r, 3) for r in raw]
    throughput["crawl_5k_pages"] = pages5k_box[-1]
    throughput["crawl_5k_pages_per_sec"] = round(pages5k_box[-1] / dt, 1)
    shutil.rmtree(fixture_dir, ignore_errors=True)

    # ---- contract flagships over the sf parquet -------------------------
    import __spark_entry__ as entry

    queries = entry.queries()
    for name in (
        "q1_pricing_summary",
        "q5_region_revenue",
        "e1_merge_records",
        "dedup_minhash_lsh",
        "dedup_cluster_labels",
        "image_phash_neardup",
        "ann_cosine_topk",
        "stream_sessionize",
    ):
        def run_query(name=name):
            df = queries[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()

        dt, raw = best_of(run_query)
        timings[name] = round(dt, 3)
        reps_raw[name] = [round(r, 3) for r in raw]

    # ---- LLM-retrieval family at >=10^5-doc corpus (VERDICT r4 item 4) -
    # The sf tables are small (5k docs / 2k vectors at sf0.1), so fixed
    # costs dominate and plan regressions hide. Expand ONCE into a temp
    # sf-layout dir — documents x32 (160k docs; a per-replica suffix
    # keeps texts distinct while cross-replica passages stay duplicated,
    # stressing the dup-gram groupBy), embeddings x8 (16k base vectors;
    # ann_ivf_scaled's own 16x in-query expansion then quantizes 256k) —
    # and time the UNCHANGED contract plans against it. Expansion is
    # outside the timed region.
    corpus_dir = tempfile.mkdtemp(prefix="bench_corpus_")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    reps32 = spark.range(32).select(F.col("id").cast("int").alias("r"))
    (
        docs.crossJoin(F.broadcast(reps32))
        .select(
            (F.col("doc_id") * 32 + F.col("r")).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" rep"), F.col("r")).alias("text"),
            "lang", "source", "n_chars",
        )
        .write.mode("overwrite").parquet(f"{corpus_dir}/documents.parquet")
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    reps8 = spark.range(8).select(F.col("id").cast("int").alias("r8"))
    (
        emb.crossJoin(F.broadcast(reps8))
        .select(
            (F.col("vec_id") * 8 + F.col("r8")).alias("vec_id"),
            F.expr(
                "transform(embedding, (x, i) -> cast(cast(x as double)"
                " + ((r8 * (i + 3)) % 5) * 0.25d as float))"
            ).alias("embedding"),
            "label",
        )
        .write.mode("overwrite").parquet(f"{corpus_dir}/embeddings.parquet")
    )
    n_big_docs = 32 * docs.count()
    for name in (
        "text_bm25_topk",
        "dedup_passages",
        "ann_ivf_scaled",
        "ann_pq_topk",
        "pack_sequences",
        "corpus_mix_sample",
    ):
        def run_big(name=name):
            df = queries[name](spark, corpus_dir)
            df.write.format("noop").mode("overwrite").save()

        dt, raw = best_of(run_big)
        timings[name] = round(dt, 3)
        reps_raw[name] = [round(r, 3) for r in raw]
    throughput["retrieval_corpus_docs"] = n_big_docs
    throughput["ivf_corpus_vectors"] = 16 * 8 * emb.count()
    shutil.rmtree(corpus_dir, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline suite wall time (frontier dedup + e2e crawl + flagship queries; best-of-%d per item)" % REPS,
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "throughput": throughput,
                "cpus": cpus,
                "reps": reps_raw,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
