"""Extra benchmarks for the optimization rounds (bench.py is FROZEN).

Per-query isolation per the optimization guide §1.4: each query is timed
against the noop sink (computes every column, discards output), labeled
via setJobDescription, and its ``explain("formatted")`` is captured to
``plans/<round>/<name>_<tag>.txt`` for plan-diff evidence.

Usage:
    python bench_extra.py [--names a,b,c] [--reps 3] [--tag before]
                          [--corpus]    # use the bench.py expanded corpus
                          [--explain-only]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Prints one JSON line {"queries": {name: best_sec}, "reps": {...}}.
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import time


def expand_corpus(spark, sf_dir: str, out_dir: str) -> None:
    """Replicate bench.py's corpus expansion (documents x32, embeddings x8)."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    reps32 = spark.range(32).select(F.col("id").cast("int").alias("r"))
    (
        docs.crossJoin(F.broadcast(reps32))
        .select(
            (F.col("doc_id") * 32 + F.col("r")).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" rep"), F.col("r")).alias("text"),
            "lang", "source", "n_chars",
        )
        .write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
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
        .write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")
    )
    # other tables pass through untouched so every query runs
    import shutil

    for name in os.listdir(sf_dir):
        src = os.path.join(sf_dir, name)
        dst = os.path.join(out_dir, name)
        if name.endswith(".parquet") and not os.path.exists(dst):
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copy2(src, dst)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default="")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--tag", default="")
    ap.add_argument("--corpus", action="store_true")
    ap.add_argument("--explain-only", action="store_true")
    ap.add_argument("--plans-dir", default="plans/r06")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from web_scraper_spark.session import get_spark

    spark = get_spark(
        "bench_extra", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    queries = entry.queries()
    names = [n for n in args.names.split(",") if n] or list(queries)

    data_dir = sf_dir
    tmp = None
    if args.corpus:
        tmp = tempfile.mkdtemp(prefix="bx_corpus_")
        expand_corpus(spark, sf_dir, tmp)
        data_dir = tmp

    timings: dict[str, float] = {}
    reps_raw: dict[str, list[float]] = {}
    try:
        for name in names:
            fn = queries[name]
            if args.tag:
                os.makedirs(args.plans_dir, exist_ok=True)
                with open(
                    os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"), "w"
                ) as f:
                    f.write(fn(spark, data_dir)._jdf.queryExecution().explainString(
                        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                    ))
            if args.explain_only:
                continue
            raw = []
            for _ in range(args.reps):
                spark.sparkContext.setJobDescription(f"bx:{name}")
                t0 = time.monotonic()
                fn(spark, data_dir).write.format("noop").mode("overwrite").save()
                raw.append(round(time.monotonic() - t0, 3))
                spark.sparkContext.setJobDescription(None)
            timings[name] = min(raw)
            reps_raw[name] = raw
    finally:
        if tmp:
            import shutil

            shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps({"queries": timings, "reps": reps_raw}))
    spark.stop()


if __name__ == "__main__":
    main()
