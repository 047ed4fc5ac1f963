"""spark-submit entry point for the training-data dedup pipeline.

The documents-side twin of jobs/crawl_job.py: exact pre-dedup guard ->
MinHash-LSH candidate pairs -> connected-component clusters ->
keep-longest policy, plus the one-pass corpus funnel report. Outputs
land as parquet under --outdir; one JSON summary line prints to stdout.

Cluster usage:

    spark-submit --master yarn --deploy-mode cluster \\
        --py-files dist/web_scraper_spark.zip \\
        jobs/dedup_job.py --data-dir s3://bucket/corpus --outdir s3://bucket/dedup1

Sandbox usage:

    spark-submit --master 'local[32]' jobs/dedup_job.py \\
        --data-dir /root/testdata/sf0.01 --outdir /tmp/dedup1

``--data-dir`` must contain ``documents.parquet`` with (doc_id, text)
columns (the driver-testdata shape).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--data-dir", required=True,
                   help="directory containing documents.parquet")
    p.add_argument("--outdir", required=True)
    p.add_argument("--master", default=None,
                   help="only for plain-python runs; spark-submit sets its own")
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from web_scraper_spark.plans.contract_training import (
        corpus_funnel, dedup_cluster_labels, dedup_keep_best,
    )
    from web_scraper_spark.operators.dedup_guard import exact_prededup
    from pyspark.sql import SparkSession

    from web_scraper_spark.session import get_spark

    # only stop a session this job created (pytest drives main() under a
    # shared session fixture; get_spark reuses the active session)
    preexisting = SparkSession.getActiveSession() is not None
    spark = get_spark("dedup_job", master=args.master)
    docs = spark.read.parquet(os.path.join(args.data_dir, "documents.parquet"))
    n_docs = docs.count()

    # 1) exact pre-dedup guard (identical content collapses before LSH)
    reps, links = exact_prededup(docs, ["text"], "doc_id")
    links.write.mode("overwrite").parquet(os.path.join(args.outdir, "exact_links"))
    n_exact_dups = links.count()

    # 2) near-dup clusters + keep-longest over the full corpus (the
    # registered pipeline shapes — guard stats above tell the operator
    # whether a degenerate corpus needs reps-only input)
    labels = dedup_cluster_labels(spark, args.data_dir)
    labels.write.mode("overwrite").parquet(os.path.join(args.outdir, "clusters"))
    keepers = dedup_keep_best(spark, args.data_dir)
    keepers.write.mode("overwrite").parquet(os.path.join(args.outdir, "keepers"))
    n_clusters = keepers.count()
    n_multi = keepers.where(F.col("n_members") > 1).count()

    # 3) funnel report (exact dedup -> quality -> langid -> sample)
    funnel = corpus_funnel(spark, args.data_dir)
    funnel.write.mode("overwrite").parquet(os.path.join(args.outdir, "funnel"))

    print(json.dumps({
        "documents": n_docs,
        "exact_duplicates": n_exact_dups,
        "neardup_clusters": n_clusters,
        "clusters_with_merges": n_multi,
        "outdir": args.outdir,
    }))
    if not preexisting:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
