"""Re-extract an archived crawl: WARC in, extraction parquet out.

    spark-submit --py-files dist/web_scraper_spark.zip jobs/reprocess_job.py \
        --warc '<workdir>/warc/round=*' --out /path/to/extracted
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--warc", required=True,
                   help="WARC directory or glob (e.g. <workdir>/warc/round=*)")
    p.add_argument("--out", required=True, help="output parquet directory")
    args = p.parse_args(argv)

    from web_scraper_spark.plans.reprocess import extract_from_warc
    from web_scraper_spark.session import get_spark

    spark = get_spark("reprocess_job")
    extract_from_warc(spark, args.warc).write.mode("overwrite").parquet(args.out)


if __name__ == "__main__":
    main()
