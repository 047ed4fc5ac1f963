"""Priority-queue frontier: non-default priorities change the politeness
drain order deterministically, identically in engine and oracle."""

from pyspark.sql import functions as F

from web_scraper_spark.oracle.simulator import simulate
from web_scraper_spark.plans.crawl import run_crawl
from web_scraper_spark.sources.synthetic_web import build_web, web_host_df


def test_custom_priority_matches_oracle(spark, tmp_path):
    seeds, web = build_web(15)
    webdf = web_host_df(spark, 15)

    # reverse-FIFO: later seeds drain first (a deliberately order-changing
    # priority), same rule on both sides
    def oracle_priority(url, host, depth, seed_idx):
        return -seed_idx

    def engine_priority(df):
        return -F.col("seed_idx")

    oracle = simulate(seeds, web, None, politeness_budget=2,
                      priority_fn=oracle_priority)
    default_oracle = simulate(seeds, web, None, politeness_budget=2)
    # the priority actually changed the schedule
    assert oracle.crawl_order != default_oracle.crawl_order
    # ...but not the crawled content (same set of work; only
    # order-dependent fields — last-writer url, list order — may differ)
    assert oracle.url_seen == default_oracle.url_seen

    def content(docs):
        return {
            d: {
                k: (sorted(v) if isinstance(v, list) else v)
                for k, v in doc.items()
                if k != "url"
            }
            for d, doc in docs.items()
        }

    assert content(oracle.documents) == content(default_oracle.documents)

    result = run_crawl(
        spark, seeds, webdf, None, workdir=str(tmp_path),
        politeness_budget=2, priority_expr=engine_priority,
    )
    got = sorted(
        (r["round"], r.depth, r.seed_idx, r.url) for r in result.crawl_log.collect()
    )
    assert got == oracle.crawl_order
    assert {r.url for r in result.url_seen.collect()} == oracle.url_seen
