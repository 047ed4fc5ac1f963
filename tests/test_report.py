"""Coverage/fill-rate report vs oracle-derived expectations (SURVEY.md
G1/G2; the reference's README.md:236-246 metric set)."""

import pytest


def test_coverage_report_matches_oracle(spark, tmp_path):
    from web_scraper_spark.oracle.simulator import simulate
    from web_scraper_spark.plans.crawl import run_crawl
    from web_scraper_spark.plans.report import coverage_report, lineage_report
    from web_scraper_spark.sources.synthetic_web import build_web, web_host_df

    seeds, web = build_web(25)
    webdf = web_host_df(spark, 25)
    oracle = simulate(seeds, web, None)
    result = run_crawl(spark, seeds, webdf, None, workdir=str(tmp_path))

    rep = coverage_report(result)
    assert rep["urls_produced"] == len(
        {e[3] for e in oracle.crawl_order if e[1] == 0}
    )
    # domains with data == oracle documents with a url (extraction ran)
    exp_domains = sum(1 for d in oracle.documents.values() if d["url"])
    assert rep["domains_with_data"] == exp_domains
    exp_phone_fill = sum(
        1 for d in oracle.documents.values() if d["phone_numbers"]
    )
    assert rep["fill_rate_phones_pct"] == round(
        100.0 * exp_phone_fill / rep["urls_produced"], 2
    )
    assert 0 < rep["coverage_pct"] <= 100.0
    assert rep["fetches_ok"] == oracle.fetched_ok + len(oracle.images)

    lineage = lineage_report(result)
    assert lineage.where("attempted < ok").isEmpty()
    assert lineage.count() > 0
