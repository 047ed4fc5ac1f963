"""robots.txt parsing + frontier filtering + crawl integration (graft)."""

from web_scraper_spark.sources.robots import parse_robots_body


def test_parse_star_group():
    body = """
# comment
User-agent: Googlebot
Disallow: /private
User-agent: *
Disallow: /contact
Disallow: /tmp
Crawl-delay: 1.5
"""
    disallow, delay = parse_robots_body(body)
    assert disallow == ["/contact", "/tmp"]
    assert delay == 1.5


def test_parse_multi_agent_group():
    body = "User-agent: a\nUser-agent: *\nDisallow: /x\n"
    disallow, delay = parse_robots_body(body)
    assert disallow == ["/x"] and delay is None


def test_parse_no_star_group():
    body = "User-agent: OtherBot\nDisallow: /x\n"
    assert parse_robots_body(body) == ([], None)


def test_parse_empty_disallow_allows_all():
    body = "User-agent: *\nDisallow:\n"
    assert parse_robots_body(body) == ([], None)


def test_filter_allowed(spark):
    from pyspark.sql import functions as F

    from web_scraper_spark.sources.robots import build_rules_table, filter_allowed

    pages = spark.createDataFrame(
        [("a.test", b"User-agent: *\nDisallow: /contact\n")],
        "host string, body binary",
    )
    rules = build_rules_table(pages)
    frontier = spark.createDataFrame(
        [
            ("http://a.test/contact", "a.test"),
            ("http://a.test/contact-2", "a.test"),
            ("http://a.test/about", "a.test"),
            ("http://b.test/contact", "b.test"),  # no rules -> allowed
        ],
        "url string, host string",
    )
    kept = {r.url for r in filter_allowed(frontier, rules).collect()}
    assert kept == {"http://a.test/about", "http://b.test/contact"}


def test_crawl_with_robots_matches_oracle(spark, tmp_path):
    from web_scraper_spark.oracle.simulator import simulate
    from web_scraper_spark.plans.crawl import run_crawl
    from web_scraper_spark.sources.synthetic_web import build_web, web_host_df

    seeds, web = build_web(20)
    webdf = web_host_df(spark, 20)
    oracle = simulate(seeds, web, None, use_robots=True)
    plain = simulate(seeds, web, None, use_robots=False)
    # the fixture must actually block something
    assert len(oracle.crawl_order) < len(plain.crawl_order)

    result = run_crawl(
        spark, seeds, webdf, None, workdir=str(tmp_path), use_robots=True
    )
    got = sorted(
        (r["round"], r.depth, r.seed_idx, r.url) for r in result.crawl_log.collect()
    )
    assert got == oracle.crawl_order
    assert {r.url for r in result.url_seen.collect()} == oracle.url_seen
