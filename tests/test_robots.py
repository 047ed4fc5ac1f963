"""robots.txt parsing + frontier filtering + crawl integration (graft).
Matching per RFC 9309 §2.2.2: Disallow/Allow longest-match wins, ties to
Allow."""

from web_scraper_spark.sources.robots import parse_robots_body


def test_parse_star_group():
    body = """
# comment
User-agent: Googlebot
Disallow: /private
User-agent: *
Disallow: /contact
Disallow: /tmp
Allow: /contact-1
Crawl-delay: 1.5
"""
    disallow, allow, delay = parse_robots_body(body)
    assert disallow == ["/contact", "/tmp"]
    assert allow == ["/contact-1"]
    assert delay == 1.5


def test_parse_multi_agent_group():
    body = "User-agent: a\nUser-agent: *\nDisallow: /x\n"
    disallow, allow, delay = parse_robots_body(body)
    assert disallow == ["/x"] and allow == [] and delay is None


def test_parse_no_star_group():
    body = "User-agent: OtherBot\nDisallow: /x\nAllow: /y\n"
    assert parse_robots_body(body) == ([], [], None)


def test_parse_empty_disallow_allows_all():
    body = "User-agent: *\nDisallow:\n"
    assert parse_robots_body(body) == ([], [], None)


def test_filter_allowed(spark):
    from web_scraper_spark.sources.robots import build_rules_table, filter_allowed

    pages = spark.createDataFrame(
        [
            ("a.test", b"User-agent: *\nDisallow: /contact\nAllow: /contact-1\n"),
            # tie between Allow and Disallow of equal length -> Allow wins
            ("c.test", b"User-agent: *\nDisallow: /x\nAllow: /x\n"),
        ],
        "host string, body binary",
    )
    rules = build_rules_table(pages)
    frontier = spark.createDataFrame(
        [
            ("http://a.test/contact", "a.test"),
            ("http://a.test/contact-1", "a.test"),  # Allow override (longer)
            ("http://a.test/contact-2", "a.test"),
            ("http://a.test/about", "a.test"),
            ("http://b.test/contact", "b.test"),  # no rules -> allowed
            ("http://c.test/x", "c.test"),  # equal-length tie -> allowed
        ],
        "url string, host string",
    )
    kept = {r.url for r in filter_allowed(frontier, rules).collect()}
    assert kept == {
        "http://a.test/contact-1",
        "http://a.test/about",
        "http://b.test/contact",
        "http://c.test/x",
    }


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
    # ...and the Allow-override must actually save something: an i%8==3
    # host's /contact-1 fetched under robots despite Disallow: /contact
    allowed_back = [
        u for (_, _, _, u) in oracle.crawl_order
        if "/contact-1" in u and any(
            f"acme-{i:04d}" in u for i in range(20) if i % 8 == 3
        )
    ]
    assert allowed_back, "fixture lost its Allow-override coverage"

    result = run_crawl(
        spark, seeds, webdf, None, workdir=str(tmp_path), use_robots=True
    )
    got = sorted(
        (r["round"], r.depth, r.seed_idx, r.url) for r in result.crawl_log.collect()
    )
    assert got == oracle.crawl_order
    assert {r.url for r in result.url_seen.collect()} == oracle.url_seen
