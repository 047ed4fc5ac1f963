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


def _webdf(spark, rows):
    from pyspark.sql.types import (
        BinaryType, IntegerType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("url", StringType()), StructField("host", StringType()),
        StructField("depth", IntegerType()), StructField("status", IntegerType()),
        StructField("content_type", StringType()), StructField("body", BinaryType()),
    ])
    return spark.createDataFrame(
        [(r.url, r.host, r.depth, r.status, r.content_type, r.body) for r in rows],
        schema,
    )


def test_robots_blocking_entire_staged_depth(spark, tmp_path):
    """Review r2 regression: when robots rules block EVERY discovered
    contact, the staged depth empties after assignment — the crawl must
    finish cleanly (the manifest-only loop crashed on min() of an empty
    dir map), matching the oracle."""
    from web_scraper_spark.oracle.simulator import simulate
    from web_scraper_spark.plans.crawl import run_crawl
    from web_scraper_spark.sources.synthetic_web import WebRow

    page = (b"<html><body><a href='tel:+1 (212) 555-0000'>c</a>"
            b"<a href='/contact'>Contact us</a></body></html>")
    web = [
        WebRow("http://solo.test", "solo.test", 0, 200, "text/html", page),
        WebRow("http://solo.test/contact", "solo.test", 1, 200, "text/html",
               b"<html><body>hi</body></html>"),
        WebRow("http://solo.test/robots.txt", "solo.test", 0, 200, "text/plain",
               b"User-agent: *\nDisallow: /contact\n"),
    ]
    oracle = simulate(["solo.test"], web, None, use_robots=True)
    assert [u for *_, u in oracle.crawl_order] == ["http://solo.test"]
    result = run_crawl(
        spark, ["solo.test"], _webdf(spark, web), None,
        workdir=str(tmp_path), use_robots=True,
    )
    got = sorted((r["round"], r.depth, r.seed_idx, r.url)
                 for r in result.crawl_log.collect())
    assert got == oracle.crawl_order
    # the blocked contact is still discovered (url_seen keeps it)
    assert "http://solo.test/contact" in {r.url for r in result.url_seen.collect()}


def test_robots_matches_raw_url_not_canonical(spark, tmp_path):
    """Review r2 regression: a 'Disallow: /app/' rule must block the RAW
    frontier url 'http://h/app/' on BOTH sides — the oracle used to test
    the canonicalized url (trailing slash stripped) and diverge."""
    from web_scraper_spark.oracle.simulator import simulate
    from web_scraper_spark.plans.crawl import run_crawl
    from web_scraper_spark.sources.synthetic_web import WebRow

    body = b"<html><body>x</body></html>"
    web = [
        WebRow("http://trail.test/app", "trail.test", 0, 200, "text/html", body),
        WebRow("http://trail.test/apple", "trail.test", 0, 200, "text/html", body),
        WebRow("http://trail.test/robots.txt", "trail.test", 0, 200, "text/plain",
               b"User-agent: *\nDisallow: /app/\n"),
    ]
    seeds = ["trail.test/app/", "trail.test/apple"]
    oracle = simulate(seeds, web, None, use_robots=True)
    # blocked: the raw trailing-slash url matches '/app/'; control survives
    assert [u for *_, u in oracle.crawl_order] == ["http://trail.test/apple"]
    result = run_crawl(
        spark, seeds, _webdf(spark, web), None,
        workdir=str(tmp_path), use_robots=True,
    )
    got = sorted((r["round"], r.depth, r.seed_idx, r.url)
                 for r in result.crawl_log.collect())
    assert got == oracle.crawl_order


def test_rule_to_regex_wildcards():
    from web_scraper_spark.sources.robots import rule_matches, rule_to_regex

    assert rule_to_regex("/a*.jpg$") == r"^/a.*\.jpg$"
    assert rule_matches("/*.jpg$", "/img/x.jpg")
    assert rule_matches("/*?sid=", "/page?sid=1")      # query-string rule
    assert not rule_matches("/*.jpg$", "/img/x.jpgx")  # $ anchors
    assert not rule_matches("/p$", "/xp")              # $ with no * = exact
    assert rule_matches("/a*b", "/aXXXb/tail")  # unanchored tail ok
    assert not rule_matches("/a*b", "/b/a")     # ^ anchors at path start
    assert rule_matches("/p(1)", "/p(1)")       # meta chars stay literal


def test_filter_allowed_wildcards(spark):
    from web_scraper_spark.sources.robots import build_rules_table, filter_allowed

    pages = spark.createDataFrame(
        [("w.test", b"User-agent: *\nDisallow: /*.jpg$\nAllow: /keep*.jpg$\n")],
        "host string, body binary",
    )
    rules = build_rules_table(pages)
    frontier = spark.createDataFrame(
        [
            ("http://w.test/img/a.jpg", "w.test"),      # blocked by wildcard
            ("http://w.test/img/a.jpgx", "w.test"),     # $ anchor -> allowed
            ("http://w.test/keep-me.jpg", "w.test"),    # longer Allow wins
            ("http://w.test/img/a.png", "w.test"),      # no rule -> allowed
        ],
        "url string, host string",
    )
    kept = {r.url for r in filter_allowed(frontier, rules).collect()}
    assert kept == {
        "http://w.test/img/a.jpgx",
        "http://w.test/keep-me.jpg",
        "http://w.test/img/a.png",
    }


def test_crawl_wildcard_robots_matches_oracle(spark, tmp_path):
    """Wildcard rules end to end: '/*.jpg$'-style disallow blocks a
    discovered contact page on BOTH sides, the non-matching sibling is
    fetched."""
    from web_scraper_spark.oracle.simulator import simulate
    from web_scraper_spark.plans.crawl import run_crawl
    from web_scraper_spark.sources.synthetic_web import WebRow

    page = (b"<html><body>"
            b"<a href='/contact-print.jpg'>Contact us</a>"
            b"<a href='/contact-plain'>Contact us</a>"
            b"</body></html>")
    sub = b"<html><body><a href='tel:+1 (212) 555-0000'>c</a></body></html>"
    web = [
        WebRow("http://wild.test", "wild.test", 0, 200, "text/html", page),
        WebRow("http://wild.test/contact-print.jpg", "wild.test", 1, 200, "text/html", sub),
        WebRow("http://wild.test/contact-plain", "wild.test", 1, 200, "text/html", sub),
        WebRow("http://wild.test/robots.txt", "wild.test", 0, 200, "text/plain",
               b"User-agent: *\nDisallow: /*.jpg$\n"),
    ]
    oracle = simulate(["wild.test"], web, None, use_robots=True)
    assert sorted(u for *_, u in oracle.crawl_order) == [
        "http://wild.test", "http://wild.test/contact-plain",
    ]
    result = run_crawl(
        spark, ["wild.test"], _webdf(spark, web), None,
        workdir=str(tmp_path), use_robots=True,
    )
    got = sorted((r["round"], r.depth, r.seed_idx, r.url)
                 for r in result.crawl_log.collect())
    assert got == oracle.crawl_order


def test_wildcard_matchers_agree_fuzz():
    """The engine's regex translation (rule_to_regex + re) and the
    oracle's independent greedy segment scan must agree on random
    pattern/text pairs — the two implementations exist precisely so a
    bug in one is caught by the other."""
    import random

    from web_scraper_spark.oracle.simulator import wildcard_rule_matches
    from web_scraper_spark.sources.robots import rule_matches

    rng = random.Random(7)
    for _ in range(3000):
        pat = "/" + "".join(rng.choice("ab*.$/?") for _ in range(rng.randrange(0, 8)))
        txt = "/" + "".join(rng.choice("ab.$/?x") for _ in range(rng.randrange(0, 10)))
        assert rule_matches(pat, txt) == wildcard_rule_matches(pat, txt), (pat, txt)
    # second band: %-escapes (valid, invalid, reserved, multi-byte) and a
    # raw non-ASCII char, stressing the §2.2.2 normalization on both sides
    for _ in range(3000):
        pat = "/" + "".join(
            rng.choice(["a", "b", "*", "$", "/", "%", "2", "6", "F", "C3", "A9", "é"])
            for _ in range(rng.randrange(0, 7))
        )
        txt = "/" + "".join(
            rng.choice(["a", "b", ".", "$", "/", "%", "2", "6", "f", "c3", "a9", "é", "x"])
            for _ in range(rng.randrange(0, 9))
        )
        assert rule_matches(pat, txt) == wildcard_rule_matches(pat, txt), (pat, txt)


def test_pct_escape_normalization():
    """RFC 9309 §2.2.2 percent-encoding comparison — asserted on BOTH
    independent matchers (engine regex translation + oracle position-set
    sweep)."""
    from web_scraper_spark.oracle.simulator import wildcard_rule_matches
    from web_scraper_spark.sources.robots import rule_matches

    cases = [
        # escaped non-reserved octets match either spelling of the path
        ("/caf%C3%A9", "/café", True),
        ("/caf%C3%A9", "/caf%C3%A9", True),
        ("/caf%C3%A9", "/caf%c3%a9", True),     # hex case-insensitive
        ("/café", "/caf%C3%A9", True),          # raw non-ASCII rule, escaped path
        ("/café", "/café", True),
        ("/%61bc", "/abc", True),               # needlessly-escaped unreserved
        ("/%61bc", "/%61bc", True),
        # escaped RESERVED octets match only their escape form
        ("/a%2Fb", "/a%2Fb", True),
        ("/a%2Fb", "/a%2fb", True),
        ("/a%2Fb", "/a/b", False),
        ("/a/b", "/a%2Fb", False),              # raw ASCII stays literal-only
        ("/abc", "/%61bc", False),              # plain prefix never rewrites path
        # invalid escape -> literal '%'
        ("/100%", "/100%", True),
        ("/100%25", "/100%25", True),
        ("/100%25", "/100%", False),            # %25 is reserved: escape-only
        # wildcards + anchors still compose with normalization
        ("/caf%C3%A9*.jpg$", "/café/x.jpg", True),
        ("/caf%C3%A9*.jpg$", "/caf%c3%a9/x.jpgx", False),
    ]
    for pat, txt, want in cases:
        assert rule_matches(pat, txt) is want, ("engine", pat, txt)
        assert wildcard_rule_matches(pat, txt) is want, ("oracle", pat, txt)


def test_filter_allowed_pct_escapes(spark):
    """Mixed-encoding rules through the real Spark filter: the (?i:%..)
    regex form must be valid for Java's Pattern and match both path
    spellings; plain ASCII rules stay on the startswith path."""
    from web_scraper_spark.sources.robots import build_rules_table, filter_allowed

    pages = spark.createDataFrame(
        [("w.test",
          b"User-agent: *\n"
          b"Disallow: /caf%C3%A9\n"
          b"Disallow: /plain\n"
          b"Allow: /caf%C3%A9/menu\n")],
        "host string, body binary",
    )
    rules = build_rules_table(pages)
    frontier = spark.createDataFrame(
        [
            ("http://w.test/café/x", "w.test"),        # raw path blocked
            ("http://w.test/caf%C3%A9/x", "w.test"),        # escaped blocked
            ("http://w.test/caf%c3%a9/x", "w.test"),        # lowercase hex blocked
            ("http://w.test/caf%C3%A9/menu", "w.test"),     # longer Allow wins
            ("http://w.test/café/menu", "w.test"),     # ... in raw form too
            ("http://w.test/plain/x", "w.test"),            # startswith path
            ("http://w.test/other", "w.test"),
        ],
        "url string, host string",
    )
    kept = {r.url for r in filter_allowed(frontier, rules).collect()}
    assert kept == {
        "http://w.test/caf%C3%A9/menu",
        "http://w.test/café/menu",
        "http://w.test/other",
    }


def test_crawl_query_string_robots_matches_oracle(spark, tmp_path):
    """Query-string wildcard rules (RFC matches path+query): a seed whose
    raw url carries ?sid= is blocked, its query-less twin is fetched —
    identically on both sides."""
    from web_scraper_spark.oracle.simulator import simulate
    from web_scraper_spark.plans.crawl import run_crawl
    from web_scraper_spark.sources.synthetic_web import WebRow

    web = [
        WebRow("http://q.test/p", "q.test", 0, 200, "text/html",
               b"<html><body>x</body></html>"),
        WebRow("http://q.test/robots.txt", "q.test", 0, 200, "text/plain",
               b"User-agent: *\nDisallow: /*?sid=\n"),
    ]
    seeds = ["q.test/p?sid=1", "q.test/p"]
    oracle = simulate(seeds, web, None, use_robots=True)
    assert [u for *_, u in oracle.crawl_order] == ["http://q.test/p"]
    result = run_crawl(
        spark, seeds, _webdf(spark, web), None,
        workdir=str(tmp_path), use_robots=True,
    )
    got = sorted((r["round"], r.depth, r.seed_idx, r.url)
                 for r in result.crawl_log.collect())
    assert got == oracle.crawl_order


def test_agent_group_selection():
    """RFC 9309 §2.2.1: the group naming our product token wins over the
    * group; only when no specific group exists do * rules apply; all
    matching groups combine; matching is case-insensitive."""
    body = (
        "User-agent: SparkFrontierBot\n"
        "Disallow: /bot-only\n"
        "Crawl-delay: 2\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /everyone\n"
        "Crawl-delay: 9\n"
        "\n"
        "User-agent: sparkfrontierbot\n"
        "Disallow: /bot-extra\n"
    )
    assert parse_robots_body(body, "sparkfrontierbot") == (
        ["/bot-only", "/bot-extra"], [], 2.0,
    )
    assert parse_robots_body(body, "SPARKFRONTIERBOT")[0] == [
        "/bot-only", "/bot-extra",
    ]
    assert parse_robots_body(body, "otherbot") == (["/everyone"], [], 9.0)
    assert parse_robots_body(body) == (["/everyone"], [], 9.0)  # legacy default
    # rules before any user-agent line belong to no group (RFC)
    assert parse_robots_body("Disallow: /loose\nUser-agent: *\nDisallow: /x\n") == (
        ["/x"], [], None,
    )


def test_crawl_agent_specific_robots_matches_oracle(spark, tmp_path):
    """E2E: with robots_agent set, the engine honors the bot-specific
    group (different from *), identically to the oracle; with the
    default token the * group applies instead."""
    from web_scraper_spark.oracle.simulator import simulate
    from web_scraper_spark.plans.crawl import run_crawl
    from web_scraper_spark.sources.synthetic_web import WebRow

    page = (b"<html><body>"
            b"<a href='/contact-a'>Contact us</a>"
            b"<a href='/contact-b'>Contact us</a>"
            b"</body></html>")
    sub = b"<html><body><p>ok</p></body></html>"
    robots = (b"User-agent: SparkFrontierBot\n"
              b"Disallow: /contact-a\n"
              b"\n"
              b"User-agent: *\n"
              b"Disallow: /contact-b\n")
    web = [
        WebRow("http://ua.test", "ua.test", 0, 200, "text/html", page),
        WebRow("http://ua.test/contact-a", "ua.test", 1, 200, "text/html", sub),
        WebRow("http://ua.test/contact-b", "ua.test", 1, 200, "text/html", sub),
        WebRow("http://ua.test/robots.txt", "ua.test", 0, 200, "text/plain", robots),
    ]

    for agent, blocked in (("sparkfrontierbot", "contact-a"), ("*", "contact-b")):
        oracle = simulate(["ua.test"], web, None, use_robots=True,
                          robots_agent=agent)
        fetched = [u for *_, u in oracle.crawl_order]
        assert f"http://ua.test/{blocked}" not in fetched
        assert len(fetched) == 2  # seed + the other contact page
        result = run_crawl(
            spark, ["ua.test"], _webdf(spark, web), None,
            workdir=str(tmp_path / ("star" if agent == "*" else agent)),
            use_robots=True, robots_agent=agent,
        )
        got = sorted((r["round"], r.depth, r.seed_idx, r.url)
                     for r in result.crawl_log.collect())
        assert got == oracle.crawl_order, agent


def test_sitemap_records(spark):
    """Sitemap: records (RFC 9309 §2.2.4) are global — collected from
    anywhere in the file, independent of user-agent groups — and exposed
    both on the rules table and via discovered_sitemaps."""
    from web_scraper_spark.sources.robots import (
        build_rules_table, discovered_sitemaps, parse_sitemaps,
    )

    body = (
        "Sitemap: https://s.test/sitemap.xml\n"
        "User-agent: OtherBot\n"
        "Disallow: /x\n"
        "sitemap: https://s.test/sitemap-2.xml\n"  # any casing, in a group
        "User-agent: *\n"
        "Disallow: /y\n"
    )
    assert parse_sitemaps(body) == [
        "https://s.test/sitemap.xml", "https://s.test/sitemap-2.xml",
    ]
    pages = spark.createDataFrame(
        [("s.test", body.encode())], "host string, body binary"
    )
    rules = build_rules_table(pages)
    row = rules.collect()[0]
    assert row.sitemaps == [
        "https://s.test/sitemap.xml", "https://s.test/sitemap-2.xml",
    ]
    assert row.disallow == ["/y"]  # group selection unaffected
    got = {(r.host, r.sitemap_url) for r in discovered_sitemaps(rules).collect()}
    assert got == {
        ("s.test", "https://s.test/sitemap.xml"),
        ("s.test", "https://s.test/sitemap-2.xml"),
    }
