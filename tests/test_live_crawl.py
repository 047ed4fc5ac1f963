"""Full LIVE crawl parity: the real fetcher (mapInPandas + thread pool +
urllib) crawls the synthetic web served by a loopback HTTP forward proxy
— absolute-URI proxying means the fixture's ``.test`` hostnames need no
DNS — and the result must match the oracle exactly, like the hermetic
path does. This is the north-rule live pipeline end to end."""

import http.server
import threading

import pytest

from web_scraper_spark.oracle.simulator import canonicalize, simulate
from web_scraper_spark.sources.synthetic_web import build_web, web_host_df

# 20 domains: large enough that robots-bearing hosts (every 4th) carry
# contact links the disallow rules actually block (4 URLs at N=20)
N = 20


@pytest.fixture(scope="module")
def fixture():
    seeds, web = build_web(N)
    return seeds, web, {canonicalize(r.url): r for r in web}


@pytest.fixture(scope="module")
def proxy(fixture):
    _seeds, _web, by_canon = fixture

    class ProxyHandler(http.server.BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def do_GET(self):
            # a forward proxy receives the absolute URI in the request line
            row = by_canon.get(canonicalize(self.path))
            if row is None or row.status == 404:
                self.send_error(404)
                return
            if row.status == 0:
                # timeout sentinel: drop the connection without replying
                self.close_connection = True
                self.connection.close()
                return
            self.send_response(200)
            self.send_header("Content-Type", row.content_type)
            self.send_header("Content-Length", str(len(row.body)))
            self.end_headers()
            self.wfile.write(row.body)

        def log_message(self, *args):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), ProxyHandler)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_live_crawl_matches_oracle(spark, fixture, proxy, tmp_path):
    from web_scraper_spark.plans.crawl import run_crawl

    seeds, web, _ = fixture
    oracle = simulate(seeds, web, None)

    result = run_crawl(
        spark, seeds, None, None,
        workdir=str(tmp_path),
        live=True, live_proxy=proxy, live_timeout_s=5.0,
    )
    got = sorted(
        (r["round"], r.depth, r.seed_idx, r.url) for r in result.crawl_log.collect()
    )
    assert got == oracle.crawl_order
    assert {r.url for r in result.url_seen.collect()} == oracle.url_seen
    got_imgs = sorted(
        (r.image_id, r.w, r.h, r.fmt, r.caption, r.phash)
        for r in result.images.collect()
    )
    exp_imgs = sorted(
        (i["image_id"], i["w"], i["h"], i["fmt"], i["caption"], i["phash"])
        for i in oracle.images
    )
    assert got_imgs == exp_imgs
    # merged documents too — the full pipeline over real HTTP
    got_docs = {
        r.domain: (list(r.phone_numbers), list(r.social_media_links))
        for r in result.company_records.collect()
    }
    for domain, doc in oracle.documents.items():
        if doc["url"] is None:
            continue
        assert got_docs[domain] == (doc["phone_numbers"], doc["social_media_links"]), domain


def test_live_crawl_with_robots_matches_oracle(spark, fixture, proxy, tmp_path):
    """The LIVE robots pre-pass: per-new-host /robots.txt fetched through
    the same proxy, cached in the rules table, enforced like the hermetic
    path — crawl order must match the oracle with use_robots=True (blocked
    URLs never fetched, still in url_seen)."""
    import os

    from web_scraper_spark.plans.crawl import run_crawl
    from web_scraper_spark.sources.tables import SnapshotTable

    seeds, web, _ = fixture
    oracle = simulate(seeds, web, None, use_robots=True)
    oracle_plain = simulate(seeds, web, None, use_robots=False)
    # the fixture must actually block something, or this test is vacuous
    assert len(oracle.crawl_order) < len(oracle_plain.crawl_order)

    result = run_crawl(
        spark, seeds, None, None,
        workdir=str(tmp_path),
        live=True, live_proxy=proxy, live_timeout_s=5.0,
        use_robots=True,
    )
    got = sorted(
        (r["round"], r.depth, r.seed_idx, r.url) for r in result.crawl_log.collect()
    )
    assert got == oracle.crawl_order
    assert {r.url for r in result.url_seen.collect()} == oracle.url_seen

    # the rules cache holds one row per host (incl. empty-rule rows for
    # hosts without a robots.txt) — the pre-pass never re-fetches
    rules = SnapshotTable(spark, os.path.join(str(tmp_path), "robots_rules")).read()
    hosts_with_rules = {r["host"] for r in rules.collect() if r["disallow"]}
    assert hosts_with_rules == {f"acme-{i:04d}.test" for i in range(N) if i % 4 == 3}

    # as-of enrichment (crawl-side asof_join consumer): every attempt is
    # attributed to the LATEST robots snapshot with fetched_at <= its ts,
    # cross-checked row by row against a python scan of the history
    from web_scraper_spark.plans.report import attempts_robots_asof

    log_full = SnapshotTable(spark, os.path.join(str(tmp_path), "crawl_log")).read()
    enriched = attempts_robots_asof(log_full, rules).collect()
    hist = [(r["host"], r["fetched_at"]) for r in rules.collect()]
    assert enriched
    for r in enriched:
        prior = [at for (h, at) in hist if h == r.host and at <= r.ts]
        assert r.robots_fetched_at == (max(prior) if prior else None), r
        if prior:  # this fixture pre-passes every host before fetching it
            assert r.robots_transient is False
    # an attempt that PREDATES every snapshot gets nulls
    from pyspark.sql import functions as F

    pre = attempts_robots_asof(
        log_full.withColumn("ts", F.lit(0.0)), rules
    ).collect()
    assert all(r.robots_fetched_at is None for r in pre)


def test_live_robots_unreachable_is_transient_disallow_all(spark, tmp_path):
    """RFC 9309 2.3.1 (review r2): a timed-out robots.txt means assume
    complete disallow, cached as TRANSIENT (retried on the next pre-pass)
    — not an empty-rules row cached forever. A later crawl whose robots
    fetch succeeds must crawl the host normally."""
    import http.server
    import os
    import threading

    from web_scraper_spark.plans.crawl import run_crawl
    from web_scraper_spark.sources.synthetic_web import WebRow
    from web_scraper_spark.sources.tables import SnapshotTable

    body = b"<html><body><a href='tel:+1 (212) 555-0000'>c</a></body></html>"
    web = [
        WebRow("http://flaky.test", "flaky.test", 0, 200, "text/html", body),
        WebRow("http://steady.test", "steady.test", 0, 200, "text/html", body),
    ]
    by_canon = {canonicalize(r.url): r for r in web}
    drop_next = {"flaky": True}

    class Handler(http.server.BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def do_GET(self):
            if self.path == "http://flaky.test/robots.txt" and drop_next["flaky"]:
                drop_next["flaky"] = False  # fail exactly once
                self.close_connection = True
                self.connection.close()
                return
            if self.path.endswith("/robots.txt"):
                self.send_error(404)
                return
            row = by_canon.get(canonicalize(self.path))
            if row is None:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Type", row.content_type)
            self.send_header("Content-Length", str(len(row.body)))
            self.end_headers()
            self.wfile.write(row.body)

        def log_message(self, *args):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    proxy_url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        seeds = ["flaky.test", "steady.test"]
        wd = str(tmp_path / "one")
        r1 = run_crawl(spark, seeds, None, None, workdir=wd, live=True,
                       live_proxy=proxy_url, live_timeout_s=5.0, use_robots=True)
        fetched1 = {r.url for r in r1.crawl_log.collect()}
        assert fetched1 == {"http://steady.test"}  # flaky assumed disallow-all
        rules = SnapshotTable(spark, os.path.join(wd, "robots_rules")).read()
        flaky_row = [r for r in rules.collect() if r["host"] == "flaky.test"]
        assert flaky_row and flaky_row[0]["transient"] is True
        assert list(flaky_row[0]["disallow"]) == ["/"]

        # a fresh crawl (robots cache reset) retries and succeeds
        r2 = run_crawl(spark, seeds, None, None, workdir=str(tmp_path / "two"),
                       live=True, live_proxy=proxy_url, live_timeout_s=5.0,
                       use_robots=True)
        fetched2 = {r.url for r in r2.crawl_log.collect()}
        assert fetched2 == {"http://flaky.test", "http://steady.test"}
    finally:
        srv.shutdown()
