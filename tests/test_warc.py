"""WARC source/sink: roundtrip over real fetch results, foreign-record
parsing, and the malformed-row contract."""

import gzip

import pyspark.sql.functions as F
import pytest

from web_scraper_spark.sources.warc import (
    _parse_warc_bytes, read_warc, write_warc,
)


@pytest.fixture(scope="module")
def fetched(spark):
    from web_scraper_spark.sources.fetch import fetch_join
    from web_scraper_spark.sources.synthetic_web import web_host_df

    web = web_host_df(spark, 20)
    frontier = web.select("url").limit(200)
    return fetch_join(frontier, web).select(
        "url", "status", "content_type", F.col("body")
    )


def test_roundtrip_fetch_results(spark, fetched, tmp_path):
    path = str(tmp_path / "warc")
    manifest = write_warc(fetched, path).collect()
    n_written = sum(r.n_records for r in manifest)
    assert n_written == fetched.count()
    assert all(r.n_bytes > 0 for r in manifest if r.file)

    back = read_warc(spark, path)
    want = {
        (r.url, int(r.status or 0), r.content_type, bytes(r.body or b""))
        for r in fetched.collect()
    }
    got = {
        (r.url, r.status, r.content_type, bytes(r.body or b""))
        for r in back.collect()
    }
    assert got == want


def test_deterministic_record_ids(spark, fetched, tmp_path):
    p1, p2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    write_warc(fetched, p1).collect()
    write_warc(fetched, p2).collect()
    ids1 = {r.url: r.record_id for r in read_warc(spark, p1).collect()}
    ids2 = {r.url: r.record_id for r in read_warc(spark, p2).collect()}
    assert ids1 == ids2
    assert all(v.startswith("<urn:uuid:") for v in ids1.values())


def test_null_url_skipped_null_body_empty(spark, tmp_path):
    df = spark.createDataFrame(
        [
            ("http://a.test/", 200, "text/html", b"<html>a</html>"),
            (None, 200, "text/html", b"dropped"),
            ("http://b.test/timeout", 0, None, None),
        ],
        "url string, status int, content_type string, body binary",
    )
    path = str(tmp_path / "warc")
    manifest = write_warc(df, path).collect()
    assert sum(r.n_records for r in manifest) == 2
    rows = {r.url: r for r in read_warc(spark, path).collect()}
    assert set(rows) == {"http://a.test/", "http://b.test/timeout"}
    assert bytes(rows["http://a.test/"].body) == b"<html>a</html>"
    assert rows["http://b.test/timeout"].status == 0
    assert bytes(rows["http://b.test/timeout"].body) == b""


def test_parses_foreign_records():
    """Reader handles records this writer never produces: an uncompressed
    stream, a request record to skip, LF-free payload boundaries."""
    req = (
        b"WARC/1.0\r\n"
        b"WARC-Type: request\r\n"
        b"WARC-Record-ID: <urn:uuid:req-1>\r\n"
        b"Content-Length: 4\r\n\r\nGET /\r\n\r\n"
    )
    body = b"\x89binary\x00payload"
    http = b"HTTP/1.1 404 Not Found\r\nContent-Type: image/png\r\n\r\n" + body
    resp = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://x.test/img\r\n"
        b"WARC-Date: 2026-02-03T04:05:06Z\r\n"
        b"WARC-Record-ID: <urn:uuid:resp-1>\r\n"
        + f"Content-Length: {len(http)}\r\n\r\n".encode()
        + http
        + b"\r\n\r\n"
    )
    for raw in (req + resp, gzip.compress(req) + gzip.compress(resp)):
        recs = _parse_warc_bytes(raw)
        assert len(recs) == 1
        r = recs[0]
        assert r["url"] == "http://x.test/img"
        assert r["status"] == 404
        assert r["content_type"] == "image/png"
        assert r["body"] == body
        assert r["warc_date"] == "2026-02-03T04:05:06Z"


def test_crawl_export_warc(spark, tmp_path):
    """run_crawl(export_warc=True) archives every fetch attempt: WARC
    record multiset == crawl-log attempts per round, 200-rows carry the
    fixture's exact body bytes, timeout rows are archived with status 0."""
    from web_scraper_spark.plans.crawl import run_crawl
    from web_scraper_spark.sources.synthetic_web import build_web, web_host_df

    seeds, web_rows = build_web(12)
    webdf = web_host_df(spark, 12)
    res = run_crawl(
        spark, seeds, webdf, None,
        workdir=str(tmp_path / "crawl"), export_warc=True,
    )
    archived = read_warc(spark, str(tmp_path / "crawl" / "warc" / "round=*"))

    import collections
    from web_scraper_spark.functions.urls import canonicalize_url

    got = collections.Counter(
        r.url for r in
        archived.select(canonicalize_url(F.col("url")).alias("url")).collect()
    )
    want = collections.Counter(r.url for r in res.crawl_log.select("url").collect())
    # every logged attempt (incl. duplicate contact fetches, SURVEY F5)
    # has exactly one archived record
    assert got == want

    bodies = {r["url"]: r["body"] for r in web_rows_as_dicts(web_rows)}
    ok_rows = [r for r in archived.collect() if r.status == 200]
    assert ok_rows
    checked = 0
    for r in ok_rows:
        if r.url in bodies:
            assert bytes(r.body) == bodies[r.url]
            checked += 1
    assert checked >= len(ok_rows) // 2


def web_rows_as_dicts(web_rows):
    for w in web_rows:
        d = w._asdict() if hasattr(w, "_asdict") else dict(w.__dict__)
        yield d


def test_reprocess_extracts_from_archive(spark, tmp_path):
    """extract_from_warc over an archived crawl reproduces crawl-time
    extraction for the base-independent fields (phones/socials/addresses)
    — archive bytes in, same Arrow UDF out, no re-fetch."""
    from web_scraper_spark.operators.extract import extract_all
    from web_scraper_spark.plans.crawl import run_crawl
    from web_scraper_spark.plans.reprocess import extract_from_warc
    from web_scraper_spark.sources.synthetic_web import build_web, web_host_df

    seeds, web_rows = build_web(10)
    webdf = web_host_df(spark, 10)
    run_crawl(
        spark, seeds, webdf, None,
        workdir=str(tmp_path / "crawl"), export_warc=True,
    )
    from web_scraper_spark.functions.urls import canonicalize_url

    rep = extract_from_warc(
        spark, str(tmp_path / "crawl" / "warc" / "round=*")
    ).withColumn("url", canonicalize_url(F.col("url")))
    # the F5 seed alias (trailing slash) archives under its frontier
    # spelling; canonical keying folds it onto the same page
    got = {
        r.url: (tuple(r.phone_numbers), tuple(r.social_media_links), tuple(r.addresses))
        for r in rep.collect()
    }
    assert got, "archive produced no HTML pages"

    # expectation from the fixture bytes through the same UDF, keyed by
    # the page's own url (the base-independent fields don't care)
    html = webdf.where(
        (F.col("status") == 200) & F.col("content_type").contains("text/html")
    )
    want_df = html.select(
        canonicalize_url(F.col("url")).alias("url"),
        extract_all(F.col("url"), F.col("body").cast("string"), F.lit("")).alias("ex"),
    ).select("url", "ex.*")
    want = {
        r.url: (tuple(r.phone_numbers), tuple(r.social_media_links), tuple(r.addresses))
        for r in want_df.collect()
        if r.url in got
    }
    assert got == want


def test_warc_codec_fuzz():
    """Property fuzz: compose records through the writer's primitives and
    parse them back — adversarial bodies (embedded 'WARC/1.0', CRLFCRLF,
    gzip magic, NULs) must survive because framing is Content-Length-
    driven, never delimiter-scanning."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from web_scraper_spark.sources.warc import (
        _record_id, _response_payload, _warc_record,
    )

    adversarial = st.sampled_from(
        [b"WARC/1.0\r\n", b"\r\n\r\n", b"\x1f\x8b", b"\x00", b"Content-Length: 7\r\n"]
    )
    body_strategy = st.lists(
        st.one_of(st.binary(max_size=40), adversarial), max_size=8
    ).map(b"".join)

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=999),
                st.text(
                    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
                    min_size=1, max_size=30,
                ),
                body_strategy,
            ),
            min_size=1, max_size=6,
        )
    )
    def roundtrip(rows):
        blob = b"".join(
            _warc_record(
                [
                    ("WARC-Type", "response"),
                    ("WARC-Record-ID", _record_id(f"http://f.test/{i}")),
                    ("WARC-Date", "2026-01-01T00:00:00Z"),
                    ("WARC-Target-URI", f"http://f.test/{i}"),
                    ("Content-Type", "application/http;msgtype=response"),
                ],
                _response_payload(status, ctype, body),
            )
            for i, (status, ctype, body) in enumerate(rows)
        )
        recs = _parse_warc_bytes(blob)
        assert len(recs) == len(rows)
        for i, ((status, ctype, body), rec) in enumerate(zip(rows, recs)):
            assert rec["url"] == f"http://f.test/{i}"
            assert rec["status"] == status
            assert rec["body"] == body

    roundtrip()
