"""Top-1 match parity (SURVEY.md E5): 32-style golden inputs over the
crawled company_records — expected domains derived from the fixture
construction, mirroring the reference's API test harness
(test_api_script.py:19-88)."""

import pytest


@pytest.fixture(scope="module")
def records(spark, tmp_path_factory):
    from web_scraper_spark.plans.crawl import run_crawl
    from web_scraper_spark.sources.synthetic_web import (
        build_web, company_names_rows, web_host_df,
    )

    seeds, web = build_web(15)
    names = company_names_rows(15)
    webdf = web_host_df(spark, 15)
    wd = tmp_path_factory.mktemp("match_run")
    res = run_crawl(spark, seeds, webdf, names, workdir=str(wd))
    return res.company_records.cache()


def _match(spark, records, rows):
    from web_scraper_spark.operators.match import match_top1

    inputs = spark.createDataFrame(
        rows,
        "input_id long, input_name string, input_phone string, "
        "input_website string, input_facebook string",
    )
    return {r.input_id: r for r in match_top1(inputs, records).collect()}


def test_match_by_domain_website(spark, records):
    got = _match(spark, records, [(1, None, None, "acme-0003.test", None)])
    assert got[1].domain == "acme-0003.test"
    assert got[1].score == 8.0


def test_match_by_name(spark, records):
    got = _match(spark, records, [(1, "Acme 0005, Inc.", None, None, None)])
    assert got[1].domain == "acme-0005.test"


def test_match_by_phone_beats_name(spark, records):
    # phone points at one domain, name at another -> phone boost (10) wins
    phones = {
        r.domain: r.phone_numbers
        for r in records.collect()
        if r.normalized_phone_numbers
    }
    victim = sorted(d for d in phones if d != "acme-0005.test")[0]
    nphone = [
        r.normalized_phone_numbers[0]
        for r in records.collect()
        if r.domain == victim
    ][0]
    got = _match(
        spark, records, [(1, "Acme 0005", nphone, None, None)]
    )
    assert got[1].domain == victim


def test_no_match_is_absent(spark, records):
    got = _match(spark, records, [(1, None, None, "unknown-xyz.test", None)])
    assert 1 not in got  # the API's 404


def test_match_by_facebook_profile(spark, records):
    fb = None
    for r in records.collect():
        for p in r.social_media_profiles:
            if p.startswith("facebook:"):
                fb, dom = p, r.domain
                break
        if fb:
            break
    assert fb is not None
    got = _match(spark, records, [(1, None, None, None, f"https://www.{fb.replace(':', '.com/')}")])
    assert got[1].domain == dom
