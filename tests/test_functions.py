"""Catalyst expression functions vs the oracle's plain-Python mirrors
(SURVEY.md §2 B/D). One Spark job per module, batched asserts."""

from pyspark.sql import functions as F

from web_scraper_spark.functions import (
    best_name,
    canonicalize_url,
    clean_phone_number,
    domain_from_url,
    normalize_company_name,
    normalize_phone_e164,
    normalize_social_profile,
    prepare_url,
)
from web_scraper_spark.oracle import simulator as oracle


def test_prepare_and_domain_match_oracle(spark):
    inputs = [
        "acme.test", " acme.test ", "https://Foo.test/a/b", "www.google.com",
        "http://www.Example.COM/x", "ftp://weird.test/x", "google.com",
        "sub.www.test", "WWW.caps.test",
    ]
    rows = (
        spark.createDataFrame([(u,) for u in inputs], "u string")
        .select(
            "u",
            prepare_url(F.col("u")).alias("prep"),
            domain_from_url(prepare_url(F.col("u"))).alias("dom"),
        )
        .collect()
    )
    for r in rows:
        assert r.prep == oracle.prepare_url(r.u), r.u
        assert r.dom == oracle.get_domain_from_url(oracle.prepare_url(r.u)), r.u


def test_canonicalize_matches_oracle(spark):
    inputs = [
        "http://a.test", "http://a.test/", "https://A.test/p/q/",
        "http://a.test/p?x=1#f", "ftp://a.test/p",
    ]
    rows = (
        spark.createDataFrame([(u,) for u in inputs], "u string")
        .select("u", canonicalize_url(F.col("u")).alias("c"))
        .collect()
    )
    for r in rows:
        assert r.c == oracle.canonicalize(r.u), r.u


def test_company_name_normalization_matches_oracle(spark):
    inputs = [
        "Acme, Inc.", "Beta LLC", "Gamma Ltd.", "Delta P.C", "Plain Name",
        "The Company Store Company", "Épsilon Corporation", "",
    ]
    rows = (
        spark.createDataFrame([(n,) for n in inputs], "n string")
        .select("n", normalize_company_name(F.col("n")).alias("norm"))
        .collect()
    )
    for r in rows:
        assert r.norm == oracle.normalize_company_name(r.n), r.n


def test_best_name_precedence(spark):
    rows = (
        spark.createDataFrame(
            [
                ("Legal Inc", "Comm", "A|B"),
                ("", "Comm", "A|B"),
                ("", "", "A|B"),
                ("", "  ", ""),
            ],
            "legal string, comm string, alln string",
        )
        .select(best_name(F.col("legal"), F.col("comm"), F.col("alln")).alias("b"))
        .collect()
    )
    assert [r.b for r in rows] == ["Legal Inc", "Comm", "A", None]


def test_phone_e164_matches_oracle(spark):
    inputs = [
        "+1 (212) 555-0173", "212.555.0173", "1-212-555-0173", "555-0173",
        "%2B12125550173", "+442079460958", "112-555-0173", "(646) 555 0199",
    ]
    rows = (
        spark.createDataFrame([(p,) for p in inputs], "p string")
        .select(
            "p",
            clean_phone_number(F.col("p")).alias("clean"),
            normalize_phone_e164(F.col("p")).alias("e"),
        )
        .collect()
    )
    for r in rows:
        assert r.e == oracle.normalize_phone_number(r.p), r.p

    import re
    from urllib.parse import unquote

    for r in rows:
        assert r.clean == re.sub(r"[\s().-]", "", unquote(r.p)), r.p


def test_social_profile_matches_oracle(spark):
    inputs = [
        "https://www.facebook.com/acme", "https://x.com/acme_co",
        "https://www.linkedin.com/company/acme-inc/",
        "https://www.linkedin.com/in/jane-doe/",
        "https://instagram.com/acme.photos/", "https://youtube.com/c/AcmeTV/",
        "https://youtube.com/SomeUser", "https://example.com/none",
        "https://facebook.com/sharer/share",
    ]
    rows = (
        spark.createDataFrame([(u,) for u in inputs], "u string")
        .select("u", normalize_social_profile(F.col("u")).alias("prof"))
        .collect()
    )
    for r in rows:
        assert r.prof == oracle.normalize_social_media_profile(r.u), r.u
