"""Parity on the REFERENCE's own sample data (VERDICT r1 item 5):
seed prep/dedup over data/sample-websites.csv (997 domains), the names
side-input over data/sample-websites-company-names.csv, and the match
query over data/API-input-sample.csv (reference test_api_script.py:16,
31-42) — the real-world mess (blank-ish names, odd punctuation, dupes)
that synthetic fixtures don't produce.

The oracle here is a pure-Python mirror built from the simulator's
reference-semantics functions; the engine side runs the production paths
(_seed_frontier, run_crawl's names MERGE, match_top1). The reference
reports 32/32 API matches against its live-crawled index; offline
(names-only records, no phones/socials) the deterministic subset is
26/32 — pinned below.
"""

import csv
import os
import re

import pytest

REF = "/root/reference/data"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference sample data not present"
)


def _rows(name):
    with open(os.path.join(REF, name), encoding="utf-8") as f:
        return list(csv.DictReader(f))


@pytest.fixture(scope="module")
def names_rows():
    return [
        (
            r["domain"],
            r["company_commercial_name"],
            r["company_legal_name"],
            r["company_all_available_names"],
        )
        for r in _rows("sample-websites-company-names.csv")
    ]


@pytest.fixture(scope="module")
def records_df(spark, names_rows, tmp_path_factory):
    """company_records built through the PRODUCTION names path (run_crawl
    with an empty frontier runs only the names MERGE)."""
    from web_scraper_spark.plans.crawl import run_crawl

    result = run_crawl(
        spark, [], None, names_rows,
        workdir=str(tmp_path_factory.mktemp("refdata")),
    )
    return result.company_records.cache()


def test_seed_prep_dedup_reference_csv(spark):
    """A1/B1/F1 over the real 997-domain seed file: blank-skip, prepare,
    first-occurrence dedup, acceptance order."""
    from web_scraper_spark.oracle.simulator import prepare_url
    from web_scraper_spark.plans.crawl import _seed_frontier

    raw = [r["domain"] for r in _rows("sample-websites.csv")]
    assert len(raw) == 997

    seen, expected = set(), []
    for s in raw:
        if not s or not s.strip():
            continue
        p = prepare_url(s)
        if p in seen:
            continue
        seen.add(p)
        expected.append(p)
    assert len(expected) == 997  # the file happens to be duplicate-free

    got = [
        r.url for r in _seed_frontier(spark, raw).orderBy("seed_idx").collect()
    ]
    assert got == expected


def _py_records(names_rows):
    from web_scraper_spark.oracle.simulator import (
        best_name, get_domain_from_url, normalize_company_name, prepare_url,
    )

    recs = {}
    for domain_raw, commercial, legal, alln in names_rows:
        dom = get_domain_from_url(domain_raw)
        if not dom:
            continue
        name = best_name(commercial, legal, alln)
        if not name:
            continue
        recs[dom] = {
            "company_name": name,
            "searchable_name": normalize_company_name(name),
            "url": prepare_url(domain_raw),
        }
    return recs


def test_names_derivation_reference_csv(records_df, names_rows):
    """A2/B7/D3 + the last-writer-per-domain merge over the real 997-row
    names file."""
    exp = _py_records(names_rows)
    assert len(exp) == 997
    got = {
        r.domain: {
            "company_name": r.company_name,
            "searchable_name": r.searchable_name,
            "url": r.url,
        }
        for r in records_df.collect()
    }
    assert got == exp


_FOLD = str.maketrans(
    "àáâãäåèéêëìíîïòóôõöùúûüçñ", "aaaaaaeeeeiiiiooooouuuucn"
)


def _py_tokens(name):
    # mirror of functions.names.searchable_name_tokens (Java \w is ASCII)
    folded = re.sub(r"[^a-zA-Z0-9_\s]", " ", (name or "").lower().translate(_FOLD))
    return [t for t in folded.split() if t]


def _py_match(inputs, recs):
    """Pure-Python mirror of operators.match.match_top1 scoring (phone
    10.0 / domain 8.0 / facebook 5.0 / name 2.0*overlap/len). Records
    without phones/profiles (the names-only path) simply never fire the
    first and third clauses."""
    from web_scraper_spark.oracle.simulator import (
        get_domain_from_url, normalize_company_name, normalize_phone_number,
        normalize_social_media_profile,
    )

    out = {}
    for i, row in enumerate(inputs):
        q_name = normalize_company_name(row.get("input name")) or None
        q_phone = normalize_phone_number(row.get("input phone"))
        q_domain = get_domain_from_url(row.get("input website"))
        q_facebook = normalize_social_media_profile(row.get("input_facebook") or "")
        best = None
        for dom, rec in recs.items():
            score = 0.0
            if q_phone and q_phone in rec.get("normalized_phone_numbers", ()):
                score += 10.0
            if q_domain and dom == q_domain:
                score += 8.0
            if q_facebook and q_facebook in rec.get("social_media_profiles", ()):
                score += 5.0
            if q_name:
                q_toks = q_name.split(" ")
                overlap = len(set(_py_tokens(rec["searchable_name"])) & set(q_toks))
                if overlap:
                    score += 2.0 * overlap / len(q_toks)
            if score > 0 and (best is None or (-score, dom) < (-best[1], best[0])):
                best = (dom, score)
        if best:
            out[i] = best
    return out


def test_match_top1_reference_inputs(spark, records_df, names_rows):
    """E5 over the reference's 32 golden API inputs: top-1 IDENTITY must
    be deterministic and equal between the Spark query and the
    pure-Python mirror; the offline-checkable match count is pinned."""
    from web_scraper_spark.operators.match import match_top1

    inputs = _rows("API-input-sample.csv")
    assert len(inputs) == 32

    inputs_df = spark.createDataFrame(
        [
            (
                i,
                r.get("input name"),
                r.get("input phone"),
                r.get("input website"),
                r.get("input_facebook"),
            )
            for i, r in enumerate(inputs)
        ],
        "input_id long, input_name string, input_phone string, "
        "input_website string, input_facebook string",
    )
    got = {
        r.input_id: (r.domain, r.score)
        for r in match_top1(inputs_df, records_df).collect()
    }
    exp = _py_match(inputs, _py_records(names_rows))

    assert set(got) == set(exp)
    for i in exp:
        assert got[i][0] == exp[i][0], f"input {i}: {got[i]} vs {exp[i]}"
        assert got[i][1] == pytest.approx(exp[i][1], abs=1e-12), i
    # the offline-checkable subset of the reference's 32/32 (the other 6
    # need crawl-derived phones/social profiles — test below)
    assert len(got) == 26


# ---------------------------------------------------------------------------
# full 32/32 (VERDICT r2 item 5): the reference reaches 32/32 because its
# live crawl fills phones/social profiles the names CSV cannot provide.
# Hermetic stand-in: seed a synthetic web with those six identities' phone
# numbers / facebook links on pages of plausible host domains from the
# names CSV (the attribution of the two facebook-only identities to a
# specific domain is a fixture choice — the reference's real crawl decides
# it by whatever site links the profile; batesdds.com / garrettwietholter
# .com carry the phones their names obviously own). ncca-inc.com gets only
# the facebook link, NOT the shared phone 207.762.9321, so input 2
# ("Aroostook", same phone) keeps its name-matched identity from the
# offline test.
_CRAWL_SEEDED = {
    "batesdds.com": ("(509) 276-6996", None),
    "garrettwietholter.com": ("(317) 873-3230", None),
    "postmodern-strings.com": (None, "https://www.facebook.com/GSSstrings/"),
    "ncca-inc.com": (None, "https://www.facebook.com/musselrockcloggers/"),
    "bluemercury.com": (None, "https://facebook.com/bluemercury"),
}


def _seeded_page(phone, facebook) -> bytes:
    bits = ["<html><body><h1>Welcome</h1>"]
    if phone:
        bits.append(f'<a href="tel:{phone}">Call {phone}</a>')
    if facebook:
        bits.append(f'<a href="{facebook}">Find us on Facebook</a>')
    bits.append("</body></html>")
    return "".join(bits).encode("utf-8")


@pytest.fixture(scope="module")
def full_records_df(spark, names_rows, tmp_path_factory):
    """company_records built through the PRODUCTION crawl (extract ->
    merge) over the seeded synthetic web, then the names MERGE — the full
    reference pipeline shape."""
    from web_scraper_spark.plans.crawl import run_crawl
    from web_scraper_spark.sources.synthetic_web import WebRow

    web = [
        WebRow(f"http://{dom}", dom, 0, 200, "text/html", _seeded_page(*pf))
        for dom, pf in _CRAWL_SEEDED.items()
    ]
    from pyspark.sql.types import (
        BinaryType, IntegerType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("url", StringType()),
        StructField("host", StringType()),
        StructField("depth", IntegerType()),
        StructField("status", IntegerType()),
        StructField("content_type", StringType()),
        StructField("body", BinaryType()),
    ])
    webdf = spark.createDataFrame(
        [(r.url, r.host, r.depth, r.status, r.content_type, r.body) for r in web],
        schema,
    )
    result = run_crawl(
        spark, list(_CRAWL_SEEDED), webdf, names_rows,
        workdir=str(tmp_path_factory.mktemp("refdata_full")),
    )
    return result.company_records.cache()


def test_match_top1_reference_inputs_full_32(spark, full_records_df, names_rows):
    """E5 end-to-end: with crawl-derived phones/profiles all 32 reference
    API inputs match (reference test_api_script.py:19-84 expects 32/32,
    README.md:208-215), identities and scores equal between the Spark
    query and the pure-Python mirror."""
    from web_scraper_spark.oracle.simulator import (
        normalize_phone_number, normalize_social_media_profile,
    )
    from web_scraper_spark.operators.match import match_top1

    inputs = _rows("API-input-sample.csv")
    inputs_df = spark.createDataFrame(
        [
            (i, r.get("input name"), r.get("input phone"),
             r.get("input website"), r.get("input_facebook"))
            for i, r in enumerate(inputs)
        ],
        "input_id long, input_name string, input_phone string, "
        "input_website string, input_facebook string",
    )
    got = {
        r.input_id: (r.domain, r.score)
        for r in match_top1(inputs_df, full_records_df).collect()
    }

    recs = _py_records(names_rows)
    for dom, (phone, fb) in _CRAWL_SEEDED.items():
        recs[dom]["normalized_phone_numbers"] = (
            [normalize_phone_number(phone)] if phone else []
        )
        recs[dom]["social_media_profiles"] = (
            [normalize_social_media_profile(fb)] if fb else []
        )
    exp = _py_match(inputs, recs)

    assert set(got) == set(exp)
    for i in exp:
        assert got[i][0] == exp[i][0], f"input {i}: {got[i]} vs {exp[i]}"
        assert got[i][1] == pytest.approx(exp[i][1], abs=1e-12), i
    assert len(got) == 32  # the reference's 32/32
    # the six crawl-only identities resolve exactly as seeded
    for i, dom in [(4, "batesdds.com"), (7, "garrettwietholter.com"),
                   (8, "postmodern-strings.com"), (12, "ncca-inc.com"),
                   (21, "bluemercury.com"), (30, "bluemercury.com")]:
        assert got[i][0] == dom, (i, got[i])
