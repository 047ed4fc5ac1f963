"""The committed C1-C5 extraction fixtures must match a fresh in-memory
regeneration — no silent fixture drift. (The fixtures back the driver's
contract entries in plans/contract_extract.py; the Spark-vs-golden compare
itself runs in tests/test_entry_contract.py via the queries() registry.)"""

import duckdb

from web_scraper_spark.plans.contract_extract import (
    GOLDEN_PATH,
    PAGES_PATH,
    build_fixture_rows,
)


def _read(path):
    rows = duckdb.sql(f"SELECT * FROM read_parquet('{path}')").fetchall()
    cols = [d[0] for d in duckdb.sql(f"SELECT * FROM read_parquet('{path}') LIMIT 0").description]
    return [dict(zip(cols, r)) for r in rows]


def test_fixtures_match_regeneration():
    pages, golden = build_fixture_rows()
    assert _read(PAGES_PATH) == pages
    assert _read(GOLDEN_PATH) == golden


def test_fixture_coverage():
    """The fixture must actually exercise every extractor output AND the
    C4 depth gate (contact pages present with empty contacts)."""
    _, golden = build_fixture_rows()
    assert len(golden) > 100
    for col in ("phones", "socials", "addresses", "contacts", "images"):
        assert any(g[col] for g in golden), f"no coverage for {col}"
    # depth gate: contact pages (urls containing /contact) have no contacts
    contact_pages = [g for g in golden if "/contact" in g["url"]]
    assert contact_pages and all(g["contacts"] == "" for g in contact_pages)
