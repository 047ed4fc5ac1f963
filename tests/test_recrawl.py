"""Re-crawl scheduling (plans/recrawl.py): staleness selection, targeted
re-crawl idempotence, changed-page record refresh, log continuity."""

import pyspark.sql.functions as F
import pytest

from web_scraper_spark.plans.recrawl import recrawl, select_stale_seeds


def _records_by_domain(df):
    out = {}
    for r in df.collect():
        d = r.asDict()
        out[d["domain"]] = {
            k: tuple(v) if isinstance(v, list) else v
            for k, v in sorted(d.items())
            if k != "domain"
        }
    return out


@pytest.fixture()
def crawled(spark, tmp_path):
    from web_scraper_spark.plans.crawl import run_crawl
    from web_scraper_spark.sources.synthetic_web import build_web, web_host_df

    seeds, _ = build_web(8)
    webdf = web_host_df(spark, 8)
    wd = str(tmp_path / "crawl")
    res = run_crawl(spark, seeds, webdf, None, workdir=wd)
    return seeds, webdf, wd, res


def test_select_stale_seeds_pure_query(spark):
    log = spark.createDataFrame(
        [
            (0, 0, 100.0), (1, 0, 100.0),  # seed 0: newest 200
            (0, 0, 200.0),
            (0, 1, 50.0),                   # seed 1: stale
            (0, 2, 199.0),                  # seed 2: just inside
        ],
        "round int, seed_idx long, ts double",
    )
    stale = select_stale_seeds(log, now_ts=300.0, max_age_s=150.0).collect()
    assert [(r.seed_idx, r.last_ts) for r in stale] == [(1, 50.0)]


def test_recrawl_nothing_stale(spark, crawled):
    seeds, webdf, wd, _ = crawled
    sub, stale = recrawl(spark, seeds, webdf, wd, max_age_s=1e9)
    assert sub is None and stale == []


def test_recrawl_unchanged_domain_is_record_noop(spark, crawled):
    from web_scraper_spark.sources.tables import SnapshotTable

    seeds, webdf, wd, res = crawled
    before = _records_by_domain(res.company_records)
    log_before = SnapshotTable(spark, f"{wd}/crawl_log").read()
    n_before = log_before.count()
    max_round_before = log_before.agg(F.max("round")).collect()[0][0]
    seed3_urls = {
        r.url for r in log_before.where(F.col("seed_idx") == 3).collect()
    }

    sub, stale = recrawl(spark, seeds, webdf, wd, seed_indices=[3])
    assert stale == [3]

    after_t = SnapshotTable(spark, f"{wd}/company_records").read()
    assert _records_by_domain(after_t) == before  # h5 idempotent upsert

    log_after = SnapshotTable(spark, f"{wd}/crawl_log").read()
    new = log_after.where(F.col("round") > max_round_before)
    assert log_after.count() == n_before + new.count() and new.count() > 0
    # every appended attempt belongs to parent seed 3 and re-fetches
    # exactly its original url set
    assert {r.seed_idx for r in new.collect()} == {3}
    assert {r.url for r in new.collect()} == seed3_urls
    # freshness advanced: seed 3 no longer stale at the original cutoff
    now = log_after.agg(F.max("ts")).collect()[0][0] + 1.0
    still = {r.seed_idx for r in select_stale_seeds(log_after, now, 1e9).collect()}
    assert 3 not in still


def test_recrawl_changed_page_refreshes_records(spark, crawled):
    from web_scraper_spark.sources.tables import SnapshotTable

    seeds, webdf, wd, res = crawled
    before = _records_by_domain(res.company_records)

    # target a domain that HAS a record (the fixture's 404/timeout
    # domains never produce one); derive its parent seed_idx from the log
    dom_target = "acme-0001.test"
    assert dom_target in before
    log = SnapshotTable(spark, f"{wd}/crawl_log").read()
    seed_idx = int(
        log.where((F.col("host") == dom_target) & (F.col("depth") == 0))
        .select("seed_idx").first().seed_idx
    )

    # the site updated: a NEW phone appears on the target's homepage
    target = f"http://{dom_target}"
    changed = webdf.withColumn(
        "body",
        F.when(
            F.col("url") == target,
            F.concat(
                F.col("body").cast("string"),
                F.lit("<p>Phone: 212-555-9999</p>"),
            ).cast("binary"),
        ).otherwise(F.col("body")),
    )
    sub, stale = recrawl(spark, seeds, changed, wd, seed_indices=[seed_idx])
    assert stale == [seed_idx]

    after = _records_by_domain(SnapshotTable(spark, f"{wd}/company_records").read())
    assert set(after) == set(before)
    for dom in after:
        if dom == dom_target:
            continue
        assert after[dom] == before[dom], dom
    old_phones = before[dom_target]["phone_numbers"]
    new_phones = after[dom_target]["phone_numbers"]
    # first-seen union: old order preserved, the new value appended in
    # its cleaned form (clean_phone_number strips separators, B8)
    assert new_phones[: len(old_phones)] == old_phones
    assert "2125559999" in new_phones[len(old_phones):]


def test_crawl_job_recrawl_mode(spark, tmp_path, capsys):
    import json
    import sys

    sys.path.insert(0, "jobs")
    import crawl_job

    wd = str(tmp_path / "crawl")
    rc = crawl_job.main(["--synthetic-domains", "6", "--workdir", wd])
    assert rc == 0
    first = json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    )
    rc = crawl_job.main(
        ["--synthetic-domains", "6", "--workdir", wd, "--recrawl-max-age", "0"]
    )
    assert rc == 0
    second = json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    )
    # age 0 => every seed stale; the sub-crawl repeats the same attempts
    assert len(second["recrawled_seeds"]) > 0
    assert second["fetch_attempts"] == first["fetch_attempts"]
