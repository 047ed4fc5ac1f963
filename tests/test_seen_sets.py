"""URL-seen set variants: exact vs Bloom vs Cuckoo agree at fixture
scale; Cuckoo supports deletion (re-crawl)."""

from pyspark.sql import functions as F


def _urls(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("http://h"), (F.col("id") % 97).cast("string"),
                 F.lit(".test/p/"), F.col("id").cast("string")).alias("url")
    )


def test_exact_bloom_cuckoo_agree(spark, tmp_path):
    from web_scraper_spark.operators.seen import (
        BloomURLSeenSet, CuckooURLSeenSet, URLSeenSet,
    )

    batch1 = _urls(spark, 0, 3000)
    batch2 = _urls(spark, 1500, 4500)  # half dupes

    exact = URLSeenSet(spark, str(tmp_path / "exact"))
    exact.add(batch1)
    exact_novel2 = {r.url for r in exact.filter_new(batch2).collect()}
    exact.add(batch2)

    bloom = BloomURLSeenSet(spark, str(tmp_path / "bloom"), num_partitions=8)
    b1 = {r.url for r in bloom.filter_and_add(batch1).collect()}
    b2 = {r.url for r in bloom.filter_and_add(batch2).collect()}

    cuckoo = CuckooURLSeenSet(spark, str(tmp_path / "cuckoo"), num_partitions=8)
    c1 = {r.url for r in cuckoo.filter_and_add(batch1).collect()}
    c2 = {r.url for r in cuckoo.filter_and_add(batch2).collect()}

    all1 = {r.url for r in batch1.distinct().collect()}
    assert b1 == all1 and c1 == all1  # sized for zero FP at this scale
    assert b2 == exact_novel2 and c2 == exact_novel2


def test_cuckoo_deletion_allows_refetch(spark, tmp_path):
    from web_scraper_spark.operators.seen import CuckooURLSeenSet

    cuckoo = CuckooURLSeenSet(spark, str(tmp_path / "ck"), num_partitions=4)
    batch = _urls(spark, 0, 500)
    assert cuckoo.filter_and_add(batch).count() == 500
    assert cuckoo.filter_and_add(batch).count() == 0  # all seen
    # forget half -> they become fetchable again
    forget = _urls(spark, 0, 250)
    cuckoo.delete(forget)
    again = {r.url for r in cuckoo.filter_and_add(batch).collect()}
    assert again == {r.url for r in forget.collect()}


def test_crawl_dedup_with_approx_seen_modes(spark, tmp_path):
    """The crawl's dedup path over Bloom/Cuckoo seen sets (sized for zero
    FP at fixture scale) produces the same final state as exact mode."""
    from web_scraper_spark.plans.crawl import run_crawl
    from web_scraper_spark.sources.synthetic_web import build_web, web_host_df

    seeds, web = build_web(15)
    webdf = web_host_df(spark, 15)

    exact = run_crawl(spark, seeds, webdf, None,
                      workdir=str(tmp_path / "ex"), dedup_contacts=True)
    exact_log = sorted((r["round"], r.depth, r.seed_idx, r.url)
                       for r in exact.crawl_log.collect())
    exact_seen = {r.url for r in exact.url_seen.collect()}

    for mode in ("bloom", "cuckoo"):
        res = run_crawl(spark, seeds, webdf, None,
                        workdir=str(tmp_path / mode), dedup_contacts=True,
                        seen_mode=mode)
        got_log = sorted((r["round"], r.depth, r.seed_idx, r.url)
                         for r in res.crawl_log.collect())
        assert got_log == exact_log, mode
        assert {r.url for r in res.url_seen.collect()} == exact_seen, mode


def test_exact_seen_compact_dedups(spark, tmp_path):
    """ADVICE r1: resume re-adds are idempotent only if compaction
    collapses the (hash, url) duplicates — URLSeenSet owns that."""
    from web_scraper_spark.operators.seen import URLSeenSet

    s = URLSeenSet(spark, str(tmp_path / "cse"))
    batch = _urls(spark, 0, 200)
    s.add(batch)
    s.add(batch)  # simulated resume re-add
    assert s.table.read().count() == 400
    s.compact()
    assert s.table.read().count() == 200
    assert s.snapshot_urls().count() == 200
    # novelty unchanged by compaction
    assert s.filter_new(batch).isEmpty()
