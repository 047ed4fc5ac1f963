"""SnapshotTable.expire_snapshots — the Iceberg expire_snapshots +
remove_orphan_files analog: history trim, exclusive-dir deletion, the
reset-barrier invariant, and in-flight write_data output left alone."""

import os

from web_scraper_spark.sources.tables import SnapshotTable


def _dirs_on_disk(t):
    return {
        os.path.join(t.root, "data", d)
        for d in os.listdir(os.path.join(t.root, "data"))
    }


def test_expire_keeps_current_and_visible_tag(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(spark.range(3).toDF("a"), tag="round-0")
    t.append(spark.range(3, 6).toDF("a"), tag="round-1")
    t.overwrite(spark.range(10, 12).toDF("a"))  # current, untagged
    before = _dirs_on_disk(t)
    assert len(before) == 3

    # an in-flight (never committed) write_data dir must survive expiry
    orphan = t.write_data(spark.range(99).toDF("a"))

    deleted = t.expire_snapshots(keep_last=1)
    # current snapshot references only its own dir; round-1 stays (the
    # visible tag for resume); round-0's two... round-0 dir is ALSO part
    # of round-1's snapshot (append = old + new) so only nothing unique
    # to round-0 exists -> 0 deletions here
    assert deleted == 0
    assert t.last_tag() == "round-1"
    assert {r.a for r in t.read().collect()} == {10, 11}
    assert {r.a for r in t.read_at_tag("round-1").collect()} == {0, 1, 2, 3, 4, 5}
    assert os.path.isdir(orphan)

    # retag the current state, expire again: the old tagged history and
    # its now-exclusive dirs go away
    t.overwrite(spark.range(20, 22).toDF("a"), tag="round-2")
    deleted = t.expire_snapshots(keep_last=1)
    assert deleted >= 2  # round-0 + round-1 appends + the 10..12 dir
    assert t.last_tag() == "round-2"
    assert {r.a for r in t.read().collect()} == {20, 21}
    assert t.read_at_tag("round-1") is None  # expired history
    assert os.path.isdir(orphan)


def test_expire_never_resurrects_pre_reset_tags(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "t"))
    t.append(spark.range(2).toDF("a"), tag="round-7")
    t.reset()
    t.append(spark.range(5, 7).toDF("a"))  # fresh run, no tag yet
    assert t.last_tag() is None
    t.expire_snapshots(keep_last=1)
    # the pre-reset tagged snapshot is gone from the manifest entirely —
    # a resume scan must still see NO tag
    assert t.last_tag() is None
    assert {r.a for r in t.read().collect()} == {5, 6}


def test_expire_after_crawl_shrinks_frontier_history(spark, tmp_path):
    from web_scraper_spark.plans.crawl import run_crawl
    from web_scraper_spark.oracle.simulator import simulate
    from web_scraper_spark.sources.synthetic_web import build_web, web_host_df

    seeds, web = build_web(12)
    oracle = simulate(seeds, web, None, politeness_budget=2)
    # expiry off: per-round manifest history accumulates
    result = run_crawl(
        spark, seeds, web_host_df(spark, 12), None,
        workdir=str(tmp_path / "keep"), politeness_budget=2,
        expire_history=False,
    )
    frontier = SnapshotTable(spark, str(tmp_path / "keep" / "frontier"))
    assert len(frontier._read_manifest()["snapshots"]) > 3  # one per round
    deleted = frontier.expire_snapshots(keep_last=1)
    assert deleted >= 1  # consumed round dirs reclaimed
    assert len(frontier._read_manifest()["snapshots"]) <= 2
    # the crawl output is untouched by frontier-history expiry
    got = sorted(tuple(r) for r in result.crawl_log.collect())
    assert got == oracle.crawl_order

    # default: run_crawl expires on completion — history already trimmed,
    # same results
    result2 = run_crawl(
        spark, seeds, web_host_df(spark, 12), None,
        workdir=str(tmp_path / "auto"), politeness_budget=2,
    )
    frontier2 = SnapshotTable(spark, str(tmp_path / "auto" / "frontier"))
    assert len(frontier2._read_manifest()["snapshots"]) <= 2
    got2 = sorted(tuple(r) for r in result2.crawl_log.collect())
    assert got2 == oracle.crawl_order
