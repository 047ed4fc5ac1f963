"""jobs/export_job.py end to end on the sf0.001 testdata: funnel
monotonicity, deterministic re-run (bit-identical shard assignment),
and shard balance."""

import json

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def manifest_and_dir(spark, tmp_path_factory):
    import sys

    sys.path.insert(0, "jobs")
    import export_job

    out = tmp_path_factory.mktemp("export")
    rc = export_job.main(
        ["--data-dir", SF, "--outdir", str(out), "--shards", "8"]
    )
    assert rc == 0
    return json.load(open(out / "manifest.json")), out


def test_funnel_monotone_and_nonvacuous(manifest_and_dir):
    m, _ = manifest_and_dir
    assert (
        m["documents"]
        >= m["after_exact_dedup"]
        >= m["after_neardup"]
        >= m["after_quality"]
        > 0
    )
    # the near-dup and quality stages must each actually drop something
    # on this corpus (dedup_minhash_lsh finds pairs; gopher splits it)
    assert m["after_neardup"] < m["after_exact_dedup"] or m[
        "after_exact_dedup"
    ] == m["documents"]
    assert m["after_quality"] < m["after_neardup"]


def test_shards_cover_all_survivors(manifest_and_dir, spark):
    m, out = manifest_and_dir
    assert sum(s["docs"] for s in m["shards"]) == m["after_quality"]
    corpus = spark.read.parquet(str(out / "corpus"))
    assert corpus.count() == m["after_quality"]
    assert corpus.select("doc_id").distinct().count() == m["after_quality"]
    # hash balance: no shard more than 3x the mean on 8 shards
    docs = [s["docs"] for s in m["shards"]]
    assert max(docs) <= 3 * (sum(docs) / len(docs))


def test_rerun_is_bit_deterministic(manifest_and_dir, spark, tmp_path):
    import export_job

    m1, out1 = manifest_and_dir
    rc = export_job.main(
        ["--data-dir", SF, "--outdir", str(tmp_path), "--shards", "8"]
    )
    assert rc == 0
    m2 = json.load(open(tmp_path / "manifest.json"))
    m1 = {k: v for k, v in m1.items() if k != "outdir"}
    m2 = {k: v for k, v in m2.items() if k != "outdir"}
    assert m1 == m2
    a = {
        (r.doc_id, r.shard, r.n_tokens)
        for r in spark.read.parquet(str(out1 / "corpus")).collect()
    }
    b = {
        (r.doc_id, r.shard, r.n_tokens)
        for r in spark.read.parquet(str(tmp_path / "corpus")).collect()
    }
    assert a == b
