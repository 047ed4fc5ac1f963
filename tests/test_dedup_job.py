"""jobs/dedup_job.py end to end on the sf0.001 testdata."""

import json
import os

import pytest

SF = "/root/testdata/sf0.001"
pytestmark = pytest.mark.skipif(not os.path.isdir(SF), reason="no testdata")


def test_dedup_job_end_to_end(spark, tmp_path, capsys):
    import sys
    sys.path.insert(0, "jobs")
    import dedup_job

    rc = dedup_job.main(["--data-dir", SF, "--outdir", str(tmp_path)])
    assert rc == 0
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    summary = json.loads(line)
    assert summary["documents"] == 500
    assert summary["exact_duplicates"] == 0  # corpus is duplicate-free
    assert 0 < summary["neardup_clusters"] <= 500
    for name in ("exact_links", "clusters", "keepers", "funnel"):
        out = spark.read.parquet(str(tmp_path / name))
        assert out.columns, name
    keepers = spark.read.parquet(str(tmp_path / "keepers"))
    assert keepers.count() == summary["neardup_clusters"]
    clusters = spark.read.parquet(str(tmp_path / "clusters"))
    assert clusters.count() == 500  # every doc labeled
