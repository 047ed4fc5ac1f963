"""Rotating JSON-lines sink: content fidelity, rotation, backup cap."""

import json
import os

from web_scraper_spark.sources.logsink import RotatingJsonLogSink


def test_writes_json_lines_in_order(spark, tmp_path):
    path = str(tmp_path / "logs" / "metrics.log")
    sink = RotatingJsonLogSink(path)
    df = spark.createDataFrame(
        [(1, "a", 2.5), (0, "b", 1.0)], "round int, name string, v double"
    )
    n = sink.write(df, order_by=["round"])
    sink.close()
    assert n == 2
    lines = [json.loads(l) for l in open(path)]
    assert lines == [
        {"round": 0, "name": "b", "v": 1.0},
        {"round": 1, "name": "a", "v": 2.5},
    ]


def test_rotation_and_backup_cap(spark, tmp_path):
    path = str(tmp_path / "r.log")
    sink = RotatingJsonLogSink(path, max_bytes=2000, backup_count=2)
    df = spark.createDataFrame(
        [(i, "x" * 80) for i in range(200)], "i long, pad string"
    )
    sink.write(df, order_by=["i"])
    sink.close()
    assert os.path.exists(path)
    assert os.path.exists(path + ".1") and os.path.exists(path + ".2")
    assert not os.path.exists(path + ".3")  # cap respected
    for p in (path, path + ".1", path + ".2"):
        assert os.path.getsize(p) <= 2200
        for line in open(p):
            json.loads(line)  # every line is valid JSON
