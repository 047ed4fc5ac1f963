"""pagerank: hand-computed one-step values (incl. dangling-mass
redistribution and mass conservation), plus the iterative shape."""

import pytest


def test_one_step_hand_computed(spark):
    from web_scraper_spark.operators.pagerank import pagerank

    v = spark.createDataFrame([(0,), (1,), (2,)], "id long")
    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = {r.id: r.rank for r in pagerank(v, e, iterations=1).collect()}
    # r0 = 1/3 each; vertex 2 dangles -> dm = 1/3
    # r1(v) = 0.15/3 + 0.85*(in(v) + (1/3)/3)
    third = 1.0 / 3.0
    base = 0.15 / 3 + 0.85 * (third / 3)
    assert got[0] == pytest.approx(base)
    assert got[1] == pytest.approx(base + 0.85 * third)
    assert got[2] == pytest.approx(base + 0.85 * third)
    assert sum(got.values()) == pytest.approx(1.0)  # mass conserved


def test_converges_toward_sink_cycle(spark):
    from web_scraper_spark.operators.pagerank import pagerank

    # a chain feeding a 2-cycle: the cycle accumulates rank
    v = spark.createDataFrame([(i,) for i in range(5)], "id long")
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 3)], "src long, dst long"
    )
    got = {r.id: r.rank for r in pagerank(v, e, iterations=8).collect()}
    assert got[3] > got[0] and got[4] > got[0]
    assert sum(got.values()) == pytest.approx(1.0)
