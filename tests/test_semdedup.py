"""operators/semdedup.py — known-geometry checks for the PARAMETERIZED
path (the contract query pins k=8 cross-engine; these pin arbitrary k,
the keeper rule, and the threshold boundary on constructed corpora
where the expected answer is derivable by hand)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from web_scraper_spark.operators.semdedup import semdedup_dups

DIM = 64


def _vec(axis: int, scale: float = 1.0, bump: tuple[int, float] | None = None):
    v = [0.0] * DIM
    v[axis] = scale
    if bump is not None:
        v[bump[0]] += bump[1]
    return v


@pytest.fixture(scope="module")
def geometry(spark):
    """Four orthogonal clusters (axes 0-3). Seeds are ids 0-3 = the unit
    axes. Members: per axis a, ids 10a+4..10a+6 are copies of the axis
    vector scaled 2/3/4 (cosine 1.0 with each other and the seed);
    id 10a+7 is the axis vector with a +5.0 bump on a DIFFERENT axis
    (cosine ~0.2 — never a near-dup)."""
    rows = []
    for a in range(4):
        rows.append((a, _vec(a)))
        for j, s in ((4, 2.0), (5, 3.0), (6, 4.0)):
            rows.append((10 * a + j, _vec(a, s)))
        rows.append((10 * a + 7, _vec(a, 1.0, ((a + 1) % DIM, 5.0))))
    return spark.createDataFrame(rows, "vec_id bigint, emb array<double>")


def test_known_geometry_k4(spark, geometry):
    out = {
        r.vec_id: (r.cid, r.keeper, r.sim_keeper)
        for r in semdedup_dups(geometry, k=4, thresh=0.99).collect()
    }
    for a in range(4):
        # scaled copies dedup to the smallest id in the cluster: the
        # seed itself (id a) is colinear with them -> keeper = a
        for j in (4, 5, 6):
            assert out[10 * a + j] == (a, a, 1.0), (a, j, out.get(10 * a + j))
        # the bumped vector has no >=0.99 twin
        assert 10 * a + 7 not in out
    # seeds themselves are keepers, never dropped
    assert all(a not in out for a in range(4))


def test_threshold_boundary(spark):
    """cos(v, v') crosses the threshold exactly as constructed: two
    pairs, one just above and one just below thresh=0.8."""
    import math

    # cos between axis-0 and (1, t, 0...) is 1/sqrt(1+t^2):
    # t=0.5 -> 0.894 (kept at 0.8), t=1.0 -> 0.707 (dropped at 0.8)
    rows = [
        (0, _vec(0)),
        (10, _vec(0, 1.0, (1, 0.5))),
        (11, _vec(0, 1.0, (2, 1.0))),
    ]
    e = spark.createDataFrame(rows, "vec_id bigint, emb array<double>")
    out = {r.vec_id: r for r in semdedup_dups(e, k=1, thresh=0.8).collect()}
    assert 10 in out and out[10].keeper == 0
    assert abs(out[10].sim_keeper - round(1 / math.sqrt(1.25), 6)) < 1e-9
    assert 11 not in out


def test_keeper_is_min_id_not_seed(spark):
    """The keeper rule is min id among near-twins — when the smallest
    colinear id is NOT a seed, it still wins."""
    rows = [
        (0, _vec(0)),          # seed, cluster 0
        (5, _vec(1, 2.0)),     # non-seed, smallest id on axis 1
        (6, _vec(1, 3.0)),
        (7, _vec(1, 4.0)),
    ]
    e = spark.createDataFrame(rows, "vec_id bigint, emb array<double>")
    out = {r.vec_id: r for r in semdedup_dups(e, k=1, thresh=0.99).collect()}
    # axis-1 vectors cluster wherever d2 puts them (only one seed), but
    # the keeper among {5,6,7} must be 5 and 5 itself survives
    assert out[6].keeper == 5 and out[7].keeper == 5
    assert 5 not in out
