"""connected_components: correctness on hand-built graphs and the
pointer-jumping convergence bound (a 2^k chain must converge in O(k)
iterations, not O(2^k))."""

from pyspark.sql import functions as F

from web_scraper_spark.operators.components import connected_components


def _cc(spark, n_vertices, edge_list, **kw):
    v = spark.createDataFrame([(i,) for i in range(n_vertices)], "id long")
    e = spark.createDataFrame(edge_list or [(0, 0)], "src long, dst long")
    if not edge_list:
        e = e.limit(0)
    out = connected_components(v, e, **kw)
    return {r.id: r.component for r in out.collect()}


def test_singletons_and_pairs(spark):
    got = _cc(spark, 6, [(1, 2), (4, 3)])
    assert got == {0: 0, 1: 1, 2: 1, 3: 3, 4: 3, 5: 5}


def test_chain_star_and_cycle_merge(spark):
    # chain 0-1-2-3, star 4-{5,6,7}, cycle 8-9-10-8, bridge 3-8
    edges = [(0, 1), (1, 2), (2, 3), (4, 5), (4, 6), (4, 7),
             (8, 9), (9, 10), (10, 8), (3, 8)]
    got = _cc(spark, 11, edges)
    assert {got[i] for i in (0, 1, 2, 3, 8, 9, 10)} == {0}
    assert {got[i] for i in (4, 5, 6, 7)} == {4}


def test_no_edges(spark):
    got = _cc(spark, 4, [])
    assert got == {i: i for i in range(4)}


def test_long_chain_converges_within_log_iterations(spark):
    # a 64-vertex path: plain propagation needs ~63 rounds; with pointer
    # jumping the label-chain depth halves per round -> well under 14
    n = 64
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _cc(spark, n, edges, max_iterations=14)
    assert set(got.values()) == {0}
