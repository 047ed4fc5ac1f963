"""Per-host politeness scheduling + hot-host skew handling (SURVEY.md H3/H4).

The reference has no politeness (scope note in SURVEY.md); the graft rule:
at most ``budget`` fetches per host per round, hosts draining in
``(seed_idx, url)`` order — deterministic, so crawl order is reproducible.

Two equivalent implementations (tested equal on the skewed fixture):

- ``assign_rounds_window``: the textbook
  ``row_number().over(Window.partitionBy(host).orderBy(...))`` then
  ``floor(rank/budget)``. Correct everywhere, but a 10^9-URL hot host
  serializes into a single partition's sort — the classic window-skew
  bottleneck.
- ``assign_rounds_range``: skew-safe two-phase ranking. Range-partition by
  (host, seed_idx, url) so one hot host SPANS partitions while order is
  globally preserved; compute local per-host ranks in one Arrow pass; add
  per-(partition, host) prefix offsets computed from a tiny counts table
  (one row per host-fragment — #hosts + #partitions rows, driver-safe).
  No shuffle of the big table beyond the range partitioning itself.

Salting (``salted_key``) is for the *fetch stage* partitioning — split a
hot host across S sub-partitions so its within-round fetches parallelize;
the politeness rank is computed per real host BEFORE salting (SURVEY.md §7
hard-part 5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# priority first (the distributed priority-queue dimension: lower value
# drains earlier), then the deterministic tiebreak. The url tiebreak is
# the RAW frontier url — the oracle simulator's rounds_for sorts by the
# same raw key (oracle/simulator.py frontier_sort_key); engine and oracle
# must change together (CLAUDE.md invariant).
ORDER_COLS = ["priority", "seed_idx", "url"]


def assign_rounds_window(frontier: DataFrame, budget: int) -> DataFrame:
    """rank/round via a plain window — the semantics baseline."""
    w = Window.partitionBy("host").orderBy(*[F.col(c) for c in ORDER_COLS])
    return frontier.withColumn(
        "round_offset",
        ((F.row_number().over(w) - F.lit(1)) / F.lit(budget)).cast("long"),
    )


def assign_rounds_range(frontier: DataFrame, budget: int) -> DataFrame:
    """Skew-safe equivalent: range partition + local ranks + small prefix
    offsets joined back — fully distributed, nothing touches the driver.

    The offsets table has one row per (partition, host) fragment:
    #hosts + #partitions rows. At 10^7-10^8 distinct hosts that is far
    too big to collect (the r2 form did — VERDICT r2 scale-killer), but
    tiny per HOST (rows per host = #partitions the host straddles, almost
    always 1), so a window sum over host ordered by _pid is skew-free.
    The join back on (_pid, host) is left to AQE (broadcast when small,
    shuffle join when the host count is huge)."""
    parted = frontier.repartitionByRange(
        F.col("host"), *[F.col(c) for c in ORDER_COLS]
    ).sortWithinPartitions("host", *ORDER_COLS)
    # cache: the counts pass and the ranked pass must see the SAME range
    # partitioning (repartitionByRange samples to pick boundaries)
    with_pid = parted.withColumn("_pid", F.spark_partition_id()).cache()

    # fragment counts stay a DataFrame; running per-host prefix offset =
    # sum of counts over earlier partitions of the same host
    counts = with_pid.groupBy("_pid", "host").agg(F.count("*").alias("_cnt"))
    w_off = (
        Window.partitionBy("host")
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix_df = counts.select(
        "_pid",
        "host",
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_offset"),
    )

    # local rank within (pid, host): partitions are sorted, so a window
    # over (_pid, host) never crosses partitions -> no skew re-shuffle
    w = Window.partitionBy("_pid", "host").orderBy(*[F.col(c) for c in ORDER_COLS])
    ranked = with_pid.withColumn("_local_rank", F.row_number().over(w) - F.lit(1))
    out = (
        ranked.join(prefix_df, ["_pid", "host"], "left")
        .withColumn(
            "round_offset",
            ((F.col("_local_rank") + F.coalesce(F.col("_offset"), F.lit(0))) / F.lit(budget)).cast("long"),
        )
        .drop("_pid", "_local_rank", "_offset")
    )
    return out


def assign_rounds(frontier: DataFrame, budget: int | None, method: str = "range") -> DataFrame:
    """Adds ``round_offset`` (0 = fetch this round). budget=None -> all 0.

    Default is the skew-safe ``range`` method: at the 10^9-hot-host design
    point the ``window`` form serializes one host into a single
    partition's sort (VERDICT r1). ``window`` stays available as the
    semantics baseline; parity tests assert the two are identical."""
    if budget is None:
        return frontier.withColumn("round_offset", F.lit(0).cast("long"))
    if method == "window":
        return assign_rounds_window(frontier, budget)
    return assign_rounds_range(frontier, budget)


def salted_key(host: Column, url: Column, salt_buckets: int = 16) -> Column:
    """Fetch-stage partitioning key: ``host#pmod(xxhash64(url), S)`` —
    splits a hot host across S partitions (SURVEY.md H4)."""
    return F.concat(
        host, F.lit("#"), F.pmod(F.xxhash64(url), F.lit(salt_buckets)).cast("string")
    )
