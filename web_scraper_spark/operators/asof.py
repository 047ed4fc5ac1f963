"""As-of join — for each left row, the latest right row of the same key
with right_time <= left_time (the standard temporal enrichment operator;
Spark has no built-in).

Implementation is the UNION-MERGE form, not a per-row lookup: tag both
sides, union them on a common time axis, sort once per key, and carry
the most recent right-side payload forward with ``last(ignorenulls)``
over an unbounded-preceding window. The payload travels as ONE struct —
per-column lasts could stitch fields from different right rows when a
payload field is legitimately null. Cost = one shuffle per side on the
key + one per-key sort — the same shape as a sort-merge join, so it
scales like one: no broadcast of the right side, no range explosion, no
per-row probes. Skewed keys behave exactly like any window skew (salt or
range-partition upstream if one key dominates).

Tie rule: a right row at exactly left_time MATCHES (<= semantics) — the
union sorts right rows before left rows at equal timestamps. Callers
must pre-dedupe the right side to one row per (key, time) (pass the
dedup policy explicitly); with duplicates the "latest" row is undefined
in every engine (DuckDB's ASOF JOIN has the same precondition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload: list[str],
) -> DataFrame:
    """Left rows + ``payload`` columns of the latest right row with
    ``right_time <= left_time`` per ``key`` (nulls when none precedes).
    ``right`` must be unique per (key, right_time); payload names must
    not collide with left columns (the output carries both)."""
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(
            f"payload columns {sorted(clash)} collide with left columns — "
            "rename one side before joining"
        )
    left_struct_t = left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
    payload_struct_t = right.select(F.struct(*payload).alias("s")).schema["s"].dataType

    l = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),  # right (0) sorts first at equal times
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(payload_struct_t).alias("_r"),
    )
    r = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(left_struct_t).alias("_l"),
        F.struct(*payload).alias("_r"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l.unionByName(r).select(
        "_side",
        "_l",
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    )
    return merged.where(F.col("_side") == 1).select(
        "_l.*", *[F.col(f"_r.{c}").alias(c) for c in payload]
    )
