"""Exact pre-dedup guard for LSH dedups (VERDICT r2 item 8).

Every banded candidate generator in this repo (MinHash bands, sign-LSH,
phash Hamming bands, length/min-gram blocks) bounds its pairwise work by
the BUCKET sizes — which a degenerate corpus defeats: g byte-identical
documents share every band, so one bucket alone costs g*(g-1)/2
candidate pairs. At the 10^10-row design point a popular boilerplate
page (g ~ 10^6 copies) is a 10^12-pair bucket — a stage that never
finishes.

The guard is one exact groupBy: collapse each identical-content group to
its min-id representative BEFORE the LSH pass, and carry (keep, dup)
links for the collapsed members. Candidate work over the
representatives is the intended near-dup load; the links re-attach the
exact duplicates as 0-distance stars, so connected components /
keep-best over (rep pairs + links) equal those over the naive all-rows
pass. ``operators/imagedup.phash_neardup_pairs(exact_prededup=True)``
applies the same trick keyed on the full phash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_prededup(
    df: DataFrame, content_cols: list[str], id_col: str
) -> tuple[DataFrame, DataFrame]:
    """-> (representatives, links).

    representatives: one row per distinct content (the min-``id_col``
    member), all original columns kept — run the LSH pass over THIS.
    links: (id_keep, id_dup) for every collapsed member. One shuffle on
    the content hash; ids-only second shuffle for the links."""
    key = F.md5(
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in content_cols])
    )
    with_key = df.withColumn("_ck", key)
    keeps = with_key.groupBy("_ck").agg(F.min(id_col).alias("_keep"))
    joined = with_key.join(keeps, "_ck")
    representatives = joined.where(F.col(id_col) == F.col("_keep")).drop(
        "_ck", "_keep"
    )
    links = joined.where(F.col(id_col) != F.col("_keep")).select(
        F.col("_keep").alias("id_keep"), F.col(id_col).alias("id_dup")
    )
    return representatives, links
