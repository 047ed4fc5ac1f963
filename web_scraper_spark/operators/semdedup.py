"""SemDeDup (Abbas et al. 2023) — semantic near-duplicate removal in
embedding space: coarse-cluster the corpus, then inside each cluster
drop every vector that has a higher-priority near-twin (cosine >=
``thresh``); the keeper rule is min id (the repo's dedup idiom).

Scale design:
- ``k`` is the lever — cluster size ~ N/k bounds the quadratic pairwise
  term, so k must GROW with the corpus (the paper uses k ~ N/10^4 at
  LAION scale). The contract query pins k=8 for the 500-row sf tables;
  corpus-scale benchmarks pass a larger k. Clustering is a single
  nearest-seed assignment (seeds = the k lowest ids, squared-L2, ties
  to low cid — the ann_ivf_kmeans assign shape), one broadcast join.
- All vector math runs on FLAT scalar columns (e0..e63), not arrays:
  array getItem in codegen measures ~3x slower per element, and flat
  columns keep the self-join rows compact. Sums are STAGED 8x8-term
  partial columns (one flat 64-term tree beats janino's 64 KB method
  limit and silently interprets — the ann_int8_topk lesson); the
  association tree ((t0..t7)+(t8..t15)+...) is identical on the DuckDB
  oracle side, so threshold decisions are bit-stable cross-engine.
- Per-vector norms are computed ONCE before the pair join (3x less
  arithmetic per candidate pair).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMB_DIM = 64
_GROUP = 8


def staged_partials(term_fn, prefix: str, dim: int = EMB_DIM) -> list[Column]:
    """``dim/8`` 8-term partial-sum columns (left-assoc within each
    group) — separate projection columns so codegen can split methods."""
    cols = []
    for g in range(0, dim, _GROUP):
        acc = None
        for i in range(g, g + _GROUP):
            t = term_fn(i)
            acc = t if acc is None else acc + t
        cols.append(acc.alias(f"{prefix}{g // _GROUP}"))
    return cols


def staged_total(prefix: str, dim: int = EMB_DIM) -> Column:
    acc = F.col(f"{prefix}0")
    for g in range(1, dim // _GROUP):
        acc = acc + F.col(f"{prefix}{g}")
    return acc


def semdedup_dups(
    e: DataFrame,
    k: int,
    thresh: float = 0.9,
    id_col: str = "vec_id",
    emb_col: str = "emb",
    dim: int = EMB_DIM,
) -> DataFrame:
    """Return one row per DROPPED vector: (``id_col``, cid, keeper,
    sim_keeper) — keeper is the smallest-id near-twin in the same
    cluster, sim_keeper its cosine rounded to 6 places. ``e`` must hold
    (``id_col``, ``emb_col``: array<double>); seeds are the rows with
    ``id_col`` < ``k``."""
    vid = F.col(id_col)
    # one flat projection computes the scalar columns AND the per-vector
    # norm (n2 is cluster-independent); keeping the chain
    # projection-only before the checkpoint matters — chaining a
    # 64-partial projection ON TOP of the assignment aggregate in a
    # single un-checkpointed plan sends the Spark 4.1 optimizer's
    # expression canonicalization into a driver-heap blowup (observed
    # OOM at 556 rows; split plans are milliseconds)
    flat = (
        e.select(
            vid.alias("_vid"),
            *[F.col(emb_col)[i].alias(f"e{i}") for i in range(dim)],
        )
        .select(
            "_vid", *[f"e{i}" for i in range(dim)],
            *staged_partials(
                lambda i: F.col(f"e{i}") * F.col(f"e{i}"), "_n", dim
            ),
        )
        .withColumn("n2", staged_total("_n", dim))
        .select("_vid", *[f"e{i}" for i in range(dim)], "n2")
        .localCheckpoint(eager=True)
    )
    seeds = F.broadcast(
        flat.where(F.col("_vid") < k).select(
            F.col("_vid").cast("int").alias("cid"),
            *[F.col(f"e{i}").alias(f"c{i}") for i in range(dim)],
        )
    )

    def d2_term(i):
        diff = F.col(f"e{i}") - F.col(f"c{i}")
        return diff * diff

    assigned = (
        flat.crossJoin(seeds)
        .select("_vid", "n2", *[f"e{i}" for i in range(dim)],
                *staged_partials(d2_term, "_d", dim), "cid")
        .withColumn("_d2", staged_total("_d", dim))
        .groupBy("_vid")
        .agg(
            F.min_by("cid", F.struct(F.col("_d2"), F.col("cid"))).alias("cid"),
            F.first("n2").alias("n2"),
            *[F.first(f"e{i}").alias(f"e{i}") for i in range(dim)],
        )
        .localCheckpoint(eager=True)
    )
    a = assigned.select(
        F.col("_vid").alias("va"), "cid",
        *[F.col(f"e{i}").alias(f"a{i}") for i in range(dim)],
        F.col("n2").alias("a_n2"),
    )
    b = assigned.select(
        F.col("_vid").alias("vb"), F.col("cid").alias("b_cid"),
        *[F.col(f"e{i}").alias(f"b{i}") for i in range(dim)],
        F.col("n2").alias("b_n2"),
    )

    def dot_term(i):
        return F.col(f"a{i}") * F.col(f"b{i}")

    pairs = (
        a.join(b, (a["cid"] == b["b_cid"]) & (a["va"] < b["vb"]))
        .select("va", "vb", "b_cid", "a_n2", "b_n2",
                *staged_partials(dot_term, "_dot", dim))
        .withColumn(
            "cos",
            staged_total("_dot", dim)
            / (F.sqrt(F.col("a_n2")) * F.sqrt(F.col("b_n2"))),
        )
        .where(F.col("cos") >= thresh)
    )
    return (
        pairs.groupBy(
            F.col("vb").alias(id_col), F.col("b_cid").alias("cid")
        )
        .agg(
            F.min("va").alias("keeper"),
            F.round(F.min_by("cos", "va"), 6).alias("sim_keeper"),
        )
    )
