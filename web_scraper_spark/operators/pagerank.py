"""PageRank over a directed link graph — the canonical frontier-priority
signal (a crawl scheduler that drains high-rank hosts first plugs the
output straight into ``run_crawl(priority_expr=...)``).

Iterative power method in pure DataFrame ops, the same discipline as
``operators/components.py``:

- per iteration: one join of ranks onto the edge list (contributions =
  rank/out_degree), one groupBy(dst) sum, one broadcast of the 1-row
  dangling-mass aggregate — ranks-only shuffles, never payloads;
- dangling vertices (no out-edges) redistribute their mass uniformly,
  the textbook formulation: r'(v) = (1-d)/N + d * (in(v) + dangling/N);
- ``localCheckpoint(eager=True)`` per iteration truncates the logical
  plan (CLAUDE.md invariant for iterative loops);
- fixed iteration count -> deterministic, and one-shot-SQL-expressible
  by unrolling (the DuckDB oracle in contract_training does exactly
  that, like ann_ivf_kmeans).

Scale shape at 10^10 edges: the edge list shuffles once per iteration
on src (join) and once on dst (sum) — both hash-partitioned, skew
handled by AQE like any hot-key aggregate; the rank table is one double
per vertex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(id, rank) after ``iterations`` power steps from the uniform
    start. ``edges`` directed, pre-deduped; edges whose dst is not in
    ``vertices`` are ignored (their mass vanishes like a crawl-scope
    filter would)."""
    n = vertices.count()
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    )
    out_deg = e.groupBy("src").agg(F.count("*").cast("double").alias("deg"))
    ranks = vertices.select(
        F.col(id_col).alias("id"), F.lit(1.0 / n).alias("rank")
    ).localCheckpoint(eager=True)

    for _ in range(iterations):
        # dangling mass: one row, broadcast back (never a driver scalar)
        dangling = (
            ranks.join(out_deg, ranks["id"] == out_deg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        contribs = (
            e.join(ranks, e["src"] == ranks["id"])
            .join(out_deg, "src")
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("inc"))
        )
        ranks = (
            vertices.select(F.col(id_col).alias("id"))
            .join(contribs, F.col("id") == contribs["dst"], "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping)
                    * (F.coalesce(F.col("inc"), F.lit(0.0)) + F.col("dm") / F.lit(float(n)))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
