"""Re-crawl scheduling — the freshness loop the reference lacks.

The reference pipeline is one-shot: seeds in, records out, done
(``run_url_producer.py`` exits after the CSV). A production crawler
revisits: pages change, records go stale. This plan closes that loop
over the graft's own state tables:

1. ``select_stale_seeds`` — a pure query over the crawl log: per
   seed_idx, the most recent attempt timestamp (the log's (host, ts)
   columns exist for exactly this kind of as-of reasoning); stale =
   ``last_ts < now - max_age_s``. Log-scale groupBy; only the per-seed
   result (bounded by the seed list, which is driver-scale by design —
   the reference ships 997 rows) comes back to the driver.
2. ``recrawl`` — run the UNCHANGED crawl plan over just the stale
   seeds in a sub-workdir (every invariant — politeness, robots,
   crash-safe commits, seen-set modes — is inherited, not
   re-implemented), then fold the results into the parent state:
   - records: ``merge_company_records`` (the A7/E1 MERGE — scalar
     last-writer-wins, list first-seen union), so a changed page
     overwrites scalars and appends new list values while preserving
     first-seen order of the old ones;
   - crawl log: the sub-crawl's full log (host/ts/ok/attempt_no)
     appended with rounds offset past the parent's max round and
     seed_idx mapped back to PARENT indices, keeping per-seed
     freshness queries and the as-of robots report coherent.

Idempotence: re-crawling an UNCHANGED domain is a records no-op by the
merge's own contract (driver-checked as ``h5_idempotent_upsert``); the
test pins both that and the changed-page overwrite path.
"""

from __future__ import annotations

import os
import time as _time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from web_scraper_spark.sources.tables import SnapshotTable, merge_company_records


def select_stale_seeds(
    crawl_log: DataFrame, now_ts: float, max_age_s: float
) -> DataFrame:
    """(seed_idx, last_ts) for seeds whose most recent fetch attempt is
    older than ``max_age_s``. One log-scale groupBy on seed_idx."""
    return (
        crawl_log.groupBy("seed_idx")
        .agg(F.max("ts").alias("last_ts"))
        .where(F.col("last_ts") < F.lit(float(now_ts)) - F.lit(float(max_age_s)))
        .orderBy("seed_idx")
    )


def recrawl(
    spark: SparkSession,
    seeds: list[str],
    web: DataFrame,
    workdir: str,
    *,
    max_age_s: float = 0.0,
    now_ts: float | None = None,
    seed_indices: list[int] | None = None,
    **crawl_kwargs,
):
    """Re-crawl stale seeds of the crawl at ``workdir`` and merge the
    results back. ``seeds`` must be the parent crawl's original seed
    list — seed_idx assignment is deterministic (the engine's own seed
    stage replays it), so indices line up. ``seed_indices`` overrides
    staleness selection for targeted re-crawls. Returns
    (sub_result_or_None, stale_parent_seed_indices)."""
    from web_scraper_spark.plans.crawl import _seed_frontier, run_crawl

    log_t = SnapshotTable(spark, os.path.join(workdir, "crawl_log"))
    log = log_t.read()
    if log is None:
        raise ValueError(f"no crawl log at {workdir} — nothing to re-crawl")

    if seed_indices is None:
        now = _time.time() if now_ts is None else now_ts
        stale = [
            int(r.seed_idx)
            for r in select_stale_seeds(log, now, max_age_s).collect()
        ]
    else:
        stale = sorted(set(int(i) for i in seed_indices))
    if not stale:
        return None, []

    # parent seed_idx -> prepared seed url, via the engine's own seed
    # stage (CSV order, blank skip, prepare, first-occurrence dedup) —
    # driver-scale collect by design
    idx_to_url = {
        int(r.seed_idx): r.seed_url
        for r in _seed_frontier(spark, seeds).select("seed_idx", "seed_url").collect()
    }
    missing = [i for i in stale if i not in idx_to_url]
    if missing:
        raise ValueError(f"seed indices {missing} not derivable from seeds list")

    # prepared urls are distinct and re-prepare idempotently, so the
    # sub-crawl's seed_idx i corresponds to parent index stale[i]
    sub_seeds = [idx_to_url[i] for i in stale]
    n_prior = len(
        [d for d in os.listdir(workdir) if d.startswith("recrawl_")]
    )
    sub_dir = os.path.join(workdir, f"recrawl_{n_prior}")
    sub = run_crawl(spark, sub_seeds, web, None, workdir=sub_dir, **crawl_kwargs)

    # fold records into the parent table (MERGE semantics)
    records_t = SnapshotTable(spark, os.path.join(workdir, "company_records"))
    if sub.company_records is not None and not sub.company_records.isEmpty():
        merge_company_records(records_t, sub.company_records)

    # append the sub-crawl's FULL log (host/ts/ok/attempt_no) with rounds
    # offset past the parent's max and seed_idx mapped to parent indices
    sub_log = SnapshotTable(spark, os.path.join(sub_dir, "crawl_log")).read()
    max_round = log.agg(F.max("round")).collect()[0][0] or 0
    idx_map = F.create_map(
        *[F.lit(x) for sub_i, parent_i in enumerate(stale) for x in (sub_i, parent_i)]
    )
    remapped = sub_log.withColumn(
        "round", (F.col("round") + F.lit(int(max_round) + 1)).cast(
            dict(sub_log.dtypes)["round"]
        )
    ).withColumn(
        "seed_idx",
        idx_map[F.col("seed_idx").cast("int")].cast(dict(sub_log.dtypes)["seed_idx"]),
    )
    log_t.append(remapped, tag=None)
    return sub, stale
