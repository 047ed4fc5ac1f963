"""Streaming near-dup detection: the continuous-ingest twin of the
batch ``dedup_incremental`` contract query (plans/contract_training.py)
— documents arrive in micro-batches, each batch's MinHash bands are
joined against the accumulated band table of every earlier arrival, and
a per-document verdict (how many earlier near-dups, which was first)
lands in a results SnapshotTable, one atomic commit per batch.

Semantics are **batch-boundary invariant**: a document's matches are all
documents with a strictly earlier arrival order — earlier batch, or the
same batch with a smaller doc_id — that share at least one
(band, minhash) bucket. Re-slicing the same corpus into different
micro-batches yields the identical results table, which is exactly what
the parity test pins (tests/test_streaming_neardup.py replays one corpus
at two batchings plus a whole-corpus batch oracle).

Shape notes:
- the MinHash front half is the SHARED ``operators/minhash.minhash_bands``
  (same shingles, same hash60, same affine permutations as the batch
  dedup family) — the flat-column/partial-agg formulation that stays in
  whole-stage codegen;
- state is the band table only — (batch_id, doc_id, band, minhash),
  never document text — appended per batch, so state grows with the
  corpus's band count, not its bytes. At the 100 TB design point the
  stored side is laid out bucketed by (band, minhash) so the per-batch
  join shuffles only the (small) incoming batch side against co-located
  history buckets; here it is a plain SnapshotTable and the join
  shuffles both sides (identical results, local-scale layout);
- commits are exactly-once per table via tag idempotence: ``land``
  skips a table whose ``batch-{id}`` tag is already committed, so a
  crashed/retried micro-batch (foreachBatch is at-least-once) never
  double-appends results or bands, and a doc can never self-match on
  replay because the old side is read BEFORE the batch's bands commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from web_scraper_spark.operators.minhash import minhash_bands
from web_scraper_spark.sources.tables import SnapshotTable

DOC_SCHEMA = "doc_id long, text string"


def neardup_report(
    new_bands: DataFrame, old_bands: DataFrame | None
) -> DataFrame:
    """Per-new-doc verdict vs the earlier-arrival band set.

    ``new_bands``: (batch_id, doc_id, band, minhash) for the incoming
    batch; ``old_bands``: same schema for every earlier batch (None on
    the first). Matches = earlier arrival (older batch, or same batch
    with smaller doc_id) sharing >=1 bucket. Returns one row per
    incoming doc: (doc_id, n_matches, first_match, is_neardup) — novel
    docs kept with n_matches = 0 (the left join), matching
    ``dedup_incremental``'s aggregate shape but total over the batch."""
    # r6 (VERDICT r5 item 6): the history side joins SEPARATELY from the
    # batch's internal self-join — the old union(old, new) before the
    # join destroyed the stored side's bucketed output partitioning, so
    # even a (band, minhash)-bucketed history table re-shuffled. Split,
    # the stored side of the history join reads its buckets
    # exchange-free (BucketedBandState + the plan test); the self-join
    # is batch-scale. Values are identical: matches from strictly
    # earlier batches and same-batch smaller ids are disjoint row sets
    # whose distinct union this aggregates, and novel docs come back
    # via the left join with n_matches = 0 exactly as before.
    n = new_bands.alias("n")
    keys = (F.col("n.band") == F.col("o.band")) & (
        F.col("n.minhash") == F.col("o.minhash")
    )
    earlier = (F.col("o.batch_id") < F.col("n.batch_id")) | (
        (F.col("o.batch_id") == F.col("n.batch_id"))
        & (F.col("o.doc_id") < F.col("n.doc_id"))
    )

    def _pairs(other: DataFrame) -> DataFrame:
        return n.join(other.alias("o"), keys & earlier, "inner").select(
            F.col("n.doc_id").alias("doc_id"),
            F.col("o.doc_id").alias("match_id"),
        )

    pairs = _pairs(new_bands)
    if old_bands is not None:
        pairs = pairs.unionByName(_pairs(old_bands))
    per_doc = (
        pairs.groupBy("doc_id", "match_id")
        .agg(F.lit(1).alias("_one"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_matches"),
            F.min("match_id").alias("first_match"),
        )
    )
    docs = new_bands.select("doc_id").dropDuplicates(["doc_id"])
    return docs.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_matches"), F.lit(0)).alias("n_matches"),
        "first_match",
        (F.coalesce(F.col("n_matches"), F.lit(0)) > 0).alias("is_neardup"),
    )


def land_batch(
    batch_df: DataFrame,
    batch_id: int,
    results: SnapshotTable,
    band_table: SnapshotTable,
) -> None:
    """One micro-batch: band, report vs history, commit both tables.

    Idempotent per table on the ``batch-{id}`` tag — safe under
    foreachBatch's at-least-once replay in any crash position (results
    committed, bands not: replay recomputes the same report against the
    same pre-batch history, skips the results append, commits bands)."""
    tag = f"batch-{batch_id}"
    if tag in band_table.tags():
        return  # both commits landed; a pure replay
    mh = minhash_bands(batch_df)
    bands = mh.select(
        F.lit(batch_id).cast("long").alias("batch_id"), "doc_id", "band", "minhash"
    )
    try:
        if tag not in results.tags():
            report = neardup_report(bands, band_table.read())
            results.append(report, tag=tag)
        band_table.append(bands, tag=tag)
    finally:
        from web_scraper_spark.operators.minhash import release_bands

        release_bands(mh)


class BucketedBandState:
    """Band history laid out for the exchange-free per-batch join
    (VERDICT r5 item 6): a catalog parquet table bucketed AND per-bucket
    sorted by (band, minhash) — the join keys — and partitioned by
    batch_id, plus an atomically-replaced sidecar manifest listing the
    COMMITTED batch ids. ``neardup_report(new, state.read())`` then
    plans a sort-merge join whose stored side reads pre-bucketed,
    pre-sorted splits: no Exchange, no Sort — only the (small) incoming
    batch shuffles, which is the 100 TB per-batch cost model
    (tests/test_streaming_neardup.py pins the plan).

    Exactly-once has the same shape as SnapshotTable's tag-skip:
    ``append`` is idempotent per tag — a replayed batch whose tag is
    already in the manifest is skipped; a crashed append leaves orphan
    files in an UNCOMMITTED batch_id partition, which ``read()`` filters
    out (partition pruning) and the replay deletes before re-writing.
    Duck-typed to SnapshotTable's read()/append()/tags() so
    ``land_batch`` takes either."""

    def __init__(self, spark: SparkSession, root: str, buckets: int = 32):
        import hashlib
        import os

        self.spark = spark
        self.root = root
        self.buckets = buckets
        os.makedirs(root, exist_ok=True)
        self.table_name = (
            "neardup_bands_" + hashlib.md5(root.encode()).hexdigest()[:10]
        )

    # -- sidecar manifest (atomic rename, SnapshotTable convention) ------
    @property
    def _manifest_path(self) -> str:
        import os

        return os.path.join(self.root, "band_manifest.json")

    def _manifest(self) -> dict:
        import json

        try:
            with open(self._manifest_path) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"batches": [], "tags": []}

    def _commit(self, batch_id: int, tag: str | None) -> None:
        import json
        import os
        import uuid

        m = self._manifest()
        m["batches"].append(int(batch_id))
        if tag:
            m["tags"].append(tag)
        tmp = self._manifest_path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, self._manifest_path)

    def tags(self) -> list[str]:
        return list(self._manifest()["tags"])

    def _ensure_registered(self) -> None:
        """Re-register the catalog entry after a session restart: the
        in-memory catalog dies with the session, the files do not."""
        import os

        if self.spark.catalog.tableExists(self.table_name):
            return
        if os.path.isdir(os.path.join(self.root, "band_data")):
            # recreate the table over the existing bucketed files by
            # appending an empty frame with the same spec
            empty = self.spark.createDataFrame(
                [], "batch_id long, doc_id long, band int, minhash long"
            )
            self._write(empty)

    def _write(self, df: DataFrame) -> None:
        import os

        (
            df.write.format("parquet")
            .mode("append")
            .partitionBy("batch_id")
            .bucketBy(self.buckets, "band", "minhash")
            .sortBy("band", "minhash")
            .option("path", os.path.join(self.root, "band_data"))
            .saveAsTable(self.table_name)
        )

    def append(self, bands: DataFrame, tag: str | None = None) -> None:
        import shutil
        import os

        m = self._manifest()
        if tag and tag in m["tags"]:
            return  # replay: already committed
        self._ensure_registered()
        batch_ids = [
            r[0] for r in bands.select("batch_id").dropDuplicates().collect()
        ]
        for bid in batch_ids:
            part_dir = os.path.join(self.root, "band_data", f"batch_id={bid}")
            if os.path.isdir(part_dir) and bid not in m["batches"]:
                # crashed earlier attempt: drop its orphan files so the
                # re-append cannot double rows
                shutil.rmtree(part_dir, ignore_errors=True)
        self._write(bands.select("batch_id", "doc_id", "band", "minhash"))
        for bid in batch_ids:
            self._commit(bid, tag if bid == batch_ids[-1] else None)

    def read(self) -> DataFrame | None:
        self._ensure_registered()
        committed = self._manifest()["batches"]
        if not committed or not self.spark.catalog.tableExists(self.table_name):
            return None
        return self.spark.table(self.table_name).where(
            F.col("batch_id").isin(committed)
        )


def ingest_document_stream(
    spark: SparkSession,
    doc_dir: str,
    workdir: str,
    max_files_per_trigger: int = 1,
    bucketed_state: bool = False,
):
    """Start the ingest: JSONL files of (doc_id, text) under ``doc_dir``
    -> results table at ``workdir``/neardup_results + band state at
    ``workdir``/neardup_bands. Returns the StreamingQuery (caller owns
    awaitTermination/stop). ``bucketed_state=True`` stores the band
    history as a (band, minhash)-bucketed catalog table so the per-batch
    join reads the stored side exchange-free (BucketedBandState)."""
    results = SnapshotTable(spark, f"{workdir}/neardup_results")
    band_table = (
        BucketedBandState(spark, f"{workdir}/neardup_bands")
        if bucketed_state
        else SnapshotTable(spark, f"{workdir}/neardup_bands")
    )

    raw = (
        spark.readStream.format("json")
        .schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(doc_dir)
    )
    docs = raw.where(F.col("doc_id").isNotNull() & F.col("text").isNotNull())

    return (
        docs.writeStream.foreachBatch(
            lambda df, bid: land_batch(df, bid, results, band_table)
        )
        .option("checkpointLocation", f"{workdir}/neardup_chk")
        .outputMode("append")
        .start()
    )
