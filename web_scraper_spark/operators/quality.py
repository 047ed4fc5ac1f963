"""Composite document-quality rules (Gopher-style, Rae et al. 2021
§A1.1) as a DataFrame-level operator — shared by the
``gopher_quality_filter`` contract query and the training-data export
pipeline (jobs/export_job.py).

Every rule is an integer inequality (mean-word-length bounds become
cross-multiplications; no division, no float, no rounding-boundary
hazard), so the verdict is bit-stable across engines and partitionings.
Scale shape: ONE (doc, word) groupBy then ONE doc groupBy, both
partial-aggregatable; no corpus-global state — the filter maps over any
corpus size embarrassingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GOPHER_STOPWORDS = ("the", "a", "of", "and", "to")


def gopher_report(
    d: DataFrame, doc_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc rule report: (doc_col, n_words, n_distinct,
    max_word_count, r_* flags, passes_all)."""
    # r6 scan-parallelism floor (guide §6): the explode + (doc, word)
    # groupBy dominate the scan's byte cost; a small compressed corpus
    # otherwise single-threads the stage. No-op on well-split inputs.
    from web_scraper_spark.plans.contract import _floor_parallelism

    toks = _floor_parallelism(d.select(doc_col, text_col)).select(
        doc_col, F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("w")
    )
    wc = toks.groupBy(doc_col, "w").agg(F.count("*").alias("cnt"))
    is_stop = F.when(F.col("w").isin(*GOPHER_STOPWORDS), 1).otherwise(0)
    per = wc.groupBy(doc_col).agg(
        F.sum("cnt").alias("n_words"),
        F.sum(F.length("w") * F.col("cnt")).alias("word_chars"),
        F.count("*").alias("n_distinct"),
        F.max("cnt").alias("max_word_count"),
        F.sum(is_stop).alias("n_stop_distinct"),
    )
    n, chars = F.col("n_words"), F.col("word_chars")
    r_wc = (n >= 10) & (n <= 100000)
    r_mwl = (3 * n <= chars) & (chars <= 10 * n)
    r_mwf = 10 * F.col("max_word_count") <= n
    r_df = 5 * F.col("n_distinct") >= n
    r_sw = F.col("n_stop_distinct") >= 2
    return per.select(
        doc_col,
        "n_words",
        "n_distinct",
        "max_word_count",
        r_wc.alias("r_word_count"),
        r_mwl.alias("r_mean_word_len"),
        r_mwf.alias("r_max_word_frac"),
        r_df.alias("r_distinct_frac"),
        r_sw.alias("r_stopwords"),
        (r_wc & r_mwl & r_mwf & r_df & r_sw).alias("passes_all"),
    )
