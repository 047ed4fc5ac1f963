"""Distributed BPE tokenizer training (Sennrich et al. 2016) — the
iterative sibling of ``bpe_pair_counts``: greedily merge the most
frequent adjacent symbol pair ``n_merges`` times.

Scale design (why this survives a 10^13-token corpus):
- Everything runs over the VOCABULARY (word, count) table, never the
  token stream — the corpus is aggregated once upstream (that single
  corpus pass is ``bpe_pair_counts``'s shape). Real trainers do exactly
  this; vocab is ~10^7 rows at web scale.
- Each merge round is ONE partial-aggregatable groupBy over exploded
  adjacent pairs plus a driver-side top-1 (a 1-row collect — the argmax
  is the only thing that leaves the executors, the repo's pagerank/CC
  convention for iterative driver decisions).
- Merge application touches only the words that CONTAIN the winning
  pair (an exists() predicate keeps the rewrite surface minimal); the
  rewrite itself is an Arrow-batched pandas UDF doing the standard
  left-to-right non-overlapping scan.
- The vocab is localCheckpoint'ed every iteration — the repo invariant
  for iterative DataFrame loops (unbounded logical plans OOM the
  analyzer).
- Ties break deterministically: (count DESC, pair-string ASC) — every
  run, any partitioning, same merge list.

Incremental pair-count maintenance (only re-counting pairs around
changed words, the fastest known single-node trick) is a further
optimization, not done here: it turns the per-round groupBy into a
delta update but complicates exactly-once semantics on retries.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType


def chars_of(word_col):
    """Split a word into single-character symbols (the BPE base vocab)."""
    return F.split(word_col, "")


def _adjacent_pairs(vocab: DataFrame) -> DataFrame:
    """(pair, n) adjacent-pair counts over (syms: array<string>, wcount),
    weighted by word frequency; pair rendered as 'a b' (symbols may be
    multi-char after earlier merges, so a separator is required)."""
    return (
        vocab.where(F.size("syms") >= 2)
        .select(
            "wcount",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(syms) - 2),"
                    " i -> concat(syms[i], ' ', syms[i + 1]))"
                )
            ).alias("pair"),
        )
        .groupBy("pair")
        .agg(F.sum("wcount").alias("n"))
    )


def _merge_word(syms: list, a: str, b: str, ab: str) -> list:
    out = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_train(
    words: DataFrame,
    n_merges: int,
    word_col: str = "w",
    count_col: str = "wcount",
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Train ``n_merges`` BPE merges over a (word, count) vocabulary.

    Returns (merges, vocab) — merges as [(a, b), ...] in application
    order, vocab as (w, wcount, syms) with the final symbol arrays.
    """
    vocab = words.select(
        F.col(word_col).alias("w"),
        F.col(count_col).alias("wcount"),
        chars_of(F.col(word_col)).alias("syms"),
    ).localCheckpoint(eager=True)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            _adjacent_pairs(vocab)
            .orderBy(F.desc("n"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b = top[0]["pair"].split(" ", 1)
        merges.append((a, b))
        ab = a + b

        @F.pandas_udf(ArrayType(StringType()))
        def apply_merge(syms: pd.Series) -> pd.Series:
            return syms.map(lambda s: _merge_word(list(s), a, b, ab))

        # rewrite ONLY the words containing the pair; the rest pass
        # through untouched (no pandas round-trip for them). The size
        # guard must sit INSIDE the AND's left side: Spark's And
        # short-circuits, but a separate Column conjunct doesn't stop
        # exists() from indexing syms[1] on 1-symbol words (ANSI
        # INVALID_ARRAY_INDEX), and sequence(0, size-2) DESCENDS for
        # size < 2 (the CLAUDE.md sequence(1,0) gotcha).
        has_pair = F.expr(
            "size(syms) >= 2 AND exists(sequence(0, size(syms) - 2),"
            f" i -> syms[i] = {_lit(a)} AND syms[i + 1] = {_lit(b)})"
        )
        vocab = vocab.select(
            "w",
            "wcount",
            F.when(has_pair, apply_merge(F.col("syms")))
            .otherwise(F.col("syms"))
            .alias("syms"),
        ).localCheckpoint(eager=True)

    return merges, vocab


def _lit(s: str) -> str:
    """SQL string literal with quote escaping (symbols come from corpus
    text, which the synthetic fixtures keep quote-free, but escape
    anyway)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
