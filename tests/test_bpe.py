"""operators/bpe.py vs an independent pure-Python BPE reference
(Sennrich merge rules: weighted adjacent pair counts over the vocab,
greedy top-1 per round, count-desc / pair-string-asc ties,
left-to-right non-overlapping application)."""

from __future__ import annotations

import random

import pytest

from web_scraper_spark.operators.bpe import bpe_train


def _ref_merge(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_bpe(wordcounts: dict[str, int], n_merges: int):
    vocab = {w: list(w) for w in wordcounts}
    merges = []
    for _ in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + wordcounts[w]
        if not counts:
            break
        best = min(
            counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )[0]
        merges.append(best)
        vocab = {w: _ref_merge(s, *best) for w, s in vocab.items()}
    return merges, vocab


def _run(spark, wordcounts, n_merges):
    df = spark.createDataFrame(
        list(wordcounts.items()), "w string, wcount bigint"
    )
    merges, vocab = bpe_train(df, n_merges)
    got_vocab = {r.w: list(r.syms) for r in vocab.collect()}
    return merges, got_vocab


def test_classic_low_lower(spark):
    # the canonical Sennrich example shape: repeated subwords dominate
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    exp_merges, exp_vocab = _ref_bpe(wc, 6)
    merges, vocab = _run(spark, wc, 6)
    assert merges == exp_merges
    assert vocab == exp_vocab


def test_overlap_and_ties(spark):
    # 'aaaa' exercises non-overlapping application (aa twice, not thrice);
    # equal counts exercise the pair-string tie-break
    wc = {"aaaa": 3, "abab": 3, "bb": 3}
    exp_merges, exp_vocab = _ref_bpe(wc, 4)
    merges, vocab = _run(spark, wc, 4)
    assert merges == exp_merges
    assert vocab == exp_vocab


def test_exhaustion_stops_early(spark):
    # single-char words have no pairs: zero merges, vocab unchanged
    wc = {"a": 4, "b": 2}
    merges, vocab = _run(spark, wc, 3)
    assert merges == []
    assert vocab == {"a": ["a"], "b": ["b"]}


@pytest.mark.parametrize("seed", [7, 23])
def test_randomized_parity(spark, seed):
    rng = random.Random(seed)
    words = {
        "".join(rng.choice("abc") for _ in range(rng.randint(1, 8))): rng.randint(1, 9)
        for _ in range(40)
    }
    exp_merges, exp_vocab = _ref_bpe(words, 8)
    merges, vocab = _run(spark, words, 8)
    assert merges == exp_merges
    assert vocab == exp_vocab
