"""phash band-bucketed near-dup: exact recall/precision vs brute force
(pigeonhole guarantees recall for max_hamming < n_bands), including
negative longs (the top band must use an unsigned shift)."""

import itertools
import random

import pytest

from web_scraper_spark.operators.imagedup import phash_neardup_pairs


def _brute(pairs_input, k):
    out = set()
    for (ia, pa), (ib, pb) in itertools.combinations(pairs_input, 2):
        if bin((pa ^ pb) & ((1 << 64) - 1)).count("1") <= k:
            a, b = sorted((ia, ib))
            out.add((a, b))
    return out


def test_matches_brute_force_including_negative_hashes(spark):
    rng = random.Random(99)
    rows = []
    base_hashes = [rng.getrandbits(64) - (1 << 63) for _ in range(12)]
    i = 0
    for base in base_hashes:
        for _ in range(rng.randrange(1, 5)):
            # flip up to 4 random bits off the cluster base
            ph = base
            for _ in range(rng.randrange(0, 5)):
                ph ^= 1 << rng.randrange(64)
            rows.append((i, ph))
            i += 1
    df = spark.createDataFrame(rows, "image_id long, phash long")
    got = {
        (r.id_a, r.id_b)
        for r in phash_neardup_pairs(df, max_hamming=3, n_bands=4).collect()
    }
    exp = _brute(rows, 3)
    assert got == exp and exp  # non-vacuous


def test_recall_precondition_enforced():
    with pytest.raises(ValueError):
        phash_neardup_pairs(None, max_hamming=4, n_bands=4)
