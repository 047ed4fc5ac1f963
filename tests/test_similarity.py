"""Sign-LSH near-dup operator: bucket widths must scale with corpus size
(the r1 VERDICT scale flag), precision stays exact (cos computed on real
vectors), and multi-table banding only adds recall."""

import math

from pyspark.sql import functions as F

from web_scraper_spark.operators.similarity import (
    bucket_histogram,
    lsh_bits_for,
    neardup_pairs,
    sign_lsh_bucket,
)


def test_lsh_bits_scale_with_corpus():
    assert lsh_bits_for(64) == 1
    assert lsh_bits_for(500) == 3
    assert lsh_bits_for(500_000) == 13
    assert lsh_bits_for(10_000_000_000) == 28  # the design point
    # monotone: bigger corpus never gets fewer buckets
    prev = 0
    for n in (10, 10**3, 10**6, 10**9, 10**12):
        bits = lsh_bits_for(n)
        assert bits >= prev
        prev = bits


def _skewed_embeddings(spark, n):
    """Deterministic fixture with a useless first hyperplane (component 1
    always positive — a hot dimension) and pseudo-random signs after it."""
    sign = lambda d: (F.when(F.pmod(F.xxhash64(F.col("id") * d + d), F.lit(2)) == 0, -1.0)
                      .otherwise(1.0))
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            F.lit(1.0), *[sign(d) * (1.0 + d / 10.0) for d in range(2, 17)]
        ).alias("embedding"),
    )


def test_bucket_sizes_bounded_on_skewed_fixture(spark):
    e = _skewed_embeddings(spark, 2000).cache()
    max_for = {}
    for bits in (1, 4, 8):
        hist = bucket_histogram(e, bits).agg(F.max("n")).collect()[0][0]
        max_for[bits] = hist
    # bits=1 sees only the hot dimension -> one bucket holds everything;
    # widening past it splits the corpus
    assert max_for[1] == 2000
    assert max_for[4] < 2000 / 4
    assert max_for[8] < 2000 / 32
    e.unpersist()


def test_neardup_auto_bits_subset_of_exact_and_banding_adds_recall(spark):
    sf = "/root/testdata/sf0.001"
    e = spark.read.parquet(f"{sf}/embeddings.parquet").cache()
    n = e.count()
    from web_scraper_spark.operators.similarity import cosine

    a, b = e.alias("a"), e.alias("b")
    cos = cosine(F.col("a.embedding"), F.col("b.embedding"))
    exact = {
        (r.vec_a, r.vec_b)
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .where(cos >= 0.35)
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .collect()
    }
    assert len(exact) > 100  # threshold 0.35 is reachable in the fixture

    one = {(r.vec_a, r.vec_b) for r in neardup_pairs(e, 0.35).collect()}
    banded = {(r.vec_a, r.vec_b) for r in neardup_pairs(e, 0.35, n_tables=3).collect()}
    # exact precision (cos is computed on the real vectors)...
    assert one <= exact and banded <= exact
    # ...banding only adds candidates (table 0 is the single table)
    assert one <= banded
    # auto-sizing picked log2(n/64) bits
    assert lsh_bits_for(n) == max(1, math.ceil(math.log2(n / 64)))
    e.unpersist()
