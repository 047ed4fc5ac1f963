"""Weighted top-1 company match (SURVEY.md E5; reference
services/api_service.py:46-109).

The reference normalizes the four inputs with the same functions as the
storage side, builds a boosted bool-should ES query (phone 10.0, domain
8.0, facebook profile 5.0, name text-match 2.0, minimum_should_match 1)
and takes the top-1 hit.

Spark form: the inputs table (a handful to a few million rows) is
BROADCAST against ``company_records`` and scored with a pure-Catalyst
expression; top-1 per input via ``row_number`` over
``(score desc, domain asc)`` (the domain tiebreak makes top-1 identity
deterministic — ES BM25 tie order is not reproducible and SURVEY.md §2 E5
pins top-1 *identity* on fixture data as the parity target, not scores).

Name matching: ES analyzes ``searchable_name`` with
standard/lowercase/asciifolding and scores with BM25. We gate on token
overlap (any shared token) and score 2.0 * (overlap fraction of query
tokens) — monotone in overlap like BM25 on these short names, exact
values pinned by fixtures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from web_scraper_spark.functions.names import (
    normalize_company_name,
    searchable_name_tokens,
)
from web_scraper_spark.functions.phones import normalize_phone_e164
from web_scraper_spark.functions.social import normalize_social_profile
from web_scraper_spark.functions.urls import domain_from_url

BOOST_PHONE = 10.0
BOOST_DOMAIN = 8.0
BOOST_FACEBOOK = 5.0
BOOST_NAME = 2.0


def normalize_inputs(inputs: DataFrame) -> DataFrame:
    """(input_id, input_name, input_phone, input_website, input_facebook)
    -> normalized query columns (api_service.py:54-57)."""
    return inputs.select(
        "input_id",
        F.nullif(normalize_company_name(F.col("input_name")), F.lit("")).alias("q_name"),
        normalize_phone_e164(F.col("input_phone")).alias("q_phone"),
        domain_from_url(F.col("input_website")).alias("q_domain"),
        normalize_social_profile(F.col("input_facebook")).alias("q_facebook"),
    )


def match_top1(inputs: DataFrame, company_records: DataFrame) -> DataFrame:
    """Batch top-1 match: one row per input_id with the best-scoring
    record (absent when nothing matches — the API's 404)."""
    q = normalize_inputs(inputs)
    q = q.withColumn("q_tokens", F.split(F.coalesce(F.col("q_name"), F.lit("")), r"\s+"))

    records = company_records.withColumn(
        "name_tokens", searchable_name_tokens(F.col("searchable_name"))
    )

    # cross-score via broadcast of the (small) query table; the records
    # side stays partitioned — no shuffle of the big table
    j = records.crossJoin(F.broadcast(q))

    overlap = F.size(F.array_intersect(F.col("name_tokens"), F.col("q_tokens")))
    q_len = F.size(F.col("q_tokens"))
    name_score = (
        F.when(
            F.col("q_name").isNotNull() & (overlap > 0),
            F.lit(BOOST_NAME) * overlap / q_len,
        ).otherwise(F.lit(0.0))
    )
    score = (
        F.when(
            F.col("q_phone").isNotNull()
            & F.array_contains(F.col("normalized_phone_numbers"), F.col("q_phone")),
            F.lit(BOOST_PHONE),
        ).otherwise(F.lit(0.0))
        + F.when(
            F.col("q_domain").isNotNull() & (F.col("domain") == F.col("q_domain")),
            F.lit(BOOST_DOMAIN),
        ).otherwise(F.lit(0.0))
        + F.when(
            F.col("q_facebook").isNotNull()
            & F.array_contains(F.col("social_media_profiles"), F.col("q_facebook")),
            F.lit(BOOST_FACEBOOK),
        ).otherwise(F.lit(0.0))
        + name_score
    )

    scored = j.withColumn("score", score).where(F.col("score") > 0)
    w = Window.partitionBy("input_id").orderBy(F.desc("score"), F.asc("domain"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "input_id", "score", "domain", "url", "company_name",
            "phone_numbers", "social_media_links", "addresses",
        )
    )
