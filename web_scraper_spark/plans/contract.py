"""Driver-contract queries, part 1: reference-parity operators
(SURVEY.md §2) expressed over the driver's TPC-H-ish tables, each with a
DuckDB oracle. Conventions:

- every computed column is aliased identically in Spark and SQL,
- doubles rounded to 4 and cast to double on both sides,
- arrays serialized ``array_join(array_sort(...), '|')`` / DuckDB
  ``array_to_string(list_sort(...), '|')`` so value hashes are stable,
- timestamps emitted as formatted strings.

The queries run the REAL engine expressions (functions/*.py) wherever the
operator has one — the oracle then cross-validates the engine's Catalyst
(or pandas-UDF) implementation against an independent SQL formulation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from web_scraper_spark.functions.names import best_name, normalize_company_name
from web_scraper_spark.functions.phones import clean_phone_number, normalize_phone_e164
from web_scraper_spark.functions.social import normalize_social_profile
from web_scraper_spark.functions.urls import domain_from_url, prepare_url


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _floor_parallelism(df: DataFrame) -> DataFrame:
    """Scan-parallelism floor for compute-heavy subtrees (optimization
    guide §6: ``spark.sql.files.minPartitionNum`` semantics, applied
    adaptively). Small-but-dense tables (a few MB of compressed text or
    packed vectors) split into 1-2 byte-sized scan partitions, and any
    per-row-heavy map work downstream (per-gram md5, 64-dim distance
    math) then runs on 1-2 of the available cores. If the scan already
    meets the session's parallelism — always true at cluster scale, where
    inputs carry thousands of splits — this is a no-op and nothing extra
    is shuffled. Values are unchanged: only partitioning moves."""
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    # below ~2 MB of input the repartition's fixed cost (a shuffle plus
    # n-task stages) exceeds what single-digit-MB compute saves — leave
    # tiny inputs alone (measured: flooring the sf0.1 minhash shingle
    # stage cost +0.3 s; flooring the 4 MB bench corpus saved 9 s)
    try:
        import os

        bytes_in = sum(
            os.path.getsize(f[len("file:"):] if f.startswith("file:") else f)
            for f in df.inputFiles()
        )
    except Exception:  # non-file-backed plan: assume big enough
        bytes_in = None
    if bytes_in is not None and bytes_in < (2 << 20):
        return df
    return df.repartition(n)


QUERIES: dict = {}
ORACLES: dict[str, str] = {}

# Money convention (CLAUDE.md invariant, VERDICT r4 item 1): SUM money in
# DECIMAL, never double.  round(sum(DOUBLE), 2) is summation-order-dependent
# — at sf0.01, 47 of q7's 4,188 group sums land exactly on the 2-decimal .5
# boundary, so Spark's partition-order partial sums and DuckDB's row-order
# sums round to different cents.  Every money column in the testdata is
# 2-decimal-quantized (verified), so DECIMAL(18,4) holds each value exactly
# and any price*(1-discount) product has <= 4 fractional digits; the decimal
# sum is then exact and identical on both engines, round happens in exact
# decimal arithmetic, and the final cast to double is lossless.
_DEC = "decimal(18,4)"


def _dec(col) -> Column:
    """Exact-decimal view of a 2-decimal-quantized money column."""
    return (col if not isinstance(col, str) else F.col(col)).cast(_DEC)


def _money(sum_col, nd: int = 2) -> Column:
    """round(exact-decimal aggregate, nd) emitted as DOUBLE (driver schema)."""
    return F.round(sum_col, nd).cast("double")


def _disc_rev() -> Column:
    """l_extendedprice * (1 - l_discount) in exact decimal (scale 8)."""
    return _dec("l_extendedprice") * (F.lit(1).cast(_DEC) - _dec("l_discount"))


# DuckDB twins of the same convention.
SQL_DEC = "CAST({} AS DECIMAL(18,4))"
SQL_DISC_REV = (
    "CAST({p}l_extendedprice AS DECIMAL(18,4))"
    " * (1 - CAST({p}l_discount AS DECIMAL(18,4)))"
)


def register(name: str, sql: str | None = None):
    def wrap(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return wrap


# ---------------------------------------------------------------------------
# A1/B4 — seed scan with blank-row skip (run_url_producer.py:26-37)
@register(
    "a1_seed_scan_filter",
    """
    SELECT c_custkey, trim(c_name) AS name
    FROM customer
    WHERE c_name IS NOT NULL AND trim(c_name) <> '' AND c_acctbal IS NOT NULL
    """,
)
def a1_seed_scan_filter(spark, sf_dir):
    return (
        _t(spark, sf_dir, "customer")
        .where(
            F.col("c_name").isNotNull()
            & (F.trim(F.col("c_name")) != "")
            & F.col("c_acctbal").isNotNull()
        )
        .select("c_custkey", F.trim(F.col("c_name")).alias("name"))
    )


# B1 — prepare_url (normalization_utils.py:103-110)
@register(
    "b1_prepare_url",
    """
    SELECT c_custkey,
           CASE WHEN trim(u) = '' THEN ''
                WHEN regexp_matches(trim(u), '^[a-zA-Z]+://') THEN trim(u)
                ELSE 'http://' || trim(u) END AS prepared
    FROM (SELECT c_custkey,
                 CASE WHEN c_custkey % 3 = 0
                      THEN 'https://host-' || c_custkey || '.test'
                      ELSE '  host-' || c_custkey || '.test ' END AS u
          FROM customer)
    """,
)
def b1_prepare_url(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    u = F.when(
        F.col("c_custkey") % 3 == 0,
        F.concat(F.lit("https://host-"), F.col("c_custkey"), F.lit(".test")),
    ).otherwise(F.concat(F.lit("  host-"), F.col("c_custkey"), F.lit(".test ")))
    return c.select("c_custkey", prepare_url(u).alias("prepared"))


# B2 — domain extraction + generic-domain denylist (normalization_utils.py:55-81)
@register(
    "b2_domain_denylist",
    """
    SELECT c_custkey,
           CASE WHEN dom = '' OR dom IN
                     ('google.com','facebook.com','twitter.com','linkedin.com','youtube.com')
                THEN NULL ELSE lower(dom) END AS domain
    FROM (SELECT c_custkey,
                 regexp_replace(regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1),
                                '^www\\.', '') AS dom
          FROM (SELECT c_custkey,
                       CASE WHEN c_custkey % 50 = 0 THEN 'http://www.google.com/x'
                            WHEN c_custkey % 50 = 1 THEN 'http://WWW.Example.COM/y'
                            ELSE 'http://www.host-' || c_custkey || '.test/p' END AS u
                FROM customer))
    """,
)
def b2_domain_denylist(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    u = (
        F.when(F.col("c_custkey") % 50 == 0, F.lit("http://www.google.com/x"))
        .when(F.col("c_custkey") % 50 == 1, F.lit("http://WWW.Example.COM/y"))
        .otherwise(
            F.concat(F.lit("http://www.host-"), F.col("c_custkey"), F.lit(".test/p"))
        )
    )
    return c.select("c_custkey", domain_from_url(u).alias("domain"))


# B7 — best-name precedence (company_name_data_producer.py:14-27)
@register(
    "b7_best_name",
    """
    SELECT p_partkey,
           COALESCE(NULLIF(trim(legal), ''), NULLIF(trim(comm), ''),
                    NULLIF(trim(string_split(alln, '|')[1]), '')) AS best
    FROM (SELECT p_partkey,
                 CASE WHEN p_partkey % 3 = 0 THEN p_name || ' Inc' ELSE '' END AS legal,
                 CASE WHEN p_partkey % 2 = 0 THEN p_name ELSE '  ' END AS comm,
                 p_name || '|' || p_brand AS alln
          FROM part)
    """,
)
def b7_best_name(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    legal = F.when(
        F.col("p_partkey") % 3 == 0, F.concat(F.col("p_name"), F.lit(" Inc"))
    ).otherwise(F.lit(""))
    comm = F.when(F.col("p_partkey") % 2 == 0, F.col("p_name")).otherwise(F.lit("  "))
    alln = F.concat(F.col("p_name"), F.lit("|"), F.col("p_brand"))
    return p.select("p_partkey", best_name(legal, comm, alln).alias("best"))


# D3 — company-name normalization (normalization_utils.py:83-101)
@register(
    "d3_normalize_name",
    """
    SELECT p_partkey,
           trim(regexp_replace(
                regexp_replace(
                  regexp_replace(
                    regexp_replace(lower('The ' || p_name || ', Inc.'),
                                   '\\binc\\b\\.?', '', 'g'),
                    '\\bcompany\\b\\.?', '', 'g'),
                  '[^a-z0-9_\\s]', '', 'g'),
                '\\s+', ' ', 'g')) AS norm
    FROM part
    """,
)
def d3_normalize_name(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    raw = F.concat(F.lit("The "), F.col("p_name"), F.lit(", Inc."))
    return p.select("p_partkey", normalize_company_name(raw).alias("norm"))


# B8 — phone cleaning (html_data_extractor.py:44-46)
@register(
    "b8_clean_phone",
    """
    SELECT l_orderkey, l_linenumber,
           regexp_replace('+1 (' || (200 + l_orderkey % 700) || ') 555-' ||
                          lpad(CAST(l_orderkey % 10000 AS VARCHAR), 4, '0'),
                          '[\\s().-]', '', 'g') AS cleaned
    FROM lineitem WHERE l_linenumber = 1
    """,
)
def b8_clean_phone(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_linenumber") == 1)
    phone = F.concat(
        F.lit("+1 ("),
        (F.lit(200) + F.col("l_orderkey") % 700).cast("string"),
        F.lit(") 555-"),
        F.lpad((F.col("l_orderkey") % 10000).cast("string"), 4, "0"),
    )
    return li.select(
        "l_orderkey", "l_linenumber", clean_phone_number(phone).alias("cleaned")
    )


# D2 — E.164 normalization: engine pandas UDF vs independent SQL NANP rule
@register(
    "d2_phone_e164",
    """
    SELECT o_orderkey,
           CASE WHEN regexp_matches(nanp, '^[2-9][0-9]{2}[2-9][0-9]{6}$')
                THEN '+1' || nanp ELSE NULL END AS e164
    FROM (SELECT o_orderkey,
                 CASE WHEN length(digits) = 11 AND digits LIKE '1%'
                      THEN substr(digits, 2) ELSE digits END AS nanp
          FROM (SELECT o_orderkey, regexp_replace(raw, '[^0-9]', '', 'g') AS digits
                FROM (SELECT o_orderkey,
                       CASE WHEN o_orderkey % 4 = 0
                            THEN '(' || (200 + o_orderkey % 700) || ') 555-' ||
                                 lpad(CAST(o_orderkey % 10000 AS VARCHAR), 4, '0')
                            WHEN o_orderkey % 4 = 1
                            THEN '1-' || (200 + o_orderkey % 700) || '-555-' ||
                                 lpad(CAST(o_orderkey % 10000 AS VARCHAR), 4, '0')
                            WHEN o_orderkey % 4 = 2
                            THEN '555-' || lpad(CAST(o_orderkey % 10000 AS VARCHAR), 4, '0')
                            ELSE '(1' || (o_orderkey % 80) || ') 555-' ||
                                 lpad(CAST(o_orderkey % 10000 AS VARCHAR), 4, '0')
                            END AS raw
                FROM orders)))
    """,
)
def d2_phone_e164(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    area = (F.lit(200) + F.col("o_orderkey") % 700).cast("string")
    suffix = F.lpad((F.col("o_orderkey") % 10000).cast("string"), 4, "0")
    raw = (
        F.when(F.col("o_orderkey") % 4 == 0,
               F.concat(F.lit("("), area, F.lit(") 555-"), suffix))
        .when(F.col("o_orderkey") % 4 == 1,
              F.concat(F.lit("1-"), area, F.lit("-555-"), suffix))
        .when(F.col("o_orderkey") % 4 == 2, F.concat(F.lit("555-"), suffix))
        .otherwise(
            F.concat(F.lit("(1"), (F.col("o_orderkey") % 80).cast("string"),
                     F.lit(") 555-"), suffix)
        )
    )
    return o.select("o_orderkey", normalize_phone_e164(raw).alias("e164"))


# D1 — social-profile normalization cascade (normalization_utils.py:10-34)
@register(
    "d1_social_profile",
    """
    SELECT s_suppkey,
           CASE
             WHEN u LIKE '%twitter.com/%'
             THEN 'twitter:' || substr(regexp_extract(u, 'twitter\\.com/([a-zA-Z0-9_]{1,15})', 1), 1, 15)
             WHEN u LIKE '%linkedin.com/company/%'
             THEN 'linkedin:' || lower(trim(regexp_extract(u, 'linkedin\\.com/company/([a-zA-Z0-9._-]+/?)', 1), '/'))
             WHEN u LIKE '%instagram.com/%'
             THEN 'instagram:' || lower(trim(regexp_extract(u, 'instagram\\.com/([a-zA-Z0-9._]+/?)', 1), '/'))
             ELSE NULL END AS profile
    FROM (SELECT s_suppkey,
                 CASE WHEN s_suppkey % 3 = 0
                      THEN 'https://twitter.com/supp_' || s_suppkey
                      WHEN s_suppkey % 3 = 1
                      THEN 'https://www.linkedin.com/company/supp-' || s_suppkey || '/'
                      ELSE 'https://instagram.com/supp.' || s_suppkey || '/' END AS u
          FROM supplier)
    """,
)
def d1_social_profile(spark, sf_dir):
    s = _t(spark, sf_dir, "supplier")
    u = (
        F.when(F.col("s_suppkey") % 3 == 0,
               F.concat(F.lit("https://twitter.com/supp_"), F.col("s_suppkey")))
        .when(F.col("s_suppkey") % 3 == 1,
              F.concat(F.lit("https://www.linkedin.com/company/supp-"),
                       F.col("s_suppkey"), F.lit("/")))
        .otherwise(F.concat(F.lit("https://instagram.com/supp."),
                            F.col("s_suppkey"), F.lit("/")))
    )
    return s.select("s_suppkey", normalize_social_profile(u).alias("profile"))


# F1 — global seed dedup, first occurrence wins (run_url_producer.py:24-43)
@register(
    "f1_seed_dedup",
    """
    SELECT url, min(c_custkey) AS first_key
    FROM (SELECT c_custkey, 'http://host-' || (c_custkey % 40) || '.test' AS url
          FROM customer)
    GROUP BY url
    """,
)
def f1_seed_dedup(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.concat(F.lit("http://host-"), (F.col("c_custkey") % 40), F.lit(".test")).alias("url"),
        )
        .groupBy("url")
        .agg(F.min("c_custkey").alias("first_key"))
    )


# F1-scalable — URL-seen anti-join (the exact-mode seen set's core)
@register(
    "f1b_seen_antijoin",
    """
    SELECT o_orderkey, o_custkey FROM orders o
    WHERE NOT EXISTS (SELECT 1 FROM events e
                      WHERE e.user_id = o.o_custkey AND e.event_type = 'purchase')
    """,
)
def f1b_seen_antijoin(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    seen = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("o_custkey"))
    )
    return o.join(seen, "o_custkey", "left_anti").select("o_orderkey", "o_custkey")


# E1/E3/E4 — keyed merge: list union-dedup + scalar last-writer
@register(
    "e1_merge_records",
    """
    SELECT o_custkey AS domain_key,
           array_to_string(list_sort(list_distinct(list(o_orderpriority))), '|') AS priorities,
           round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2)::DOUBLE AS total,
           max_by(o_orderstatus, epoch(o_orderdate) * 10000000 + o_orderkey) AS last_status
    FROM orders GROUP BY o_custkey
    """,
)
def e1_merge_records(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_custkey").alias("domain_key")).agg(
        F.array_join(
            F.array_sort(F.array_distinct(F.collect_list("o_orderpriority"))), "|"
        ).alias("priorities"),
        _money(F.sum(_dec("o_totalprice"))).alias("total"),
        F.max_by(
            "o_orderstatus",
            F.unix_timestamp("o_orderdate") * F.lit(10000000) + F.col("o_orderkey"),
        ).alias("last_status"),
    )


# E5 — weighted top-1 per group (api_service.py:46-109 shape)
@register(
    "e5_top1_window",
    """
    SELECT c_nationkey, c_custkey, c_name, score
    FROM (SELECT c_nationkey, c_custkey, c_name,
                 10000.0 * CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END +
                 c_acctbal AS score,
                 row_number() OVER (PARTITION BY c_nationkey
                                    ORDER BY (10000.0 * CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END +
                                              c_acctbal) DESC,
                                             c_custkey ASC) AS rn
          FROM customer)
    WHERE rn = 1 AND score > 0
    """,
)
def e5_top1_window(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    # 10000*flag + acctbal is exact in binary for both engines (no
    # division), so no rounding-boundary flakiness in the value hash
    score = (
        F.lit(10000.0) * F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0)
        + F.col("c_acctbal")
    )
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("score"), F.asc("c_custkey"))
    return (
        c.withColumn("score", score)
        .withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("score") > 0))
        .select("c_nationkey", "c_custkey", "c_name", "score")
    )


# E6 — same-scope semi-join (html_data_extractor.py:138 at frontier level)
@register(
    "e6_semi_join",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderstatus = 'F')
    """,
)
def e6_semi_join(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    return c.join(
        o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_semi"
    ).select("c_custkey", "c_name")


# B5 — content-type routing (web_fetcher.py:36-39 + graft route)
@register(
    "b5_content_route",
    """
    SELECT route, count(*) AS n FROM (
      SELECT CASE WHEN event_type IN ('view','click') THEN 'html'
                  WHEN event_type = 'purchase' THEN 'image'
                  ELSE 'drop' END AS route
      FROM events) GROUP BY route
    """,
)
def b5_content_route(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    route = (
        F.when(F.col("event_type").isin("view", "click"), "html")
        .when(F.col("event_type") == "purchase", "image")
        .otherwise("drop")
    )
    return e.select(route.alias("route")).groupBy("route").agg(F.count("*").alias("n"))


# G1 — coverage counters (pipeline_metrics_tracker.py:21-43,64-67)
@register(
    "g1_coverage",
    """
    SELECT count(DISTINCT CASE WHEN event_type = 'view' THEN user_id END) AS produced,
           count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS fetched,
           round(100.0 * count(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) /
                 greatest(count(DISTINCT CASE WHEN event_type = 'view' THEN user_id END), 1), 2)::DOUBLE AS coverage_pct
    FROM events
    """,
)
def g1_coverage(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    produced = F.countDistinct(
        F.when(F.col("event_type") == "view", F.col("user_id"))
    )
    fetched = F.countDistinct(
        F.when(F.col("event_type") == "purchase", F.col("user_id"))
    )
    return e.agg(
        produced.alias("produced"),
        fetched.alias("fetched"),
        F.round(
            F.lit(100.0) * fetched / F.greatest(produced, F.lit(1)), 2
        ).alias("coverage_pct"),
    )


# G2 — two-level fill rates (pipeline_metrics_tracker.py:45-96)
@register(
    "g2_fill_rates",
    """
    SELECT round(100.0 * sum(has_purchase) / count(*), 2)::DOUBLE AS purchase_fill_pct,
           round(100.0 * sum(has_error) / count(*), 2)::DOUBLE AS error_fill_pct
    FROM (SELECT user_id,
                 max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase,
                 max(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS has_error
          FROM events GROUP BY user_id)
    """,
)
def g2_fill_rates(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("has_purchase"),
        F.max(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("has_error"),
    )
    return per_user.agg(
        F.round(F.lit(100.0) * F.sum("has_purchase") / F.count("*"), 2).alias("purchase_fill_pct"),
        F.round(F.lit(100.0) * F.sum("has_error") / F.count("*"), 2).alias("error_fill_pct"),
    )


# G4 — match-rate report (test_api_script.py:24-84)
@register(
    "g4_match_rate",
    """
    SELECT event_type, count(*) AS n,
           round(100.0 * count(*) / (SELECT count(*) FROM events), 2)::DOUBLE AS pct
    FROM events GROUP BY event_type
    """,
)
def g4_match_rate(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    # the denominator comes from a global window over the ALREADY-grouped
    # result (a handful of event_type rows) — one job, one scan, instead
    # of a driver-side count() that re-reads the table
    grouped = e.groupBy("event_type").agg(F.count("*").alias("n"))
    total = F.sum("n").over(Window.partitionBy())
    return grouped.select(
        "event_type",
        "n",
        F.round(F.lit(100.0) * F.col("n") / total, 2).alias("pct"),
    )


# H2 — recursive fan-out: explode discovered links (extractor_service.py:69-76)
@register(
    "h2_fanout_explode",
    """
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split(trim(text), ' ')[1:5]) AS token FROM documents)
    GROUP BY token
    """,
)
def h2_fanout_explode(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = F.slice(F.split(F.trim(F.col("text")), " "), 1, 5)
    return (
        d.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )


# H3 — politeness round assignment (the graft scheduler's window form)
@register(
    "h3_politeness_rounds",
    """
    SELECT round_no, count(*) AS n
    FROM (SELECT CAST(floor((row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) / 5) AS BIGINT) AS round_no
          FROM events)
    GROUP BY round_no
    """,
)
def h3_politeness_rounds(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn(
            "round_no",
            F.floor((F.row_number().over(w) - 1) / 5).cast("long"),
        )
        .groupBy("round_no")
        .agg(F.count("*").alias("n"))
    )


# H4 — salted-key repartitioning histogram (hot-key splitting)
@register(
    "h4_salted_key",
    """
    SELECT host_bucket, salt, count(*) AS n
    FROM (SELECT o_custkey % 10 AS host_bucket, o_orderkey % 8 AS salt FROM orders)
    GROUP BY host_bucket, salt
    """,
)
def h4_salted_key(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            (F.col("o_custkey") % 10).alias("host_bucket"),
            (F.col("o_orderkey") % 8).alias("salt"),
        )
        .groupBy("host_bucket", "salt")
        .agg(F.count("*").alias("n"))
    )


# G3 — per-window report (analytics_service.py:41-47 -> tumbling windows)
@register(
    "g3_window_report",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_bucket,
           count(*) AS n, round(sum(CAST(value AS DECIMAL(18,4))), 2)::DOUBLE AS total_value
    FROM events GROUP BY 1
    """,
)
def g3_window_report(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:00").alias(
                "hour_bucket"
            )
        )
        .agg(F.count("*").alias("n"), _money(F.sum(_dec("value"))).alias("total_value"))
    )


# B3 — URL canonicalization as a Catalyst expression (the frontier's
# canonicalizer; html_data_extractor.py:37-42 for absolute URLs)
@register(
    "b3_canonicalize_url",
    """
    SELECT o_orderkey,
           regexp_replace(
             CASE WHEN lower(regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))
                       IN ('http','https')
                  THEN lower(regexp_extract(u, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1))
                  ELSE 'http' END
             || '://'
             || regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)
             || regexp_extract(u, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1),
             '/+$', '') AS canon
    FROM (SELECT o_orderkey,
                 CASE WHEN o_orderkey % 3 = 0
                      THEN 'HTTPS://Host-' || o_orderkey || '.test/a/b/?q=1#f'
                      WHEN o_orderkey % 3 = 1
                      THEN 'ftp://host-' || o_orderkey || '.test/x/'
                      ELSE 'http://host-' || o_orderkey || '.test' END AS u
          FROM orders WHERE o_orderkey % 7 = 0)
    """,
)
def b3_canonicalize_url(spark, sf_dir):
    from web_scraper_spark.functions.urls import canonicalize_url

    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 7 == 0)
    u = (
        F.when(F.col("o_orderkey") % 3 == 0,
               F.concat(F.lit("HTTPS://Host-"), F.col("o_orderkey"), F.lit(".test/a/b/?q=1#f")))
        .when(F.col("o_orderkey") % 3 == 1,
              F.concat(F.lit("ftp://host-"), F.col("o_orderkey"), F.lit(".test/x/")))
        .otherwise(F.concat(F.lit("http://host-"), F.col("o_orderkey"), F.lit(".test")))
    )
    return o.select("o_orderkey", canonicalize_url(u).alias("canon"))


# F2/E3 — per-page set dedup + cross-record union-dedup preserving
# first-seen order (storage_service.py:55-70 list semantics)
@register(
    "e3_list_union_dedup",
    """
    SELECT o_custkey,
           string_agg(pair, '|' ORDER BY o_orderdate, o_orderkey) AS merged_raw,
           array_to_string(list_sort(list_distinct(list(pair))), '|') AS merged_dedup
    FROM (SELECT o_custkey, o_orderdate, o_orderkey,
                 o_orderpriority || '~' || o_orderstatus AS pair
          FROM orders)
    GROUP BY o_custkey
    """,
)
def e3_list_union_dedup(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    pair = F.concat_ws("~", "o_orderpriority", "o_orderstatus")
    combined = (
        o.select("o_custkey", "o_orderdate", "o_orderkey", pair.alias("pair"))
        .groupBy("o_custkey")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("o_orderdate", "o_orderkey", "pair")
                        )
                    ),
                    lambda s: s["pair"],
                ),
                "|",
            ).alias("merged_raw"),
            F.array_join(
                F.array_sort(F.array_distinct(F.collect_list("pair"))), "|"
            ).alias("merged_dedup"),
        )
    )
    return combined


# H5 — idempotent keyed upsert: applying the same batch twice equals once
# (the at-least-once safety argument, storage_service.py:104-112)
@register(
    "h5_idempotent_upsert",
    """
    WITH batch AS (
      SELECT o_custkey AS k, list_distinct(list(o_orderpriority)) AS vs
      FROM orders GROUP BY o_custkey
    ),
    twice AS (SELECT * FROM batch UNION ALL SELECT * FROM batch)
    SELECT k,
           array_to_string(list_sort(list_distinct(flatten(list(vs)))), '|') AS merged
    FROM twice GROUP BY k
    """,
)
def h5_idempotent_upsert(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    batch = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.array_distinct(F.collect_list("o_orderpriority")).alias("vs")
    )
    twice = batch.unionByName(batch)
    return twice.groupBy("k").agg(
        F.array_join(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("vs")))), "|"
        ).alias("merged")
    )
