"""robots.txt rule table + frontier filtering (graft; SURVEY.md §4 custom #5).

The reference fetches blindly (no robots handling — scope note). The graft
caches per-host rules in a table ``robots_rules(host, disallow, crawl_delay)``
(one row per disallow prefix; empty-prefix row when nothing is disallowed)
and applies them with a join — rules are a small dimension (#hosts rows),
always broadcast.

Parsing happens once per host in an Arrow-batched pandas UDF over the
fetched robots.txt bodies; matching is a pure Catalyst prefix test, so the
10^10-row frontier never touches Python.

Subset honored (per RFC 9309, User-agent: * group only): ``Disallow``
prefixes and ``Crawl-delay``. Allow-overrides are out of scope for the
fixture and noted as such.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, DoubleType, StringType, StructField, StructType,
)
from pyspark.sql.functions import pandas_udf

_RULES_SCHEMA = StructType(
    [
        StructField("disallow", ArrayType(StringType())),
        StructField("crawl_delay", DoubleType()),
    ]
)


def parse_robots_body(body: str) -> tuple[list[str], float | None]:
    """Parse the ``User-agent: *`` group: disallow prefixes + crawl-delay."""
    disallow: list[str] = []
    delay: float | None = None
    current_agents: list[str] = []
    in_group_header = False
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not in_group_header:
                current_agents = []  # a new group starts
            in_group_header = True
            current_agents.append(value)
            continue
        in_group_header = False
        if "*" not in current_agents:
            continue
        if key == "disallow":
            if value:
                disallow.append(value)
        elif key == "crawl-delay":
            try:
                delay = float(value)
            except ValueError:
                pass
    return disallow, delay


@pandas_udf(_RULES_SCHEMA)
def parse_robots(body: pd.Series) -> pd.DataFrame:
    rows = [parse_robots_body(b if isinstance(b, str) else "") for b in body]
    return pd.DataFrame(rows, columns=["disallow", "crawl_delay"])


def build_rules_table(robots_pages: DataFrame) -> DataFrame:
    """``(host, body)`` -> ``(host, disallow, crawl_delay)`` one row/host."""
    return robots_pages.select(
        "host", parse_robots(F.col("body").cast("string")).alias("r")
    ).select("host", "r.disallow", "r.crawl_delay")


def filter_allowed(frontier: DataFrame, rules: DataFrame) -> DataFrame:
    """Drop frontier rows whose URL path matches a disallow prefix for its
    host. Rules are broadcast; the prefix test is pure Catalyst
    (``exists(disallow, p -> startswith(path, p))``)."""
    path = F.regexp_extract(F.col("url"), r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    joined = frontier.join(F.broadcast(rules), "host", "left")
    blocked = F.when(
        F.col("disallow").isNull(), F.lit(False)
    ).otherwise(
        F.exists(
            F.col("disallow"),
            lambda p: F.when(path == "", F.lit("/")).otherwise(path).startswith(p),
        )
    )
    return joined.where(~blocked).drop("disallow", "crawl_delay")
