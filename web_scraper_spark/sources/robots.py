"""robots.txt rule table + frontier filtering (graft; SURVEY.md §4 custom #5).

The reference fetches blindly (no robots handling — scope note). The graft
caches per-host rules in a table ``robots_rules(host, disallow, allow,
crawl_delay)`` and applies them with a join — rules are a small dimension
(#hosts rows), always broadcast.

Parsing happens once per host in an Arrow-batched pandas UDF over the
fetched robots.txt bodies; matching is a pure Catalyst prefix test, so the
10^10-row frontier never touches Python.

Subset honored (per RFC 9309, ``User-agent: *`` group only): ``Disallow``
and ``Allow`` prefixes with longest-match-wins (an Allow at least as
specific as the best Disallow un-blocks the path — ties go to Allow, the
least restrictive rule), plus ``Crawl-delay``. ``%``-escapes and ``*``/
``$`` wildcards in rule paths are out of scope for the fixture and noted
as such.
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
        StructField("allow", ArrayType(StringType())),
        StructField("crawl_delay", DoubleType()),
    ]
)


def parse_robots_body(body: str) -> tuple[list[str], list[str], float | None]:
    """Parse the ``User-agent: *`` group: (disallow prefixes, allow
    prefixes, crawl-delay)."""
    disallow: list[str] = []
    allow: list[str] = []
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
        elif key == "allow":
            if value:
                allow.append(value)
        elif key == "crawl-delay":
            try:
                delay = float(value)
            except ValueError:
                pass
    return disallow, allow, delay


@pandas_udf(_RULES_SCHEMA)
def parse_robots(body: pd.Series) -> pd.DataFrame:
    rows = [parse_robots_body(b if isinstance(b, str) else "") for b in body]
    return pd.DataFrame(rows, columns=["disallow", "allow", "crawl_delay"])


def build_rules_table(robots_pages: DataFrame) -> DataFrame:
    """``(host, body)`` -> ``(host, disallow, allow, crawl_delay)`` one
    row per host."""
    return robots_pages.select(
        "host", parse_robots(F.col("body").cast("string")).alias("r")
    ).select("host", "r.disallow", "r.allow", "r.crawl_delay")


def _longest_match(rules_col: str, path):
    """Length of the longest rule prefix matching ``path``; -1 if none
    (pure Catalyst: filter + transform + array_max)."""
    matched = F.filter(F.col(rules_col), lambda p: path.startswith(p))
    return F.coalesce(
        F.array_max(F.transform(matched, lambda p: F.length(p))), F.lit(-1)
    )


def filter_allowed(frontier: DataFrame, rules: DataFrame) -> DataFrame:
    """Drop frontier rows blocked by their host's rules: longest-match
    wins between Disallow and Allow, ties to Allow (RFC 9309 §2.2.2).
    Rules are broadcast; the match is pure Catalyst."""
    raw_path = F.regexp_extract(
        F.col("url"), r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^?#]*)", 1
    )
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    joined = frontier.join(F.broadcast(rules), "host", "left")
    blocked = F.when(F.col("disallow").isNull(), F.lit(False)).otherwise(
        _longest_match("disallow", path)
        > F.coalesce(
            F.when(
                F.col("allow").isNotNull(), _longest_match("allow", path)
            ),
            F.lit(-1),
        )
    )
    return joined.where(~blocked).drop("disallow", "allow", "crawl_delay")
