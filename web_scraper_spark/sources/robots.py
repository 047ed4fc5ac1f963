"""robots.txt rule table + frontier filtering (graft; SURVEY.md §4 custom #5).

The reference fetches blindly (no robots handling — scope note). The graft
caches per-host rules in a table ``robots_rules(host, disallow, allow,
crawl_delay)`` and applies them with a join — rules are a small dimension
(#hosts rows), always broadcast.

Parsing happens once per host in an Arrow-batched pandas UDF over the
fetched robots.txt bodies; matching is pure Catalyst — a startswith for
plain-prefix rules (the overwhelmingly common case; zero regex machinery
on the hot path) and regexp_like only for rules that actually carry
wildcards — so the 10^10-row frontier never touches Python.

Honored (per RFC 9309): §2.2.1 group selection — groups naming the
crawler's product token (case-insensitive) beat the ``*`` groups, all
matching groups combine (default token ``*`` keeps wildcard-only
behavior) — and ``Disallow``/``Allow`` rules including ``*`` (any
chars) and trailing ``$`` (end anchor) wildcards, longest-match-wins between the two rule sets (an
Allow at least as specific as the best Disallow un-blocks the path —
ties go to Allow, the least restrictive rule; specificity = octet length
of the RULE as written, wildcards and escapes included, the common
implementation of the RFC's "longest match"), plus ``Crawl-delay``.
``%``-escape normalization (RFC 9309 §2.2.2): rules are normalized on
the RULE side — an escaped non-reserved octet (``/caf%C3%A9``) or a raw
non-ASCII char (``/café``) matches the path in either encoding, with
escape hex compared case-insensitively; escaped RESERVED octets
(``%2F``) match only their escape form (a %-encoded slash is not a path
separator). Paths are never rewritten — plain ASCII rules keep exact
startswith semantics on the hot path.

``rule_to_regex`` defines the engine's wildcard semantics (its regexes
avoid Python/Java escape dialect differences by escaping only the shared
metacharacters); the oracle simulator deliberately implements matching
INDEPENDENTLY (a greedy segment scan, no regexes) so a translation bug
here cannot hide behind shared code — parity tests compare the two.
Specificity is measured in OCTETS (utf-8 length) per the RFC.
"""

from __future__ import annotations

import re as _re

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
        StructField("disallow_re", ArrayType(StringType())),
        StructField("allow", ArrayType(StringType())),
        StructField("allow_re", ArrayType(StringType())),
        StructField("crawl_delay", DoubleType()),
        StructField("sitemaps", ArrayType(StringType())),
    ]
)

# metacharacters escaped identically by Python's re and Java's Pattern —
# escaping anything else (re.escape's behavior) risks Java rejecting the
# pattern (e.g. an escaped space)
_REGEX_META = set(".^$+?()[]{}|\\")

# reserved URI characters (RFC 3986 gen-delims + sub-delims, plus '%'):
# an ESCAPED reserved octet is semantically distinct from its literal
# form (%2F is not a path separator), so rules keep it escape-form-only;
# every other escaped char — and every raw non-ASCII char — matches
# either encoding (RFC 9309 §2.2.2 percent-encoding comparison)
_RESERVED = set("/?#[]@!$&'()*+,;=:%")
_HEX = set("0123456789abcdefABCDEF")


def _pct(ch: str) -> str:
    return "".join(f"%{b:02X}" for b in ch.encode("utf-8"))


def _rule_tokens(piece: str) -> list[tuple[str | None, str | None]]:
    """Wildcard-free rule piece -> (literal_char, escape_form) tokens.

    Raw ASCII chars: (ch, None) — literal-only (a plain 'a' in a rule
    does NOT match '%61' in a path; matching is rule-side-normalizing
    only, so plain ASCII prefixes keep exact startswith semantics).
    Raw non-ASCII chars: (ch, pct) — either encoding matches.
    %XX escapes: maximal runs decode as UTF-8 (per-byte fallback for
    invalid sequences); reserved octets stay (None, pct) escape-only,
    anything else becomes (ch, pct). Invalid escapes ('%' without two
    hex digits) are a literal '%'."""
    toks: list[tuple[str | None, str | None]] = []
    i = 0
    n = len(piece)
    while i < n:
        c = piece[i]
        if c == "%" and i + 3 <= n and piece[i + 1] in _HEX and piece[i + 2] in _HEX:
            run = bytearray()
            while (
                i + 3 <= n
                and piece[i] == "%"
                and piece[i + 1] in _HEX
                and piece[i + 2] in _HEX
            ):
                run.append(int(piece[i + 1 : i + 3], 16))
                i += 3
            try:
                decoded = [(ch, _pct(ch)) for ch in run.decode("utf-8")]
            except UnicodeDecodeError:
                decoded = [
                    (chr(b) if b < 128 else None, "%%%02X" % b) for b in run
                ]
            for ch, pct in decoded:
                if ch is None or ch in _RESERVED:
                    toks.append((None, pct))
                else:
                    toks.append((ch, pct))
        else:
            toks.append((c, None) if ord(c) < 128 else (c, _pct(c)))
            i += 1
    return toks


def _lit_re(ch: str) -> str:
    return "\\" + ch if ch in _REGEX_META else ch


def rule_to_regex(pattern: str) -> str:
    """RFC 9309 §2.2.3 rule -> regex: ``*`` matches any chars, a trailing
    ``$`` anchors at end; everything else is literal up to percent-
    encoding equivalence (§2.2.2): escaped non-reserved octets and raw
    non-ASCII chars match either encoding (escape side hex-case-
    insensitive via a scoped (?i:) group — valid in both Python re and
    Java Pattern); escaped RESERVED octets match only their escape form
    (%2F is not '/')."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    parts = []
    for piece in body.split("*"):
        out = []
        for ch, pct in _rule_tokens(piece):
            if pct is None:
                out.append(_lit_re(ch))
            elif ch is None:
                out.append(f"(?i:{pct})")
            else:
                out.append(f"(?:{_lit_re(ch)}|(?i:{pct}))")
        parts.append("".join(out))
    return "^" + ".*".join(parts) + ("$" if anchored else "")


def rule_matches(pattern: str, path: str) -> bool:
    """Pure-Python rule match — the oracle simulator's mirror of the
    engine's regexp_like over rule_to_regex output."""
    return _re.search(rule_to_regex(pattern), path) is not None


def parse_robots_groups(
    body: str,
) -> list[tuple[list[str], list[str], list[str], float | None]]:
    """Parse every group: (agent product tokens lowercased, disallow
    prefixes, allow prefixes, crawl-delay). Shared by engine and oracle —
    the independence doctrine applies to MATCHING, not line parsing."""
    groups: list[tuple[list[str], list[str], list[str], float | None]] = []
    agents: list[str] = []
    disallow: list[str] = []
    allow: list[str] = []
    delay: float | None = None
    in_group_header = False
    started = False

    def flush():
        nonlocal agents, disallow, allow, delay, started
        if started:
            groups.append((agents, disallow, allow, delay))
        agents, disallow, allow, delay = [], [], [], None
        started = False

    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not in_group_header:
                flush()  # a new group starts
            in_group_header = True
            started = True
            agents.append(value.lower())
            continue
        in_group_header = False
        if not started:
            continue  # rules before any user-agent line: no group (RFC)
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
    flush()
    return groups


def select_rules(
    groups: list[tuple[list[str], list[str], list[str], float | None]],
    agent_token: str = "*",
) -> tuple[list[str], list[str], float | None]:
    """RFC 9309 §2.2.1 group selection: groups naming our product token
    (case-insensitive exact match) win; only when NONE does do the ``*``
    groups apply. All matching groups combine (rules concatenate; the
    first non-null crawl-delay wins). ``agent_token='*'`` reproduces the
    legacy wildcard-only behavior."""
    token = (agent_token or "*").lower()
    tiers = [token] if token != "*" else []
    tiers.append("*")
    for want in tiers:
        disallow: list[str] = []
        allow: list[str] = []
        delay: float | None = None
        hit = False
        for agents, dis, alw, dly in groups:
            if want in agents:
                hit = True
                disallow.extend(dis)
                allow.extend(alw)
                if delay is None:
                    delay = dly
        if hit:
            return disallow, allow, delay
    return [], [], None


def parse_robots_body(
    body: str, agent_token: str = "*"
) -> tuple[list[str], list[str], float | None]:
    """Parse + select: (disallow prefixes, allow prefixes, crawl-delay)
    for ``agent_token`` per RFC 9309 §2.2.1 (default: the ``*`` group)."""
    return select_rules(parse_robots_groups(body), agent_token)


def parse_sitemaps(body: str) -> list[str]:
    """``Sitemap:`` records (RFC 9309 §2.2.4 "other records") — global,
    NOT part of any user-agent group; collected wherever they appear."""
    out: list[str] = []
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        key, _, value = line.partition(":")
        if key.strip().lower() == "sitemap" and value.strip():
            out.append(value.strip())
    return out


def _needs_regex(p: str) -> bool:
    """Wildcards, trailing anchor, %-escapes, or non-ASCII chars all force
    the regex path; everything else (the overwhelmingly common case) is a
    plain prefix matched with startswith."""
    return (
        "*" in p
        or p.endswith("$")
        or "%" in p
        or any(ord(c) > 127 for c in p)
    )


def _regexes_for(rules: list[str]) -> list[str | None]:
    """Regex form per rule — or None for plain-prefix rules (no wildcard
    chars, no escapes), which the filter matches with a cheap startswith
    instead of a per-row Pattern compile (almost all real robots rules
    are plain prefixes; RLike only caches FOLDABLE patterns, so a regex
    from an array element recompiles per row x rule — review r2)."""
    return [rule_to_regex(p) if _needs_regex(p) else None for p in rules]


def _parse_robots_udf(agent_token: str):
    @pandas_udf(_RULES_SCHEMA)
    def parse_robots(body: pd.Series) -> pd.DataFrame:
        rows = []
        for b in body:
            text = b if isinstance(b, str) else ""
            disallow, allow, delay = parse_robots_body(text, agent_token)
            rows.append(
                (disallow, _regexes_for(disallow), allow, _regexes_for(allow),
                 delay, parse_sitemaps(text))
            )
        return pd.DataFrame(
            rows,
            columns=["disallow", "disallow_re", "allow", "allow_re",
                     "crawl_delay", "sitemaps"],
        )

    return parse_robots


def build_rules_table(
    robots_pages: DataFrame, agent_token: str = "*"
) -> DataFrame:
    """``(host, body)`` -> one row per host with raw rules (for
    specificity lengths) and their precompiled regex forms (for
    matching), selected for ``agent_token`` per RFC 9309 §2.2.1
    (bot-specific groups beat ``*`` groups; default keeps the wildcard
    behavior)."""
    return robots_pages.select(
        "host", _parse_robots_udf(agent_token)(F.col("body").cast("string")).alias("r")
    ).select(
        "host", "r.disallow", "r.disallow_re", "r.allow", "r.allow_re",
        "r.crawl_delay", "r.sitemaps",
    )


RULES_COLS = [
    "disallow", "disallow_re", "allow", "allow_re", "crawl_delay", "sitemaps",
]


def discovered_sitemaps(rules: DataFrame) -> DataFrame:
    """(host, sitemap_url) rows from the rules table — frontier
    candidates for a sitemap-ingest pass (graft; the reference has no
    sitemap handling)."""
    return rules.select(
        "host", F.explode("sitemaps").alias("sitemap_url")
    ).dropDuplicates(["host", "sitemap_url"])


def _longest_match(rules_col: str, re_col: str, path):
    """Octet length of the longest rule matching ``path``; -1 if none.
    Plain-prefix rules (null regex) use startswith — no regex machinery
    on the hot path; wildcard rules fall back to regexp_like (pure
    Catalyst either way: arrays_zip + filter + array_max)."""
    zipped = F.arrays_zip(F.col(rules_col), F.col(re_col))
    matched = F.filter(
        zipped,
        lambda s: F.when(s[re_col].isNull(), path.startswith(s[rules_col]))
        .otherwise(F.regexp_like(path, s[re_col])),
    )
    return F.coalesce(
        F.array_max(F.transform(matched, lambda s: F.octet_length(s[rules_col]))),
        F.lit(-1),
    )


def filter_allowed(
    frontier: DataFrame, rules: DataFrame, keep_delay: bool = False
) -> DataFrame:
    """Drop frontier rows blocked by their host's rules: longest-match
    wins between Disallow and Allow, ties to Allow (RFC 9309 §2.2.2),
    ``*``/``$`` wildcards honored, matched against PATH + QUERY (the
    RFC's URI portion after the authority — query-string rules like
    ``Disallow: /*?session=`` must work). Rules are broadcast; the match
    is pure Catalyst.

    ``keep_delay=True`` keeps the host's ``crawl_delay`` as a frontier
    column so the live fetcher can pace per-partition from the column —
    no driver-side rules collect (VERDICT r2 scale-killer)."""
    raw_path = F.regexp_extract(
        F.col("url"), r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*([^#]*)", 1
    )
    path = F.when(raw_path == "", F.lit("/")).otherwise(raw_path)
    joined = frontier.join(F.broadcast(rules), "host", "left")
    blocked = F.when(F.col("disallow").isNull(), F.lit(False)).otherwise(
        _longest_match("disallow", "disallow_re", path)
        > F.coalesce(
            F.when(
                F.col("allow").isNotNull(),
                _longest_match("allow", "allow_re", path),
            ),
            F.lit(-1),
        )
    )
    drop_cols = [c for c in RULES_COLS if not (keep_delay and c == "crawl_delay")]
    return joined.where(~blocked).drop(*drop_cols)
