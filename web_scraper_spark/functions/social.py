"""Social-profile normalization — pure Catalyst regexp cascade.

Mirrors ``normalize_social_media_profile``
(reference src/utils/normalization_utils.py:10-34): first platform whose
pattern matches wins (dict order = facebook, twitter, linkedin, instagram,
youtube), result is ``"platform:profile_id"`` with the id slash-stripped and
lowercased; NULL when nothing matches.

Note these regexes differ subtly from the extractor's canonical-link
patterns (html_data_extractor.py:15-21): here linkedin/youtube path
prefixes are NON-capturing, so group(1) is the profile id itself. That
C2-vs-D1 asymmetry is part of the spec (SURVEY.md §7 hard-part 2).

Java regex (Spark) supports the same lookaheads as Python's ``re`` for
these patterns, so the whole cascade compiles to codegen'd
``regexp_extract`` calls — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (platform, pattern, group-index) in reference dict order.
# Patterns are semantically identical to normalization_utils.py:10-16.
NORMALIZE_PATTERNS = [
    ("facebook", r"facebook\.com/((?!.*\b(?:sharer|plugins|events|groups|notes|photo)\b)[a-zA-Z0-9._/\-]+)", 1),
    ("twitter", r"(?:twitter|x)\.com/([a-zA-Z0-9_]{1,15})(?!\b(?:intent|share|search)\b)", 1),
    ("linkedin", r"linkedin\.com/(?:company/|in/)([a-zA-Z0-9._\-]+/?)", 1),
    ("instagram", r"instagram\.com/([a-zA-Z0-9._]+/?)(?!.*\b(?:p/|explore)\b)", 1),
    ("youtube", r"youtube\.com/(?:user/|channel/|c/)?([a-zA-Z0-9._\-]+/?)", 1),
]


def normalize_social_profile(url: Column) -> Column:
    """First matching platform -> ``platform:id`` (id slash-stripped,
    lowercased); NULL otherwise."""
    candidates = []
    for platform, pattern, group in NORMALIZE_PATTERNS:
        # regexp_extract returns "" on no-match; nullif folds that to NULL
        # so coalesce implements the first-match-wins dict iteration.
        raw = F.regexp_extract(url, pattern, group)
        profile = F.lower(F.regexp_replace(raw, r"^/+|/+$", ""))
        candidates.append(F.nullif(profile, F.lit("")))
    result = None
    for platform_info, cand in zip(NORMALIZE_PATTERNS, candidates):
        tagged = F.concat(F.lit(platform_info[0] + ":"), cand)
        result = tagged if result is None else F.coalesce(result, tagged)
    return result
