"""Dataflow operators (SURVEY.md §2 A/C/E/F/G/H) — extraction, merge,
match, dedup, similarity, URL-seen, politeness, images."""
