"""End-to-end dataflow plans (SURVEY.md §3): the crawl pipeline, the
names-enrichment merge, and the match query."""
