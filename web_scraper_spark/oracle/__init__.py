"""Reference-oracle simulator: plain-Python mirror of the reference
pipeline's observable semantics, used as the golden source in parity
tests (SURVEY.md §5.2.2). Imports nothing from Spark."""
