"""Structured Streaming surface (SURVEY.md §2 cat. J alternative path):
the metrics/report stream and a custom stateful sessionizer."""
