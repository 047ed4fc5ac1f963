"""web_scraper_spark — a PySpark-native crawl/frontier analytics engine.

A from-scratch, Spark-first engine with the observable semantics of the
reference scraper ``alindragut/web_scraper`` (surveyed in SURVEY.md):

- seed-URL normalization + global dedup          (reference run_url_producer.py:24-43)
- depth-2 contact-page BFS crawl                 (extractor_service.py:69-76)
- HTML extraction of phones/socials/addresses    (html_data_extractor.py)
- per-domain record merge with union-dedup lists (storage_service.py:55-112)
- weighted top-1 company match                   (api_service.py:46-109)

grafted with web-scale frontier machinery the reference lacks:

- partitioned Bloom/exact URL-seen set (canonicalize -> xxhash64 ->
  per-partition membership via Arrow UDFs)
- per-host politeness buckets + robots.txt rule table
- salted-key repartitioning for hot-domain skew
- snapshot-checkpointed, resumable crawl rounds
- an image+caption payload table (image_id, bytes, w, h, fmt, caption, phash)

Everything hot-path is either a Catalyst built-in expression or an
Arrow-vectorized pandas UDF — never per-row Python.
"""

__version__ = "0.1.0"
