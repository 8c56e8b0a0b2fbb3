"""scrapy_cluster_spark — a PySpark-native rebuild of the capabilities of
istresearch/scrapy-cluster (reference at /root/reference, read-only).

The reference is an always-on Redis/Kafka/Zookeeper coordination system;
this engine re-expresses its observable semantics (URL frontier, dupe
filter, politeness throttle, priority ordering, control actions, stats)
as batch/micro-batch DataFrame transformations over snapshot-versioned
parquet tables (an "Iceberg-lite" store — see ``store.py``).

Layout:
  session.py   SparkSession factory (AQE, Arrow, shuffle partitions)
  config.py    engine defaults mirroring reference crawler/crawling/settings.py
  schemas.py   explicit StructTypes for every table (reference is schema-on-convention)
  store.py     SnapshotStore: atomic, versioned parquet tables (resume/lineage)
  synth.py     deterministic synthetic web graph (pages table per input_hint)
  functions/   vectorized pandas-UDF layer (url, domain, html, text, dedup, vectors)
  operators/   one module per reference operator family (SURVEY.md §2)
  plans/       composed end-to-end jobs (a scheduling round, a full crawl)
  streaming/   Structured Streaming wrappers over the round loop
"""

__version__ = "0.1.0"
