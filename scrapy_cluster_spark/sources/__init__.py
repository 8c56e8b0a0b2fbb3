"""Input connectors: testdata parquet tables, request feeds, streaming."""

from scrapy_cluster_spark.sources.tables import TESTDATA_TABLES, load_table, register_views  # noqa: F401
