"""Testdata table loader (parquet) — the rebuild's batch source layer.

The reference's sources are Kafka topics (kafka_monitor.py:270-314);
batch-side the equivalent is a parquet/Iceberg scan with schema applied.
Column pruning + predicate pushdown reach the scan automatically
(verify with .explain → PushedFilters / ReadSchema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    for t in tables or TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
