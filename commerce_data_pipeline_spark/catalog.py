"""Catalog: named-table access over a testdata directory.

Replaces the reference's two ad-hoc catalogs — BigQuery table-name
construction (/root/reference/src/pipeline/extractors/bigquery_extractor.py:60-62)
and S3 prefix listing (/root/reference/src/pipeline/loaders/s3_loader.py:171-216) —
with one schema-explicit Parquet catalog. Daily `events_YYYYMMDD` tables become
partitions of a single DataFrame (SURVEY.md §1.1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from commerce_data_pipeline_spark.schemas import EVENTS_RAW, TABLE_SCHEMAS

TABLES: tuple[str, ...] = (
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
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at any realistic scale factor
# (region=5, nation=25 rows are fixed; supplier/part/customer grow slowly).
BROADCAST_DIMS: frozenset[str] = frozenset({"region", "nation", "supplier", "part"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table with its declared schema (no inference pass).

    `events.ts` is stored as parquet TIMESTAMP(NANOS); Spark reads it as
    INT64 (spark.sql.legacy.parquet.nanosAsLong) and we convert to a µs
    TimestampType here — the same ns→µs truncation DuckDB applies, so
    oracle comparisons see identical instants.
    """
    if name not in TABLE_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; known: {sorted(TABLE_SCHEMAS)}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        raw = spark.read.schema(EVENTS_RAW).parquet(path)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.schema(TABLE_SCHEMAS[name]).parquet(path)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every table as a temp view so `spark.sql` works alongside the
    DataFrame API. Returns the DataFrames keyed by name."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
