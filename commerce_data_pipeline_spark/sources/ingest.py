"""Ingest readers: CSV / JSON / Parquet sources with explicit-or-inferred
schemas (SURVEY.md §2e "Scans/sources/sinks").

The reference reads exactly one source (BigQuery SQL results,
/root/reference/src/pipeline/extractors/bigquery_extractor.py:73-76) and
treats the schema dynamically — whatever the service returns. These readers
preserve both modes Spark-first:

- explicit schema (the engine's preferred path — scans never pay an
  inference job, and bad rows are surfaced per the chosen `mode`), and
- inference (`infer_schema=True`) for schemaless landing zones, mirroring
  the reference's dynamic behavior (SURVEY.md §1.3).

Scale notes: schema inference is a full extra pass over the data — at
100 TB always pass a schema (or sample via `samplingRatio`). CSV/JSON are
ingest formats only; everything lands in partitioned Parquet (bronze.py)
before analytics touch it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    header: bool = True,
    infer_schema: bool = False,
    mode: str = "PERMISSIVE",
    sampling_ratio: float | None = None,
    **options: str,
) -> DataFrame:
    """CSV source. Exactly one of `schema` / `infer_schema` should be set;
    with neither, all columns load as strings (Spark's no-inference default
    — cheapest, never wrong, cast downstream)."""
    reader = spark.read.option("header", str(header).lower()).option("mode", mode)
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
        if sampling_ratio is not None:
            reader = reader.option("samplingRatio", str(sampling_ratio))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    multiline: bool = False,
    mode: str = "PERMISSIVE",
    sampling_ratio: float | None = None,
    **options: str,
) -> DataFrame:
    """JSON-lines source (multiline=True for document-per-file). Without a
    schema Spark infers — acceptable for landing zones, an extra pass at
    scale (pass `sampling_ratio` to bound it)."""
    reader = spark.read.option("multiLine", str(multiline).lower()).option("mode", mode)
    if schema is not None:
        reader = reader.schema(schema)
    elif sampling_ratio is not None:
        reader = reader.option("samplingRatio", str(sampling_ratio))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.json(path)


def read_parquet(
    spark: SparkSession,
    path: str,
    schema: StructType | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Parquet source. `merge_schema` reconciles schema evolution across
    files (an extra footer pass — leave off unless the layout evolved)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(path)
