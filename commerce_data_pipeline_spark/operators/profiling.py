"""Data-quality profiling (deequ/TFDV-style) — per-column statistics of
any table in ONE pass (SURVEY.md §2 P-family extension: the audit step a
pipeline runs before admitting a partition).

`table_profile` emits one row per column: row count, null count, exact
distinct count, numeric min/max (ints and doubles as DOUBLE; timestamps
as epoch microseconds — exact in a double up to 2^53), and string
length min/max. Every statistic is either an exact integer or a value
COPIED from the data (min/max involve no arithmetic), so an ANSI-SQL
oracle reproduces the profile bit-for-bit.

Plan shape for 100 TB:
- ONE aggregation pass over the table: all per-column statistics are
  expressions of the same `agg()`; Spark expands multi-column DISTINCT
  aggregates via a single Expand node (k× row multiplication for k
  distinct columns) with map-side partial aggregation — still one scan,
  one shuffle of partial-agg rows.
- Exact distinct counts are the oracle-checkable contract; at real
  scale swap `exact_distinct=False` to use HLL++ (`approx_count_distinct`,
  mergeable fixed-size sketch state, no Expand) — the profile schema is
  identical, the distinct column becomes an estimate (rows-only check).
- The per-column unpivot happens on the SINGLE aggregated row
  (explode of a literal-sized struct array) — no corpus-side cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

__all__ = ["table_profile"]

_NUM_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def _dtype_class(dt: T.DataType) -> str:
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "double"
    if isinstance(dt, _NUM_TYPES):
        return "int"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.TimestampType):
        return "timestamp"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.BooleanType):
        return "bool"
    return "other"


def table_profile(df: DataFrame, columns: list[str] | None = None,
                  exact_distinct: bool = True) -> DataFrame:
    """One-pass per-column profile. Output (one row per column, source
    column order): col_name, dtype_class, n_rows, n_null, n_distinct,
    min_num, max_num (DOUBLE; NULL for non-numeric — timestamps/dates
    profile as epoch micros/days), min_len, max_len (string length;
    NULL for non-strings)."""
    fields = [f for f in df.schema.fields if columns is None or f.name in columns]
    if not fields:
        raise ValueError("no columns to profile")
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    n_distinct = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    for f in fields:
        c, cls = f.name, _dtype_class(f.dataType)
        if cls in ("int", "double"):
            num = F.col(c).cast("double")
        elif cls == "timestamp":
            num = F.unix_micros(F.col(c)).cast("double")
        elif cls == "date":
            num = F.datediff(F.col(c), F.lit("1970-01-01")).cast("double")
        elif cls == "bool":
            num = F.col(c).cast("int").cast("double")
        else:
            num = F.lit(None).cast("double")
        slen = (
            F.length(F.col(c)).cast("long")
            if cls == "string"
            else F.lit(None).cast("long")
        )
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"__nn_{c}"),
            n_distinct(c).cast("long").alias(f"__nd_{c}"),
            F.min(num).alias(f"__mn_{c}"),
            F.max(num).alias(f"__mx_{c}"),
            F.min(slen).alias(f"__ml_{c}"),
            F.max(slen).alias(f"__xl_{c}"),
        ]
    row = df.agg(*aggs)
    structs = [
        F.struct(
            F.lit(f.name).alias("col_name"),
            F.lit(_dtype_class(f.dataType)).alias("dtype_class"),
            F.col("__n").alias("n_rows"),
            F.col(f"__nn_{f.name}").alias("n_null"),
            F.col(f"__nd_{f.name}").alias("n_distinct"),
            F.col(f"__mn_{f.name}").alias("min_num"),
            F.col(f"__mx_{f.name}").alias("max_num"),
            F.col(f"__ml_{f.name}").alias("min_len"),
            F.col(f"__xl_{f.name}").alias("max_len"),
        )
        for f in fields
    ]
    return row.select(F.explode(F.array(*structs)).alias("_p")).select("_p.*")
