"""GA4 event-schema helpers: the map-as-array `event_params` pattern and the
flattening projection the reference pushes into SQL.

The reference extracts nested GA4 fields via a 90-line SELECT
(/root/reference/config/queries/extract_events.sql:5-95) and leaves
`event_params`/`user_properties`/`items` raw (sql:10,19,80). These helpers
give the engine the same reach natively:

- `param(col, key)` / typed variants — G6 key-value lookup in the
  ARRAY<STRUCT<key, value STRUCT<...>>> shape (SURVEY.md §2c G6), via
  higher-order `filter` — no explode, no shuffle, stays in codegen.
- `params_map(col)` — map_from_entries derivation for silver tables.
- `flatten_events(df)` — the extract_events.sql projection (R2/R3).

All functions are pure Column expressions usable in both batch and
Structured Streaming plans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _param_struct(params: Column | str, key: str) -> Column:
    c = F.col(params) if isinstance(params, str) else params
    # try_element_at: a missing key yields NULL instead of an ANSI
    # out-of-bounds error (Spark 4 runs ANSI mode by default)
    return F.try_element_at(F.filter(c, lambda p: p["key"] == key), F.lit(1))["value"]


def param_string(params: Column | str, key: str) -> Column:
    """G6 — `event_params` lookup returning string_value."""
    return _param_struct(params, key)["string_value"]


def param_int(params: Column | str, key: str) -> Column:
    return _param_struct(params, key)["int_value"]


def param_double(params: Column | str, key: str) -> Column:
    """double_value, falling back to float_value (GA4 populates either)."""
    v = _param_struct(params, key)
    return F.coalesce(v["double_value"], v["float_value"])


def param_any(params: Column | str, key: str) -> Column:
    """First non-null of the value union, cast to string (BigQuery's
    common COALESCE pattern for GA4 params)."""
    v = _param_struct(params, key)
    return F.coalesce(
        v["string_value"],
        v["int_value"].cast("string"),
        v["double_value"].cast("string"),
        v["float_value"].cast("string"),
    )


def params_map(params: Column | str) -> Column:
    """Map derivation of the key-value array (silver-layer ergonomics):
    map_from_entries(transform(params, p -> (p.key, p.value)))."""
    c = F.col(params) if isinstance(params, str) else params
    return F.map_from_entries(F.transform(c, lambda p: F.struct(p["key"], p["value"])))


def ga_session_id(params: Column | str = "event_params") -> Column:
    """The GA4-native session id (int param 'ga_session_id')."""
    return param_int(params, "ga_session_id")


def page_location(params: Column | str = "event_params") -> Column:
    return param_string(params, "page_location")


def items_revenue(items: Column | str = "items") -> Column:
    """Total item revenue of an event: aggregate over the items array
    (price × quantity per item), no explode."""
    c = F.col(items) if isinstance(items, str) else items
    return F.aggregate(
        c,
        F.lit(0.0),
        lambda acc, it: acc
        + F.coalesce(it["price"], F.lit(0.0)) * F.coalesce(it["quantity"], F.lit(0)).cast("double"),
    )


def explode_params(df: DataFrame, params_col: str = "event_params") -> DataFrame:
    """Full unnest for param-centric analysis: one row per (event, key)."""
    return df.withColumn("param", F.explode_outer(params_col)).select(
        "*",
        F.col("param")["key"].alias("param_key"),
        F.col("param")["value"].alias("param_value"),
    ).drop("param")


def event_date_parts(event_date: Column | str = "event_date") -> list[Column]:
    """year/month/day partition columns from the GA4 'YYYYMMDD' string —
    the sink layout of the reference (s3_loader.py:84-86)."""
    c = F.col(event_date) if isinstance(event_date, str) else event_date
    return [
        F.substring(c, 1, 4).alias("year"),
        F.substring(c, 5, 2).alias("month"),
        F.substring(c, 7, 2).alias("day"),
    ]
