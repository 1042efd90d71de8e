"""GA4 gold layer: the reference README's promised analytics, bound to the
actual GA4 export schema (SURVEY.md §2c; /root/reference/README.md:27-33).

The reference stops at the bronze layer ("Silver Layer (Planned)",
README.md:23-25); these functions are the silver+gold it never built,
implemented over the declared GA4 StructType (schemas.GA4_EVENTS) using the
generic analytics operators (operators/analytics.py) — same logic the
oracle-checked `events`-table queries exercise, different column binding.

Layering:
    bronze (raw GA4 rows, date-partitioned parquet)
      → ga4_silver: flatten the hot fields once (ts, user, session id,
        page, revenue) so gold queries never re-dig through event_params
      → ga4_funnel / ga4_sessions / ga4_attribution / ga4_conversion_daily
        / ga4_cohorts: one aggregate-shaped DataFrame each

Scale notes: silver is a map-only projection (no shuffle) — materialize it
partitioned by event_date and every gold query below it partition-prunes;
nested-schema pruning keeps unreferenced GA4 struct members out of the
scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from commerce_data_pipeline_spark.functions import ga4
from commerce_data_pipeline_spark.operators import analytics

DEFAULT_FUNNEL_STAGES = ("page_view", "add_to_cart", "purchase")


def ga4_silver(df: DataFrame) -> DataFrame:
    """Silver projection: canonical analysis columns from a bronze GA4 row.

    Bronze rows are already struct-flattened — the reference's extraction
    SQL aliases nested members at source (`traffic_source.source AS
    traffic_source`, `ecommerce.purchase_revenue AS purchase_revenue`, …;
    /root/reference/config/queries/extract_events.sql:24-26,67-77), and
    schemas.GA4_EVENTS mirrors that shape. What still needs digging out is
    the key-value array `event_params` — done here once so gold queries
    never touch it.

    - ts: event_timestamp (µs since epoch) as a proper timestamp
    - user_id: user_pseudo_id (device-scoped id — present on every row,
      unlike user_id which GA4 only sets for logged-in users)
    - revenue: purchase_revenue, null-safe
    """
    return df.select(
        F.col("event_date"),
        F.timestamp_micros(F.col("event_timestamp")).alias("ts"),
        F.col("user_pseudo_id").alias("user_id"),
        F.col("event_name"),
        ga4.ga_session_id().alias("ga_session_id"),
        ga4.page_location().alias("page_location"),
        F.coalesce(F.col("purchase_revenue"), F.lit(0.0)).alias("revenue"),
        F.col("traffic_source"),
        F.col("traffic_medium"),
        F.col("device_category"),
        F.col("country").alias("geo_country"),
    )


def ga4_funnel(silver: DataFrame, stages=DEFAULT_FUNNEL_STAGES) -> DataFrame:
    """G1 — ordered page_view → add_to_cart → purchase funnel
    (README.md:29)."""
    return analytics.funnel(silver, stages, user_col="user_id", type_col="event_name")


def ga4_sessions(silver: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """G2 — gap-based sessions (README.md:30,75). GA4 also ships its own
    ga_session_id param; this derives sessions from timestamps so the gap
    policy is ours, and keeps the GA4 id alongside for reconciliation."""
    return analytics.session_stats(
        silver, user_col="user_id", ts_col="ts", gap_minutes=gap_minutes
    )


def ga4_conversion_daily(silver: DataFrame) -> DataFrame:
    """G3 — daily conversion metrics (README.md:31); revenue from the
    ecommerce struct."""
    return analytics.conversion_metrics(
        silver,
        convert_type="purchase",
        user_col="user_id",
        type_col="event_name",
        ts_col="ts",
        value_col="revenue",
    )


def ga4_attribution(silver: DataFrame, model: str = "last") -> DataFrame:
    """G4 — first/last-touch attribution of purchases (README.md:32)."""
    return analytics.attribution(
        silver,
        convert_type="purchase",
        model=model,
        user_col="user_id",
        type_col="event_name",
        ts_col="ts",
    )


def ga4_cohorts(silver: DataFrame, period: str = "week") -> DataFrame:
    """G5 — cohort retention grid (README.md:79)."""
    return analytics.cohort_retention(silver, user_col="user_id", ts_col="ts", period=period)


def ga4_page_funnel_by_source(silver: DataFrame, stages=DEFAULT_FUNNEL_STAGES) -> DataFrame:
    """Composite gold view: funnel stage counts split by traffic source —
    the README's "conversion rates by traffic source" use case
    (README.md:74). One shuffle on (source, user)."""
    firsts = silver.groupBy("traffic_source", "user_id").agg(
        *[
            F.min(F.when(F.col("event_name") == s, F.col("ts"))).alias(f"_t{i}")
            for i, s in enumerate(stages)
        ]
    )
    reached_prev = F.lit(True)
    aggs = []
    for i, s in enumerate(stages):
        cond = F.col(f"_t{i}").isNotNull()
        if i > 0:
            cond = cond & (F.col(f"_t{i}") >= F.col(f"_t{i-1}"))
        reached_prev = reached_prev & cond
        aggs.append(F.sum(reached_prev.cast("long")).alias(f"users_{s}"))
    return firsts.groupBy("traffic_source").agg(*aggs)
