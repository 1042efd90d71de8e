"""Approximate/sketch aggregates (SURVEY.md §2d X6).

Thin, named wrappers over Spark's built-in sketches — HyperLogLog++
(approx_count_distinct) and the Greenwald-Khanna/KLL quantile sketch
(percentile_approx). These are the 100 TB workhorses: fixed-size state,
mergeable across partitions, single narrow shuffle of sketch bytes.

Results are approximate → the driver's oracle gets rows-only checks for
these (documented in __spark_entry__.oracle_sql).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def approx_distinct(df: DataFrame, col: str, rsd: float = 0.01, group_by: Sequence[str] = ()) -> DataFrame:
    agg = F.approx_count_distinct(col, rsd=rsd).alias(f"approx_distinct_{col}")
    if group_by:
        return df.groupBy(*group_by).agg(agg)
    return df.agg(agg)


def approx_quantiles(
    df: DataFrame,
    col: str,
    probabilities: Sequence[float] = (0.25, 0.5, 0.75, 0.95),
    accuracy: int = 10000,
    group_by: Sequence[str] = (),
) -> DataFrame:
    agg = F.percentile_approx(col, list(probabilities), accuracy).alias(f"approx_q_{col}")
    if group_by:
        return df.groupBy(*group_by).agg(agg)
    return df.agg(agg)


def frequent_items(df: DataFrame, col: str, min_share: float = 0.01, k: int = 20) -> DataFrame:
    """Heavy hitters: exact groupBy-count with a share filter and top-k cap.
    (Spark's freqItems gives no counts; the exact form with map-side combine
    is the scalable default for moderate-cardinality keys.)

    One job, lazily composed: the denominator is a cross-joined scalar
    aggregate (1 row, auto-broadcast), not a separate `df.count()` action —
    an eager count would launch a full job before the real one, and the
    returned plan would silently embed a stale total if `df` changed. Both
    aggregations combine map-side; no unpartitioned window anywhere (an
    `over()` total would funnel all groups through one task)."""
    counts = df.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
    total = df.agg(F.count(F.lit(1)).cast("double").alias("_total"))
    return (
        counts.crossJoin(total)
        .withColumn("share", F.col("cnt") / F.col("_total"))
        .drop("_total")
        .filter(F.col("share") >= min_share)
        .orderBy(F.desc("cnt"), F.asc(col))
        .limit(k)
    )
