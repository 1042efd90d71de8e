"""Approximate/sketch aggregates (SURVEY.md §2d X6).

Thin, named wrappers over Spark's built-in sketches — HyperLogLog++
(approx_count_distinct) and the Greenwald-Khanna/KLL quantile sketch
(percentile_approx). These are the 100 TB workhorses: fixed-size state,
mergeable across partitions, single narrow shuffle of sketch bytes.

Results are approximate → the driver's oracle gets rows-only checks for
these (documented in __spark_entry__.oracle_sql).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StructField, StructType

from commerce_data_pipeline_spark.checkpoint import checkpoint as _checkpoint


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


def misra_gries_heavy_hitters(
    df: DataFrame, col: str, k: int = 30, capacity: int | None = None
) -> DataFrame:
    """EXACT φ=1/k heavy hitters (keys with count > N/k) over a
    high-cardinality key, without ever shuffling the full distinct-key
    space: a bounded-memory Misra–Gries candidate pass followed by an
    exact verification pass over the candidates only.

    `frequent_items` is the right default for moderate-cardinality keys —
    its groupBy-count shuffles one row per DISTINCT key. At 100 TB with
    billions of distinct keys (URLs, user ids, n-grams) that shuffle IS
    the cost; this operator replaces it with:

      1. CANDIDATES — per-partition Misra–Gries with `capacity` counters
         (default 4k), batch-decrement form, via one `mapInPandas` pass:
         per Arrow batch, vectorized value_counts are merged into the
         counter table; when it exceeds `capacity` the (capacity+1)-th
         largest count is subtracted from every counter and non-positive
         counters dropped. MG summaries are mergeable with exactly this
         batch decrement (Agarwal et al., "Mergeable Summaries", PODS'12)
         and guarantee every key with partition count > n_p/(capacity+1)
         survives. Pigeonhole over partitions: a key with GLOBAL count
         > N/k must have count > n_p/k in at least one partition (else
         summing the per-partition bounds gives ≤ N/k), and capacity ≥ k
         makes n_p/k ≥ n_p/(capacity+1) — so the union of partition
         survivors is a SUPERSET of the true heavy hitters. At most
         `partitions × capacity` candidate rows leave the executors.
      2. VERIFY — exact counts of the candidate keys AND the total N in
         the same pass: a broadcast left-join marks candidate rows, and
         one keyed groupBy on `candidate ? key : NULL` counts every
         candidate exactly while all non-candidate rows collapse into the
         NULL group (map-side partial aggregation reduces them to one row
         per partition before the shuffle). N = sum over that tiny counts
         table — a second aggregation over ≤ partitions×capacity+1 rows,
         not a third pass over the data. The N/k threshold is composed
         into the plan (no eager count action).

    Because step 1 yields a superset and step 2 is exact, the output is
    EXACTLY the true heavy-hitter set with exact counts — deterministic
    and SQL-oracle-checkable (`GROUP BY ... HAVING count(*) > N/k`),
    unlike raw sketch outputs. NULL keys are excluded (both engines,
    documented contract). Returns (col, cnt), cnt exact.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    cap = capacity if capacity is not None else 4 * k
    if cap < k:
        raise ValueError("capacity must be >= k for the superset guarantee")
    rows = df.select(F.col(col)).filter(F.col(col).isNotNull())
    field = rows.schema[col]
    cand_schema = StructType([StructField(col, field.dataType, False)])

    def _mg(batches: Iterator) -> Iterator:
        import pandas as pd

        counters = pd.Series(dtype="float64")
        for pdf in batches:
            vc = pdf[col].value_counts()
            counters = counters.add(vc, fill_value=0)
            if len(counters) > cap:
                dec = counters.nlargest(cap + 1).iloc[-1]
                counters = counters[counters > dec] - dec
        if len(counters):  # empty partitions yield nothing (an empty
            # Series carries a RangeIndex whose int64 dtype would clash
            # with non-numeric key schemas at the Arrow boundary)
            yield pd.DataFrame({col: counters.index})

    candidates = rows.mapInPandas(_mg, schema=cand_schema).distinct()
    flagged = rows.join(
        F.broadcast(candidates.withColumn("_is_cand", F.lit(True))),
        on=col,
        how="left",
    )
    # ≤ partitions×capacity+1 rows, but TWO consumers (the N subtree and
    # the threshold filter) — without the checkpoint the broadcast job
    # for N re-ran BOTH corpus passes (candidates + verify), turning the
    # two-pass algorithm into four scans (r18 plan audit: 1+1+1+1)
    counts = flagged.groupBy(
        F.when(F.col("_is_cand"), F.col(col)).alias("_k")
    ).agg(F.count(F.lit(1)).alias("cnt")).transform(_checkpoint, eager=False)
    total = counts.agg(F.sum("cnt").alias("_total"))
    return (
        counts.filter(F.col("_k").isNotNull())
        .crossJoin(total)
        .filter(F.col("cnt") * k > F.col("_total"))
        .select(F.col("_k").alias(col), "cnt")
    )


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
