"""Round-8 operator tests: boundary-banding parity (the NTILE scale
twin), plus coverage added alongside the r8 VERDICT directives."""

import pytest
from pyspark.sql import functions as F


def _band_counts(df, bounds_row, n_bounds=9):
    """Assign bands by comparing against a collected boundary row and
    return {band: n} — the same arithmetic as _q_revenue_bands."""
    out = {}
    for r in df.collect():
        band = 1 + sum(1 for i in range(1, n_bounds + 1) if r["v"] > bounds_row[i - 1])
        out[band] = out.get(band, 0) + 1
    return out


def test_boundary_banding_approx_matches_exact_at_small_scale(spark):
    """The revenue_bands contract: percentile_disc boundaries are the
    exact oracle shape; percentile_approx(accuracy=10000) is the
    documented production route. At n << accuracy the sketch's rank
    error is < 1, so the two boundary sets must band every row
    identically on tie-free data."""
    rows = [(i, float((i * 37) % 1009) + 0.5) for i in range(500)]
    df = spark.createDataFrame(rows, ["k", "v"]).localCheckpoint(eager=False)

    exact = df.agg(
        *[
            F.expr(f"percentile_disc(0.{i}) WITHIN GROUP (ORDER BY v)").alias(f"b{i}")
            for i in range(1, 10)
        ]
    ).collect()[0]
    approx_arr = df.agg(
        F.percentile_approx("v", [i / 10 for i in range(1, 10)], 10000).alias("b")
    ).collect()[0]["b"]

    got_exact = _band_counts(df, [exact[f"b{i}"] for i in range(1, 10)])
    got_approx = _band_counts(df, list(approx_arr))
    assert got_exact == got_approx
    assert sum(got_exact.values()) == 500 and len(got_exact) == 10


def test_boundary_banding_groups_ties_together(spark):
    """Value-banding semantics (vs NTILE's positional split): all rows
    tied on the boundary value share one band."""
    df = spark.createDataFrame([(i, 5.0) for i in range(20)], ["k", "v"])
    bounds = df.agg(
        *[
            F.expr(f"percentile_disc(0.{i}) WITHIN GROUP (ORDER BY v)").alias(f"b{i}")
            for i in range(1, 10)
        ]
    ).collect()[0]
    got = _band_counts(df, [bounds[f"b{i}"] for i in range(1, 10)])
    assert got == {1: 20}


def test_global_cumsum_matches_naive_window(spark):
    from pyspark.sql import Window as W

    from commerce_data_pipeline_spark.operators.relational import (
        global_order_stats,
    )

    df = spark.createDataFrame(
        [(i, (i * 17) % 11, (i % 5) + 1) for i in range(60)], ["k", "v", "x"]
    ).repartition(6)
    got = global_order_stats(
        df, [F.asc("v"), F.asc("k")], rank_col="r", sum_col="x",
        cum_col="c", num_partitions=9,
    )
    w = W.orderBy(F.asc("v"), F.asc("k"))
    want = df.withColumn(
        "r", F.row_number().over(w).cast("long")
    ).withColumn(
        "c",
        F.sum("x").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).cast("long"),
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
