"""Sketch aggregates (X6): HLL++ distinct, approximate quantiles, heavy
hitters — accuracy bounds on known distributions."""

from pyspark.sql import functions as F

from commerce_data_pipeline_spark.operators import sketches


def test_approx_distinct_within_rsd(spark):
    df = spark.range(10_000).select((F.col("id") % 3_000).alias("v"))
    got = sketches.approx_distinct(df, "v", rsd=0.01).collect()[0][0]
    assert abs(got - 3_000) / 3_000 < 0.05  # 1% rsd target, 5% guard


def test_approx_distinct_grouped(spark):
    df = spark.range(1000).select(
        (F.col("id") % 2).alias("g"), (F.col("id") % 100).alias("v")
    )
    got = {r["g"]: r[1] for r in sketches.approx_distinct(df, "v", group_by=["g"]).collect()}
    assert set(got) == {0, 1}
    # id%2 and id%100 share parity: each group sees exactly 50 distinct v
    for v in got.values():
        assert abs(v - 50) / 50 < 0.1


def test_approx_quantiles_uniform(spark):
    df = spark.range(100_000).select(F.col("id").cast("double").alias("v"))
    qs = sketches.approx_quantiles(df, "v", [0.5, 0.9]).collect()[0][0]
    assert abs(qs[0] - 50_000) < 2_000
    assert abs(qs[1] - 90_000) < 2_000


def test_frequent_items_finds_hot_key(spark):
    rows = [(7,)] * 500 + [(i,) for i in range(100)]
    df = spark.createDataFrame(rows, "v long")
    hot = sketches.frequent_items(df, "v", min_share=0.3)
    vals = [r["v"] for r in hot.collect()]
    assert 7 in vals
