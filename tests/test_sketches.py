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


# ---- misra_gries_heavy_hitters (exact HH via bounded candidates, r5) -----

def test_mg_heavy_hitters_matches_exact_groupby(spark):
    # skewed keys; capacity=k forces MG decrements (10 distinct > cap=3)
    rows = (
        [("hot",)] * 60 + [("warm",)] * 30
        + [(f"cold{i}",) for i in range(10) for _ in range(3)]
    )
    df = spark.createDataFrame(rows, "k string").repartition(4)
    k = 3  # threshold N/3 = 40 → only "hot"
    got = {
        (r["k"], r["cnt"])
        for r in sketches.misra_gries_heavy_hitters(df, "k", k=k, capacity=3).collect()
    }
    exact = {
        (r["k"], r["cnt"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * k > df.count())
        .collect()
    }
    assert got == exact == {("hot", 60)}


def test_mg_heavy_hitters_exact_at_looser_threshold(spark):
    rows = [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 15 + [("d",)] * 5
    df = spark.createDataFrame(rows, "k string").repartition(3)
    got = {
        (r["k"], r["cnt"])
        for r in sketches.misra_gries_heavy_hitters(df, "k", k=8, capacity=8).collect()
    }
    # N=100, threshold 100/8=12.5 → a, b, c
    assert got == {("a", 50), ("b", 30), ("c", 15)}


def test_mg_heavy_hitters_excludes_nulls_and_validates(spark):
    import pytest

    df = spark.createDataFrame([("x",), (None,), ("x",), (None,)], "k string")
    got = sketches.misra_gries_heavy_hitters(df, "k", k=2).collect()
    assert [(r["k"], r["cnt"]) for r in got] == [("x", 2)]  # N counts non-null only
    with pytest.raises(ValueError):
        sketches.misra_gries_heavy_hitters(df, "k", k=0)
    with pytest.raises(ValueError):
        sketches.misra_gries_heavy_hitters(df, "k", k=10, capacity=5)


def test_mg_heavy_hitters_long_keys(spark):
    df = spark.range(0, 1000).select((F.col("id") % 7).alias("k"))
    # uniform: every key ~143, N/5 = 200 → none qualify
    assert sketches.misra_gries_heavy_hitters(df, "k", k=5).count() == 0
    # N/10 = 100 → all 7 qualify
    assert sketches.misra_gries_heavy_hitters(df, "k", k=10).count() == 7
