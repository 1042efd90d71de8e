"""Unit tests for the relational operator surface (SURVEY.md §2a, P4-P6)."""

from pyspark.sql import functions as F

from commerce_data_pipeline_spark.operators import relational as R


def test_project_and_nested_extract(spark):
    df = spark.createDataFrame(
        [(1, ("web", "organic"))],
        "id int, src struct<source string, medium string>",
    )
    out = R.extract_nested(df, {"traffic_source": "src.source", "traffic_medium": "src.medium"})
    row = out.collect()[0]
    assert row["traffic_source"] == "web"
    assert row["traffic_medium"] == "organic"
    assert out.columns == ["traffic_source", "traffic_medium"]


def test_filter_event_date_and_between(spark):
    df = spark.createDataFrame(
        [("2024-01-01", 1), ("2024-01-02", 2), ("2024-01-03", 3)], "d string, v int"
    )
    assert R.filter_event_date(df, "d", "2024-01-02").count() == 1
    assert R.filter_date_between(df, "d", "2024-01-01", "2024-01-02").count() == 2


def test_top_k(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "v int")
    out = R.top_k(df, 5, F.desc("v")).collect()
    assert [r["v"] for r in out] == [99, 98, 97, 96, 95]


def test_missing_dates_anti_join(spark):
    src = spark.createDataFrame([("a",), ("b",), ("c",)], "d string")
    sink = spark.createDataFrame([("a",), ("c",)], "d string")
    out = R.missing_dates(src, sink, "d").collect()
    assert [r["d"] for r in out] == ["b"]


def test_empty_guard(spark):
    empty = spark.createDataFrame([], "v int")
    assert R.is_empty(empty)
    assert not R.is_empty(spark.createDataFrame([(1,)], "v int"))
    assert R.row_count(empty) == 0
