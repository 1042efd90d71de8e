"""GA4 schema + param-extraction tests (FIXTURES.md §B, SURVEY.md G6)."""

import pytest
from pyspark.sql import Row, functions as F

from commerce_data_pipeline_spark.functions import ga4
from commerce_data_pipeline_spark.schemas import GA4_EVENTS


def _param(key, string_value=None, int_value=None, float_value=None, double_value=None):
    return Row(
        key=key,
        value=Row(
            string_value=string_value,
            int_value=int_value,
            float_value=float_value,
            double_value=double_value,
        ),
    )


@pytest.fixture(scope="module")
def ga4_df(spark):
    rows = [
        Row(
            event_date="20240101",
            event_timestamp=1704103200000000,
            event_name="page_view",
            event_params=[
                _param("ga_session_id", int_value=555),
                _param("page_location", string_value="https://shop.example/home"),
                _param("value", double_value=1.5),
            ],
            user_pseudo_id="u1",
            items=[],
        ),
        Row(
            event_date="20240102",
            event_timestamp=1704189600000000,
            event_name="purchase",
            event_params=[_param("ga_session_id", int_value=556)],
            user_pseudo_id="u1",
            items=[
                Row(item_id="i1", item_name="widget", item_brand=None,
                    item_category=None, price=9.99, quantity=2, item_revenue=19.98),
                Row(item_id="i2", item_name="gadget", item_brand=None,
                    item_category=None, price=5.0, quantity=1, item_revenue=5.0),
            ],
        ),
    ]
    # fill unspecified GA4 columns with nulls via the declared schema
    base = {f.name: None for f in GA4_EVENTS.fields}
    full = [Row(**{**base, **r.asDict()}) for r in rows]
    return spark.createDataFrame(full, GA4_EVENTS)


def test_schema_roundtrip_partitioned(spark, ga4_df, tmp_path):
    out = str(tmp_path / "bronze")
    (
        ga4_df.select("*", *ga4.event_date_parts())
        .write.partitionBy("year", "month", "day")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    assert back.count() == 2
    # partition columns materialized from the YYYYMMDD string
    assert {(r["year"], r["month"], r["day"]) for r in back.select("year", "month", "day").collect()} == {
        (2024, 1, 1), (2024, 1, 2),
    }


def test_param_lookups(ga4_df):
    row = ga4_df.filter(F.col("event_name") == "page_view").select(
        ga4.ga_session_id().alias("sid"),
        ga4.page_location().alias("loc"),
        ga4.param_double("event_params", "value").alias("v"),
        ga4.param_any("event_params", "ga_session_id").alias("any_sid"),
        ga4.param_string("event_params", "missing_key").alias("nope"),
    ).collect()[0]
    assert row["sid"] == 555
    assert row["loc"] == "https://shop.example/home"
    assert row["v"] == 1.5
    assert row["any_sid"] == "555"
    assert row["nope"] is None


def test_params_map(ga4_df):
    out = ga4_df.select(ga4.params_map("event_params").alias("m")).collect()
    m = out[0]["m"]
    assert m["ga_session_id"]["int_value"] == 555


def test_items_revenue(ga4_df):
    rows = ga4_df.select("event_name", ga4.items_revenue().alias("rev")).collect()
    by_name = {r["event_name"]: r["rev"] for r in rows}
    assert abs(by_name["purchase"] - (9.99 * 2 + 5.0)) < 1e-9
    assert by_name["page_view"] == 0.0


def test_explode_params(ga4_df):
    out = ga4.explode_params(ga4_df)
    keys = {r["param_key"] for r in out.select("param_key").collect()}
    assert {"ga_session_id", "page_location", "value"} <= keys
