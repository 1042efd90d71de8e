"""GA4 end-to-end lifecycle: nested export rows → extraction (the
reference's query) → date-partitioned bronze → silver projection → gold
analytics. The full path a reference user migrates onto."""

from pyspark.sql import Row, functions as F

from commerce_data_pipeline_spark import gold_ga4 as G
from commerce_data_pipeline_spark.schemas import GA4_EXPORT_RAW
from commerce_data_pipeline_spark.sources.bronze import BronzeWriter
from commerce_data_pipeline_spark.sources.ga4_extract import extract_events

US = 1_000_000
T0 = 1704100000 * US


def _param(key, int_value=None, string_value=None):
    return Row(key=key, value=Row(string_value=string_value, int_value=int_value,
                                  float_value=None, double_value=None))


def _raw(user, name, day, offset_s, revenue=None):
    base = {f.name: None for f in GA4_EXPORT_RAW.fields}
    base.update(
        event_date=day,
        event_timestamp=T0 + offset_s * US,
        event_name=name,
        user_pseudo_id=user,
        event_params=[_param("ga_session_id", int_value=1)],
        traffic_source=Row(source="google", medium="cpc", name=None),
        ecommerce=Row(
            total_item_quantity=None, purchase_revenue_in_usd=None,
            purchase_revenue=revenue, refund_value_in_usd=None, refund_value=None,
            shipping_value_in_usd=None, shipping_value=None, tax_value_in_usd=None,
            tax_value=None, unique_items=None, transaction_id=None,
        ),
    )
    return Row(**base)


def test_ga4_full_lifecycle(spark, tmp_path):
    raw_rows = [
        _raw("u1", "page_view", "20240101", 0),
        _raw("u1", "add_to_cart", "20240101", 60),
        _raw("u1", "purchase", "20240101", 120, revenue=42.0),
        _raw("u2", "page_view", "20240102", 86400),
    ]
    raw = spark.createDataFrame(raw_rows, GA4_EXPORT_RAW)

    # 1. extraction (reference query) — one day, reference semantics
    day1 = extract_events(raw, event_date="20240101")
    assert day1.count() == 3

    # 2. bronze: date-partitioned sink with dynamic overwrite
    writer = BronzeWriter(root=str(tmp_path / "bronze"), data_type="ga4_events")
    flat = extract_events(raw).withColumn(
        "event_dt", F.to_date("event_date", "yyyyMMdd")
    )
    writer.write(flat, date_col="event_dt", sort_col="event_timestamp")
    assert writer.exists("2024-01-01") and writer.exists("2024-01-02")
    assert writer.list_available_dates() == ["2024-01-02", "2024-01-01"]

    # 3. silver over bronze (partition columns round-trip alongside)
    bronze = spark.read.parquet(writer.table_root)
    silver = G.ga4_silver(bronze)
    assert silver.count() == 4

    # 4. gold: funnel + conversion over the silver view
    funnel = {r["stage"]: r["users"] for r in
              G.ga4_funnel(silver, ("page_view", "add_to_cart", "purchase")).collect()}
    assert funnel == {"page_view": 2, "add_to_cart": 1, "purchase": 1}
    conv = {r["day"]: r for r in G.ga4_conversion_daily(silver).collect()}
    assert abs(conv["2024-01-01"]["converted_value"] - 42.0) < 1e-9
    assert conv["2024-01-02"]["n_converters"] == 0
