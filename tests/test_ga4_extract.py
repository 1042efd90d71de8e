"""GA4 nested→flat extraction (the reference's core query as a transform)."""

import pytest
from pyspark.sql import Row

from commerce_data_pipeline_spark.schemas import GA4_EVENTS, GA4_EXPORT_RAW
from commerce_data_pipeline_spark.sources.ga4_extract import (
    EXTRACTED_COLUMNS,
    extract_events,
)


def _raw_row(**over):
    base = {f.name: None for f in GA4_EXPORT_RAW.fields}
    base.update(
        event_date="20240101",
        event_timestamp=1704103200000000,
        event_name="page_view",
        user_pseudo_id="u1",
        traffic_source=Row(source="google", medium="cpc", name="spring_sale"),
        device=Row(
            category="mobile", mobile_brand_name="Pixel", mobile_model_name="8",
            mobile_marketing_name=None, mobile_os_hardware_model=None,
            operating_system="Android", operating_system_version="14",
            vendor_id=None, advertising_id=None, language="en-us",
            is_limited_ad_tracking="No", time_zone_offset_seconds=-28800,
            browser="chrome", browser_version="120",
            web_info=Row(browser="chrome", browser_version="120", hostname="shop.example"),
        ),
        geo=Row(continent="Americas", country="United States", region="CA",
                city="San Jose", sub_continent="Northern America", metro="807"),
        app_info=Row(id="com.shop", version="2.1", install_store=None,
                     firebase_app_id=None, install_source=None),
        platform="WEB",
        ecommerce=Row(
            total_item_quantity=3, purchase_revenue_in_usd=30.0,
            purchase_revenue=30.0, refund_value_in_usd=None, refund_value=None,
            shipping_value_in_usd=None, shipping_value=None,
            tax_value_in_usd=None, tax_value=None, unique_items=2,
            transaction_id="t1",
        ),
    )
    base.update(over)
    return Row(**base)


@pytest.fixture(scope="module")
def raw(spark):
    rows = [
        _raw_row(),
        _raw_row(event_date="20240102", event_timestamp=1704189600000000,
                 event_name="purchase", user_pseudo_id="u2"),
    ]
    return spark.createDataFrame(rows, GA4_EXPORT_RAW)


def test_projection_aliases(raw):
    out = extract_events(raw)
    assert list(out.columns) == list(EXTRACTED_COLUMNS)
    r = out.filter(out.event_name == "page_view").collect()[0]
    assert r["traffic_source"] == "google"       # traffic_source.source AS ...
    assert r["traffic_medium"] == "cpc"
    assert r["campaign_name"] == "spring_sale"   # traffic_source.name AS ...
    assert r["device_category"] == "mobile"
    assert r["app_id"] == "com.shop"             # app_info.id AS app_id
    assert r["country"] == "United States"
    assert r["purchase_revenue"] == 30.0
    assert r["web_info"]["hostname"] == "shop.example"  # nested struct kept


def test_partition_filter(raw):
    out = extract_events(raw, event_date="20240102")
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["event_name"] == "purchase"


def test_global_order(raw):
    out = extract_events(raw, global_order=True).collect()
    ts = [r["event_timestamp"] for r in out]
    assert ts == sorted(ts)


def test_flat_schema_is_subset_of_extraction(raw):
    """Every column of the bronze GA4_EVENTS schema is produced by the
    extraction (the extraction is the superset: it also carries fields the
    bronze subset drops)."""
    out_cols = set(extract_events(raw).columns)
    missing = [f.name for f in GA4_EVENTS.fields if f.name not in out_cols]
    assert missing == []
