"""GA4 extraction: the reference's core query, as a DataFrame transform.

Mirrors /root/reference/config/queries/extract_events.sql line-for-line —
the ~60-column projection that flattens Google's nested GA4 export rows
(schemas.GA4_EXPORT_RAW) into the bronze shape, with the same aliases
(`traffic_source.source AS traffic_source`, sql:24; `device.category AS
device_category`, sql:29; `app_info.id AS app_id`, sql:54; …), the same
partition-equality filter (sql:98) and the same timestamp ordering
(sql:99).

Differences by design (Spark-first, SURVEY.md §3):
- The filter is a DataFrame predicate → Catalyst partition-prunes the scan
  instead of string-formatting a table name per day
  (reference bigquery_extractor.py:60-62).
- ORDER BY event_timestamp exists in the reference for file layout; a
  global sort is a range-shuffle, so the default here is
  `sortWithinPartitions` (same file-level layout, no extra shuffle);
  `global_order=True` reproduces the total order when semantics need it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# (output_name, source_path) — order mirrors extract_events.sql:5-95
_PROJECTION: tuple[tuple[str, str], ...] = (
    # event metadata (sql:7-14)
    ("event_date", "event_date"),
    ("event_timestamp", "event_timestamp"),
    ("event_name", "event_name"),
    ("event_params", "event_params"),
    ("event_previous_timestamp", "event_previous_timestamp"),
    ("event_value_in_usd", "event_value_in_usd"),
    ("event_bundle_sequence_id", "event_bundle_sequence_id"),
    ("event_server_timestamp_offset", "event_server_timestamp_offset"),
    # user information (sql:17-21)
    ("user_id", "user_id"),
    ("user_pseudo_id", "user_pseudo_id"),
    ("user_properties", "user_properties"),
    ("user_first_touch_timestamp", "user_first_touch_timestamp"),
    ("user_ltv", "user_ltv"),
    # traffic source (sql:24-26)
    ("traffic_source", "traffic_source.source"),
    ("traffic_medium", "traffic_source.medium"),
    ("campaign_name", "traffic_source.name"),
    # device (sql:29-43)
    ("device_category", "device.category"),
    ("mobile_brand_name", "device.mobile_brand_name"),
    ("mobile_model_name", "device.mobile_model_name"),
    ("mobile_marketing_name", "device.mobile_marketing_name"),
    ("mobile_os_hardware_model", "device.mobile_os_hardware_model"),
    ("operating_system", "device.operating_system"),
    ("operating_system_version", "device.operating_system_version"),
    ("vendor_id", "device.vendor_id"),
    ("advertising_id", "device.advertising_id"),
    ("language", "device.language"),
    ("is_limited_ad_tracking", "device.is_limited_ad_tracking"),
    ("time_zone_offset_seconds", "device.time_zone_offset_seconds"),
    ("browser", "device.browser"),
    ("browser_version", "device.browser_version"),
    ("web_info", "device.web_info"),
    # geo (sql:46-51)
    ("continent", "geo.continent"),
    ("country", "geo.country"),
    ("region", "geo.region"),
    ("city", "geo.city"),
    ("sub_continent", "geo.sub_continent"),
    ("metro", "geo.metro"),
    # app info (sql:54-58)
    ("app_id", "app_info.id"),
    ("app_version", "app_info.version"),
    ("install_store", "app_info.install_store"),
    ("firebase_app_id", "app_info.firebase_app_id"),
    ("install_source", "app_info.install_source"),
    # platform / stream (sql:61-64)
    ("platform", "platform"),
    ("stream_id", "stream_id"),
    # ecommerce (sql:67-77)
    ("total_item_quantity", "ecommerce.total_item_quantity"),
    ("purchase_revenue_in_usd", "ecommerce.purchase_revenue_in_usd"),
    ("purchase_revenue", "ecommerce.purchase_revenue"),
    ("refund_value_in_usd", "ecommerce.refund_value_in_usd"),
    ("refund_value", "ecommerce.refund_value"),
    ("shipping_value_in_usd", "ecommerce.shipping_value_in_usd"),
    ("shipping_value", "ecommerce.shipping_value"),
    ("tax_value_in_usd", "ecommerce.tax_value_in_usd"),
    ("tax_value", "ecommerce.tax_value"),
    ("unique_items", "ecommerce.unique_items"),
    ("transaction_id", "ecommerce.transaction_id"),
    # items (sql:80)
    ("items", "items"),
    # privacy (sql:83-85)
    ("analytics_storage", "privacy_info.analytics_storage"),
    ("ads_storage", "privacy_info.ads_storage"),
    ("uses_transient_token", "privacy_info.uses_transient_token"),
    # trailing fields (sql:88-95)
    ("event_dimensions", "event_dimensions"),
    ("collected_traffic_source", "collected_traffic_source"),
    ("is_active_user", "is_active_user"),
    ("batch_event_index", "batch_event_index"),
    ("batch_page_id", "batch_page_id"),
    ("batch_ordering_id", "batch_ordering_id"),
    ("session_traffic_source_last_click", "session_traffic_source_last_click"),
    ("publisher", "publisher"),
)

EXTRACTED_COLUMNS: tuple[str, ...] = tuple(name for name, _ in _PROJECTION)


def _cols() -> list[Column]:
    return [
        F.col(path).alias(name) if path != name else F.col(name)
        for name, path in _PROJECTION
    ]


def extract_events(
    raw: DataFrame,
    event_date: str | None = None,
    global_order: bool = False,
) -> DataFrame:
    """The reference extraction query over a nested GA4 export DataFrame.

    `event_date` is the 'YYYYMMDD' partition filter (sql:98) — a Catalyst
    predicate, pruned at the scan when the source is date-partitioned.
    `global_order=True` reproduces sql:99's total ORDER BY; the default
    sorts within partitions only (same file layout, no range shuffle).
    """
    out = raw.select(*_cols())
    if event_date is not None:
        out = out.filter(F.col("event_date") == event_date)
    if global_order:
        return out.orderBy("event_timestamp")
    return out.sortWithinPartitions("event_timestamp")
