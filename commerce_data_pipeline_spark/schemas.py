"""Explicit schemas for every table the engine reads or synthesizes.

The reference never declares a schema anywhere — columns/dtypes are whatever
BigQuery returns (SURVEY.md §1.3; /root/reference/src/pipeline/extractors/
bigquery_extractor.py:76). This module is the schema the reference should
have written down: explicit StructTypes used on read so scans never pay
inference, plus the GA4 events schema derived column-by-column from the
reference's extraction query (/root/reference/config/queries/
extract_events.sql:5-95; see FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Driver synthetic tables (TESTDATA.md / FIXTURES.md §A) -----------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),  # JSON string, GA4-params stand-in
    ]
)

# Physical read schema for events: the driver parquet stores ts as
# TIMESTAMP(NANOS), which Spark only reads as INT64 (nanosAsLong); the
# catalog converts ns → µs TimestampType so consumers always see EVENTS.
EVENTS_RAW = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# --- GA4 events schema (reference parity; FIXTURES.md §B) -------------------

_GA4_PARAM_VALUE = T.StructType(
    [
        T.StructField("string_value", T.StringType()),
        T.StructField("int_value", T.LongType()),
        T.StructField("float_value", T.DoubleType()),
        T.StructField("double_value", T.DoubleType()),
    ]
)

_GA4_USER_PROP_VALUE = T.StructType(
    [
        T.StructField("string_value", T.StringType()),
        T.StructField("int_value", T.LongType()),
        T.StructField("float_value", T.DoubleType()),
        T.StructField("double_value", T.DoubleType()),
        T.StructField("set_timestamp_micros", T.LongType()),
    ]
)

GA4_ITEM = T.StructType(
    [
        T.StructField("item_id", T.StringType()),
        T.StructField("item_name", T.StringType()),
        T.StructField("item_brand", T.StringType()),
        T.StructField("item_category", T.StringType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("quantity", T.LongType()),
        T.StructField("item_revenue", T.DoubleType()),
    ]
)

# Column order mirrors the reference projection extract_events.sql:5-95.
GA4_EVENTS = T.StructType(
    [
        T.StructField("event_date", T.StringType()),  # 'YYYYMMDD' (sql:7, filter :98)
        T.StructField("event_timestamp", T.LongType()),  # µs epoch (sql:8, sort :99)
        T.StructField("event_name", T.StringType()),  # sql:9
        T.StructField(
            "event_params", T.ArrayType(T.StructType([
                T.StructField("key", T.StringType()),
                T.StructField("value", _GA4_PARAM_VALUE),
            ]))
        ),  # sql:10 — GA4 map-as-array pattern
        T.StructField("event_value_in_usd", T.DoubleType()),  # sql:12
        T.StructField("event_bundle_sequence_id", T.LongType()),  # sql:13
        T.StructField("user_id", T.StringType()),  # sql:17
        T.StructField("user_pseudo_id", T.StringType()),  # sql:18
        T.StructField(
            "user_properties", T.ArrayType(T.StructType([
                T.StructField("key", T.StringType()),
                T.StructField("value", _GA4_USER_PROP_VALUE),
            ]))
        ),  # sql:19
        T.StructField("user_first_touch_timestamp", T.LongType()),  # sql:20
        T.StructField(
            "user_ltv", T.StructType([
                T.StructField("revenue", T.DoubleType()),
                T.StructField("currency", T.StringType()),
            ])
        ),  # sql:21
        # Flattened struct members the reference aliases (sql:24-58)
        T.StructField("traffic_source", T.StringType()),
        T.StructField("traffic_medium", T.StringType()),
        T.StructField("campaign_name", T.StringType()),
        T.StructField("device_category", T.StringType()),
        T.StructField("operating_system", T.StringType()),
        T.StructField("browser", T.StringType()),
        T.StructField("language", T.StringType()),
        T.StructField("is_limited_ad_tracking", T.StringType()),
        T.StructField("time_zone_offset_seconds", T.LongType()),
        T.StructField("continent", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("region", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("app_id", T.StringType()),
        T.StructField("app_version", T.StringType()),
        T.StructField("platform", T.StringType()),  # sql:61
        T.StructField("stream_id", T.StringType()),  # sql:64
        # ecommerce (sql:67-77)
        T.StructField("total_item_quantity", T.LongType()),
        T.StructField("purchase_revenue_in_usd", T.DoubleType()),
        T.StructField("purchase_revenue", T.DoubleType()),
        T.StructField("refund_value", T.DoubleType()),
        T.StructField("shipping_value", T.DoubleType()),
        T.StructField("tax_value", T.DoubleType()),
        T.StructField("unique_items", T.LongType()),
        T.StructField("transaction_id", T.StringType()),
        T.StructField("items", T.ArrayType(GA4_ITEM)),  # sql:80
        # privacy + trailing fields (sql:83-95)
        T.StructField("analytics_storage", T.StringType()),
        T.StructField("ads_storage", T.StringType()),
        T.StructField("uses_transient_token", T.StringType()),
        T.StructField("is_active_user", T.BooleanType()),
    ]
)


# --- Raw nested GA4 export schema (source side of the extraction) -----------
# The shape of Google's BigQuery GA4 export tables (events_YYYYMMDD) that the
# reference queries against — its extraction SQL flattens this to GA4_EVENTS
# (/root/reference/config/queries/extract_events.sql:5-95). Types follow the
# public GA4 export schema documentation.

_GA4_WEB_INFO = T.StructType(
    [
        T.StructField("browser", T.StringType()),
        T.StructField("browser_version", T.StringType()),
        T.StructField("hostname", T.StringType()),
    ]
)

_GA4_DEVICE = T.StructType(
    [
        T.StructField("category", T.StringType()),
        T.StructField("mobile_brand_name", T.StringType()),
        T.StructField("mobile_model_name", T.StringType()),
        T.StructField("mobile_marketing_name", T.StringType()),
        T.StructField("mobile_os_hardware_model", T.StringType()),
        T.StructField("operating_system", T.StringType()),
        T.StructField("operating_system_version", T.StringType()),
        T.StructField("vendor_id", T.StringType()),
        T.StructField("advertising_id", T.StringType()),
        T.StructField("language", T.StringType()),
        T.StructField("is_limited_ad_tracking", T.StringType()),
        T.StructField("time_zone_offset_seconds", T.LongType()),
        T.StructField("browser", T.StringType()),
        T.StructField("browser_version", T.StringType()),
        T.StructField("web_info", _GA4_WEB_INFO),
    ]
)

_GA4_GEO = T.StructType(
    [
        T.StructField("continent", T.StringType()),
        T.StructField("country", T.StringType()),
        T.StructField("region", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("sub_continent", T.StringType()),
        T.StructField("metro", T.StringType()),
    ]
)

_GA4_APP_INFO = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("version", T.StringType()),
        T.StructField("install_store", T.StringType()),
        T.StructField("firebase_app_id", T.StringType()),
        T.StructField("install_source", T.StringType()),
    ]
)

_GA4_ECOMMERCE = T.StructType(
    [
        T.StructField("total_item_quantity", T.LongType()),
        T.StructField("purchase_revenue_in_usd", T.DoubleType()),
        T.StructField("purchase_revenue", T.DoubleType()),
        T.StructField("refund_value_in_usd", T.DoubleType()),
        T.StructField("refund_value", T.DoubleType()),
        T.StructField("shipping_value_in_usd", T.DoubleType()),
        T.StructField("shipping_value", T.DoubleType()),
        T.StructField("tax_value_in_usd", T.DoubleType()),
        T.StructField("tax_value", T.DoubleType()),
        T.StructField("unique_items", T.LongType()),
        T.StructField("transaction_id", T.StringType()),
    ]
)

_GA4_PRIVACY_INFO = T.StructType(
    [
        T.StructField("analytics_storage", T.StringType()),
        T.StructField("ads_storage", T.StringType()),
        T.StructField("uses_transient_token", T.StringType()),
    ]
)

_GA4_COLLECTED_TRAFFIC = T.StructType(
    [
        T.StructField("manual_campaign_id", T.StringType()),
        T.StructField("manual_campaign_name", T.StringType()),
        T.StructField("manual_source", T.StringType()),
        T.StructField("manual_medium", T.StringType()),
        T.StructField("gclid", T.StringType()),
        T.StructField("dclid", T.StringType()),
        T.StructField("srsltid", T.StringType()),
    ]
)

_GA4_LAST_CLICK = T.StructType(
    [
        T.StructField(
            "manual_campaign",
            T.StructType(
                [
                    T.StructField("campaign_id", T.StringType()),
                    T.StructField("campaign_name", T.StringType()),
                    T.StructField("source", T.StringType()),
                    T.StructField("medium", T.StringType()),
                ]
            ),
        ),
    ]
)

GA4_EXPORT_RAW = T.StructType(
    [
        T.StructField("event_date", T.StringType()),
        T.StructField("event_timestamp", T.LongType()),
        T.StructField("event_name", T.StringType()),
        T.StructField(
            "event_params",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("value", _GA4_PARAM_VALUE),
                    ]
                )
            ),
        ),
        T.StructField("event_previous_timestamp", T.LongType()),
        T.StructField("event_value_in_usd", T.DoubleType()),
        T.StructField("event_bundle_sequence_id", T.LongType()),
        T.StructField("event_server_timestamp_offset", T.LongType()),
        T.StructField("user_id", T.StringType()),
        T.StructField("user_pseudo_id", T.StringType()),
        T.StructField(
            "user_properties",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("value", _GA4_USER_PROP_VALUE),
                    ]
                )
            ),
        ),
        T.StructField("user_first_touch_timestamp", T.LongType()),
        T.StructField(
            "user_ltv",
            T.StructType(
                [
                    T.StructField("revenue", T.DoubleType()),
                    T.StructField("currency", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "traffic_source",
            T.StructType(
                [
                    T.StructField("source", T.StringType()),
                    T.StructField("medium", T.StringType()),
                    T.StructField("name", T.StringType()),
                ]
            ),
        ),
        T.StructField("device", _GA4_DEVICE),
        T.StructField("geo", _GA4_GEO),
        T.StructField("app_info", _GA4_APP_INFO),
        T.StructField("platform", T.StringType()),
        T.StructField("stream_id", T.StringType()),
        T.StructField("ecommerce", _GA4_ECOMMERCE),
        T.StructField("items", T.ArrayType(GA4_ITEM)),
        T.StructField("privacy_info", _GA4_PRIVACY_INFO),
        T.StructField(
            "event_dimensions",
            T.StructType([T.StructField("hostname", T.StringType())]),
        ),
        T.StructField("collected_traffic_source", _GA4_COLLECTED_TRAFFIC),
        T.StructField("is_active_user", T.BooleanType()),
        T.StructField("batch_event_index", T.LongType()),
        T.StructField("batch_page_id", T.LongType()),
        T.StructField("batch_ordering_id", T.LongType()),
        T.StructField("session_traffic_source_last_click", _GA4_LAST_CLICK),
        T.StructField(
            "publisher",
            T.StructType([T.StructField("ad_revenue_in_usd", T.DoubleType())]),
        ),
    ]
)
