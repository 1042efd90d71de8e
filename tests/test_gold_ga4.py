"""GA4 gold layer end-to-end: silver projection + the README-promised
analytics over the declared GA4 schema."""

import pytest
from pyspark.sql import Row, functions as F

from commerce_data_pipeline_spark import gold_ga4 as G
from commerce_data_pipeline_spark.schemas import GA4_EVENTS

US = 1_000_000
T0 = 1704100000 * US


def _param(key, string_value=None, int_value=None):
    return Row(
        key=key,
        value=Row(
            string_value=string_value, int_value=int_value,
            float_value=None, double_value=None,
        ),
    )


def _ev(user, name, offset_s, session=1, revenue=None, source="google"):
    # bronze rows are struct-flattened (the reference's extraction SQL
    # aliases nested members at source) — so flat columns here
    base = {f.name: None for f in GA4_EVENTS.fields}
    base.update(
        event_date="20240101",
        event_timestamp=T0 + offset_s * US,
        event_name=name,
        user_pseudo_id=user,
        event_params=[
            _param("ga_session_id", int_value=session),
            _param("page_location", string_value=f"https://shop/{name}"),
        ],
        traffic_source=source,
        traffic_medium="cpc",
        purchase_revenue=revenue,
    )
    return Row(**base)


@pytest.fixture(scope="module")
def silver(spark):
    rows = [
        # u1: full ordered funnel, one session
        _ev("u1", "page_view", 0),
        _ev("u1", "add_to_cart", 60),
        _ev("u1", "purchase", 120, revenue=25.0),
        # u2: page_view then cart, no purchase; second session 2h later
        _ev("u2", "page_view", 0, source="newsletter"),
        _ev("u2", "add_to_cart", 30, source="newsletter"),
        _ev("u2", "page_view", 7200, session=2, source="newsletter"),
        # u3: cart BEFORE view → must not count as ordered stage-2
        _ev("u3", "add_to_cart", 0),
        _ev("u3", "page_view", 60),
    ]
    df = spark.createDataFrame(rows, GA4_EVENTS)
    return G.ga4_silver(df)


def test_silver_projection(silver):
    r = silver.filter(F.col("event_name") == "purchase").collect()[0]
    assert r["user_id"] == "u1"
    assert r["revenue"] == 25.0
    assert r["ga_session_id"] == 1
    assert r["traffic_source"] == "google"
    assert r["page_location"] == "https://shop/purchase"


def test_ga4_funnel_ordering(silver):
    out = {r["stage"]: r["users"] for r in G.ga4_funnel(silver).collect()}
    # u1,u2,u3 all viewed; only u1,u2 carted AFTER viewing; only u1 purchased
    assert out == {"page_view": 3, "add_to_cart": 2, "purchase": 1}


def test_ga4_sessions_gap(silver):
    sess = G.ga4_sessions(silver, gap_minutes=30).collect()
    per_user = {}
    for r in sess:
        per_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(per_user["u2"]) == [1, 2]  # 2h gap splits u2
    assert per_user["u1"] == [3]


def test_ga4_conversion_daily(silver):
    r = G.ga4_conversion_daily(silver).collect()[0]
    assert r["n_users"] == 3 and r["n_converters"] == 1
    assert abs(r["converted_value"] - 25.0) < 1e-9
    assert abs(r["conversion_rate"] - 1 / 3) < 1e-9


def test_ga4_attribution_last_touch(silver):
    out = G.ga4_attribution(silver, model="last").collect()
    assert len(out) == 1
    assert out[0]["user_id"] == "u1" and out[0]["touch_type"] == "add_to_cart"


def test_ga4_cohorts_single_week(silver):
    out = G.ga4_cohorts(silver).collect()
    assert len(out) == 1 and out[0]["active_users"] == 3 and out[0]["period_offset"] == 0


def test_ga4_silver_runs_on_stream(spark, tmp_path):
    """The silver projection is a pure map — identical code path on a
    Structured Streaming source (bronze → silver unification)."""
    rows = [_ev("u1", "page_view", 0), _ev("u1", "purchase", 60, revenue=9.0)]
    src = str(tmp_path / "ga4_bronze")
    spark.createDataFrame(rows, GA4_EVENTS).write.parquet(src)

    stream = spark.readStream.schema(GA4_EVENTS).parquet(src)
    silver_stream = G.ga4_silver(stream)
    assert silver_stream.isStreaming
    q = (
        silver_stream.writeStream.format("memory")
        .queryName("ga4_silver_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM ga4_silver_stream").collect()
    assert len(out) == 2
    got = {r["event_name"]: r for r in out}
    assert got["purchase"]["revenue"] == 9.0
    assert got["page_view"]["ga_session_id"] == 1


def test_funnel_by_source(silver):
    out = {r["traffic_source"]: r for r in G.ga4_page_funnel_by_source(silver).collect()}
    assert out["google"]["users_page_view"] == 2      # u1, u3
    assert out["google"]["users_add_to_cart"] == 1    # u1 only (u3 carted first)
    assert out["google"]["users_purchase"] == 1
    assert out["newsletter"]["users_page_view"] == 1
    assert out["newsletter"]["users_purchase"] == 0
