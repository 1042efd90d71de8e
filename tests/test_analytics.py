"""Unit tests for gold analytics (SURVEY.md §2c): funnel ordering semantics,
sessionization gap logic, attribution models, cohorts, param extraction."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from commerce_data_pipeline_spark.operators import analytics as A


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double"
    )


def ts(minute, second=0):
    return datetime(2024, 1, 1, 10, minute, second)


@pytest.fixture()
def events(spark):
    return _ev(
        spark,
        [
            # user 1: full funnel, in order
            (1, ts(0), "view", 0.0),
            (1, ts(1), "click", 0.0),
            (1, ts(2), "purchase", 9.99),
            # user 2: drops off after click
            (2, ts(0), "view", 0.0),
            (2, ts(1), "click", 0.0),
            # user 3: purchase BEFORE view → must not count as funnel purchase
            (3, ts(0), "purchase", 5.0),
            (3, ts(1), "view", 0.0),
            (3, ts(2), "click", 0.0),
        ],
    )


def test_funnel_ordering_semantics(events):
    out = {r["stage"]: r["users"] for r in A.funnel(events, ("view", "click", "purchase")).collect()}
    assert out == {"view": 3, "click": 3, "purchase": 1}


def test_funnel_user_flags(events):
    flags = {r["user_id"]: r for r in A.funnel_user_flags(events, ("view", "purchase")).collect()}
    assert flags[1]["did_view"] == 1 and flags[1]["did_purchase"] == 1
    assert flags[2]["did_purchase"] == 0
    assert flags[3]["did_purchase"] == 1  # unordered variant ignores order


def test_sessionize_gap_boundary(spark):
    df = _ev(
        spark,
        [
            (1, datetime(2024, 1, 1, 10, 0, 0), "view", 0.0),
            # exactly 30min later: NOT a new session (> comparison, not >=)
            (1, datetime(2024, 1, 1, 10, 30, 0), "view", 0.0),
            # 30min + 1µs: new session
            (1, datetime(2024, 1, 1, 11, 0, 0, 1), "view", 0.0),
        ],
    )
    out = A.sessionize(df, gap_minutes=30).orderBy("ts").collect()
    assert [r["session_seq"] for r in out] == [1, 1, 2]


def test_session_stats(spark):
    df = _ev(
        spark,
        [
            (1, ts(0), "view", 0.0),
            (1, ts(5), "click", 0.0),
            (1, ts(59), "view", 0.0),  # > 30min gap → session 2
        ],
    )
    out = A.session_stats(df).orderBy("session_seq").collect()
    assert len(out) == 2
    assert out[0]["n_events"] == 2
    assert out[0]["duration_sec"] == 300.0
    assert out[1]["n_events"] == 1


def test_attribution_last_and_first(events):
    last = A.attribution(events, "purchase", model="last").collect()
    # user 1: last non-purchase touch before purchase is click@10:01
    u1 = [r for r in last if r["user_id"] == 1][0]
    assert u1["touch_type"] == "click"
    # user 3 purchased before any touch → NULL attribution
    u3 = [r for r in last if r["user_id"] == 3][0]
    assert u3["touch_type"] is None

    first = A.attribution(events, "purchase", model="first").collect()
    u1f = [r for r in first if r["user_id"] == 1][0]
    assert u1f["touch_type"] == "view"


def test_conversion_metrics(events):
    out = A.conversion_metrics(events, "purchase").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_events"] == 8
    assert r["n_users"] == 3
    assert r["n_converters"] == 2
    assert abs(r["converted_value"] - 14.99) < 1e-9
    assert abs(r["conversion_rate"] - 2 / 3) < 1e-12


def test_cohort_retention(spark):
    df = _ev(
        spark,
        [
            (1, datetime(2024, 1, 1), "view", 0.0),   # cohort week of 2024-01-01
            (1, datetime(2024, 1, 10), "view", 0.0),  # next week → offset 1
            (2, datetime(2024, 1, 10), "view", 0.0),  # cohort week of 2024-01-08
        ],
    )
    out = {(r["cohort"], r["period_offset"]): r["active_users"] for r in A.cohort_retention(df).collect()}
    assert out[("2024-01-01", 0)] == 1
    assert out[("2024-01-01", 1)] == 1
    assert out[("2024-01-08", 0)] == 1


def test_extract_param(spark):
    df = spark.createDataFrame([('{"k": 42, "s": "x"}',), ("{}",)], "props string")
    out = A.extract_param(df, "props", "k", "k", "long").collect()
    assert out[0]["k"] == 42
    assert out[1]["k"] is None
