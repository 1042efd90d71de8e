"""As-of and band join operators (operators/temporal.py)."""

from datetime import datetime

from pyspark.sql import functions as F

from commerce_data_pipeline_spark.operators import temporal


def _t(m, s=0):
    return datetime(2024, 1, 1, 10, m, s)


def test_asof_backward_basic(spark):
    quotes = spark.createDataFrame(
        [(1, _t(0), 100.0), (1, _t(10), 101.0), (2, _t(5), 50.0)],
        "sym long, ts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [(1, _t(5), 7), (1, _t(10), 8), (1, _t(20), 9), (2, _t(0), 10)],
        "sym long, ts timestamp, qty long",
    )
    out = temporal.asof_join(trades, quotes, on="sym", right_cols=["px"])
    got = {r["qty"]: r["px_matched"] for r in out.collect()}
    # trade@10:05 sees quote@10:00; trade@10:10 sees the equal-ts quote;
    # trade@10:20 sees quote@10:10; sym 2's trade precedes any quote → null
    assert got == {7: 100.0, 8: 101.0, 9: 101.0, 10: None}


def test_asof_tolerance(spark):
    quotes = spark.createDataFrame([(1, _t(0), 100.0)], "sym long, ts timestamp, px double")
    trades = spark.createDataFrame(
        [(1, _t(1), 7), (1, _t(30), 8)], "sym long, ts timestamp, qty long"
    )
    out = temporal.asof_join(
        trades, quotes, on="sym", right_cols=["px"], tolerance_seconds=300
    )
    got = {r["qty"]: r["px_matched"] for r in out.collect()}
    assert got == {7: 100.0, 8: None}  # 29 min > 5 min tolerance


def test_asof_matches_pandas_merge_asof(spark):
    import pandas as pd

    left = pd.DataFrame(
        {"k": [1] * 6, "ts": pd.to_datetime(["2024-01-01 10:%02d:00" % m for m in range(0, 60, 10)])}
    )
    right = pd.DataFrame(
        {
            "k": [1] * 4,
            "ts": pd.to_datetime(["2024-01-01 10:%02d:30" % m for m in (5, 15, 25, 35)]),
            "v": [1.0, 2.0, 3.0, 4.0],
        }
    )
    expected = pd.merge_asof(left.sort_values("ts"), right.sort_values("ts"), on="ts", by="k")
    sl = spark.createDataFrame(left)
    sr = spark.createDataFrame(right)
    out = temporal.asof_join(sl, sr, on="k", right_cols=["v"]).orderBy("ts").collect()
    got = [r["v_matched"] for r in out]
    want = [None if pd.isna(v) else v for v in expected["v"]]
    assert got == want


def test_band_join_pairs_exact_and_no_dupes(spark):
    ev = spark.createDataFrame(
        [
            (1, 1, _t(0, 0)),
            (1, 2, _t(0, 45)),   # 45 s after e1 → within 60 s
            (1, 3, _t(2, 0)),    # 75 s after e2 → out of band
            (2, 4, _t(0, 0)),
        ],
        "user_id long, event_id long, ts timestamp",
    )
    pairs = (
        temporal.band_join(ev, ev, on="user_id", band_seconds=60)
        .filter(F.col("a_event_id") < F.col("b_event_id"))
        .select("a_event_id", "b_event_id")
        .collect()
    )
    assert sorted((r[0], r[1]) for r in pairs) == [(1, 2)]


def test_band_join_boundary_inclusive(spark):
    a = spark.createDataFrame([(1, 1, _t(0, 0))], "k long, id long, ts timestamp")
    b = spark.createDataFrame([(1, 2, _t(1, 0))], "k long, id long, ts timestamp")
    got = temporal.band_join(a, b, on="k", band_seconds=60).count()
    assert got == 1  # exactly 60 s apart → included
    got2 = temporal.band_join(a, b, on="k", band_seconds=59).count()
    assert got2 == 0


# ---------------------------------------------------------------------------
# resample_ffill
# ---------------------------------------------------------------------------

def _h(h, m=0, s=0):
    return datetime(2024, 1, 1, h, m, s)


def _events(spark, rows):
    return spark.createDataFrame(rows, ["event_id", "event_type", "ts", "value"])


def test_resample_ffill_fills_gaps(spark):
    ev = _events(
        spark,
        [
            (1, "a", _h(10, 5), 1.0),
            (2, "a", _h(13, 30), 4.0),  # hours 11,12 are gaps
            (3, "b", _h(11, 0), 9.0),
        ],
    )
    out = temporal.resample_ffill(ev, unit="hour")
    rows = {(r["event_type"], r["bucket_s"]): r for r in out.collect()}
    # global span 10:00..13:00 → 4 buckets × 2 keys
    assert len(rows) == 8
    h10 = int(_h(10).timestamp())
    a = [rows[("a", h10 + 3600 * i)] for i in range(4)]
    assert [r["value_ffill"] for r in a] == [1.0, 1.0, 1.0, 4.0]
    assert [r["is_observed"] for r in a] == [True, False, False, True]
    assert [r["n_obs"] for r in a] == [1, 0, 0, 1]
    # key b: null before its first observation (no backfill), then carried
    b = [rows[("b", h10 + 3600 * i)] for i in range(4)]
    assert [r["value_ffill"] for r in b] == [None, 9.0, 9.0, 9.0]


def test_resample_pick_is_last_by_ts_then_id(spark):
    ev = _events(
        spark,
        [
            (5, "a", _h(10, 0), 1.0),
            (7, "a", _h(10, 59), 2.0),   # latest ts wins
            (6, "a", _h(10, 59), 3.0),   # same ts, lower id loses
        ],
    )
    row = temporal.resample_ffill(ev, unit="hour").collect()[0]
    assert row["value_ffill"] == 2.0
    assert row["n_obs"] == 3


def test_resample_single_shuffle_for_observations(spark):
    ev = _events(spark, [(1, "a", _h(10), 1.0), (2, "b", _h(11), 2.0)])
    plan = (
        temporal.resample_ffill(ev, unit="hour")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the count + row_number pick must share one window (no second
    # corpus-sized exchange for n_obs)
    assert plan.count("Window") <= 3  # pick window, fill window (+AQE reuse)


# ---------------------------------------------------------------------------
# scd2_intervals
# ---------------------------------------------------------------------------

def test_scd2_collapses_runs_and_links_intervals(spark):
    ev = spark.createDataFrame(
        [
            (1, "u1", _h(10, 0), "view"),
            (2, "u1", _h(10, 5), "view"),     # same state → same version
            (3, "u1", _h(10, 9), "cart"),     # change
            (4, "u1", _h(11, 0), "view"),     # change back → NEW version
            (5, "u2", _h(10, 0), "buy"),
        ],
        ["event_id", "user_id", "ts", "event_type"],
    )
    from commerce_data_pipeline_spark.operators.temporal import scd2_intervals

    out = scd2_intervals(ev).collect()
    u1 = sorted(
        [r for r in out if r["user_id"] == "u1"], key=lambda r: r["valid_from_us"]
    )
    assert [r["event_type"] for r in u1] == ["view", "cart", "view"]
    assert [r["n_events"] for r in u1] == [2, 1, 1]
    # intervals chain: each valid_to equals the next valid_from
    assert u1[0]["valid_to_us"] == u1[1]["valid_from_us"]
    assert u1[1]["valid_to_us"] == u1[2]["valid_from_us"]
    assert [r["is_current"] for r in u1] == [False, False, True]
    u2 = [r for r in out if r["user_id"] == "u2"]
    assert len(u2) == 1 and u2[0]["is_current"] and u2[0]["valid_to_us"] is None


def test_scd2_tie_on_ts_breaks_by_id(spark):
    ev = spark.createDataFrame(
        [
            (2, "u1", _h(10), "b"),
            (1, "u1", _h(10), "a"),  # same ts: id order decides a → b
        ],
        ["event_id", "user_id", "ts", "event_type"],
    )
    from commerce_data_pipeline_spark.operators.temporal import scd2_intervals

    out = sorted(scd2_intervals(ev).collect(), key=lambda r: not r["is_current"])
    assert [r["event_type"] for r in out] == ["b", "a"]


def test_scd2_single_key_shuffle(spark):
    ev = spark.createDataFrame(
        [(1, "u1", _h(10), "a")], ["event_id", "user_id", "ts", "event_type"]
    )
    from commerce_data_pipeline_spark.operators.temporal import scd2_intervals

    plan = scd2_intervals(ev)._jdf.queryExecution().executedPlan().toString()
    import re
    # all exchanges hash-partition on the key — nothing global, no joins
    assert "Join" not in plan


def test_asof_carries_legit_null_payload(spark):
    """A right row whose payload value is legitimately NULL must carry that
    NULL forward — not resurrect the previous row's value (the per-column
    last(ignorenulls) trap the struct-carry fixes)."""
    right = spark.createDataFrame(
        [(1, _t(0), 100.0), (1, _t(10), None)], "sym long, ts timestamp, px double"
    )
    left = spark.createDataFrame([(1, _t(20), 7)], "sym long, ts timestamp, qty long")
    out = temporal.asof_join(left, right, on="sym", right_cols=["px"]).collect()
    assert out[0]["ts_matched"] == _t(10)
    assert out[0]["px_matched"] is None  # NOT 100.0


def test_scd2_lookup_point_in_time(spark):
    ev = spark.createDataFrame(
        [
            (1, "u1", _h(10), "a"),
            (2, "u1", _h(11), "b"),
            (3, "u1", _h(12), "b"),
            (4, "u1", _h(13), "c"),
        ],
        ["event_id", "user_id", "ts", "event_type"],
    )
    dim = temporal.scd2_intervals(ev)
    facts = spark.createDataFrame(
        [
            (100, "u1", _h(10, 30)),  # inside version a
            (101, "u1", _h(11)),      # exactly at version b's start
            (102, "u1", _h(23)),      # inside the open (current) version c
            (103, "u1", _h(9)),       # before any version: no match
        ],
        ["fact_id", "user_id", "ts"],
    )
    out = {
        r["fact_id"]: r
        for r in temporal.scd2_lookup(
            facts, dim, on="user_id",
            dim_cols=["event_type", "valid_to_us", "n_events"],
        ).collect()
    }
    assert out[100]["event_type_dim"] == "a"
    assert out[101]["event_type_dim"] == "b" and out[101]["n_events_dim"] == 2
    # current version: state c, open valid_to stays NULL (struct-carry fix)
    assert out[102]["event_type_dim"] == "c"
    assert out[102]["valid_to_us_dim"] is None
    assert out[103]["event_type_dim"] is None


def test_scd2_lookup_gapped_history_nulls_stale_version(spark):
    """A fact after a version's end but with no successor version (gapped /
    deleted history) must get NULL, not the stale closed version."""
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        [(1, "u1", _h(10), "a"), (2, "u1", _h(11), "b")],
        ["event_id", "user_id", "ts", "event_type"],
    )
    # keep only the CLOSED version 'a' → its valid_to is h(11)
    dim = temporal.scd2_intervals(ev).filter(F.col("event_type") == "a")
    facts = spark.createDataFrame([(100, "u1", _h(12))], ["fact_id", "user_id", "ts"])
    out = temporal.scd2_lookup(
        facts, dim, on="user_id", dim_cols=["event_type", "valid_to_us", "n_events"]
    ).collect()
    assert out[0]["event_type_dim"] is None
    assert out[0]["valid_from_us_dim"] is None


def test_time_decayed_sum_halving_and_future_exclusion(spark):
    import math

    from commerce_data_pipeline_spark.operators.temporal import time_decayed_sum

    df = spark.createDataFrame(
        [
            (1, 100.0, "2020-01-01"),   # age 365 at anchor -> factor 0.5
            (1, 100.0, "2020-12-31"),   # age 0 -> factor 1.0
            (2, 100.0, "2021-06-01"),   # future -> excluded
            (2, 50.0, "2019-01-01"),
        ],
        ["g", "v", "d"],
    )
    out = {r["g"]: r for r in time_decayed_sum(
        df, "v", "d", "g", anchor_date="2020-12-31", half_life_days=365.0
    ).collect()}
    # group 1: floor(1e4*100*0.5) + floor(1e4*100*1.0); 2020 is a leap
    # year so age is exactly 365 days -> factor exactly 0.5
    assert out[1]["n_rows"] == 2
    assert out[1]["decayed_e4"] == 500000 + 1000000
    # group 2: the future row is excluded; remaining age = 730 days
    assert out[2]["n_rows"] == 1
    expect = math.floor(50.0 * math.exp(math.log(0.5) * 730.0 / 365.0) * 10000.0)
    assert out[2]["decayed_e4"] == expect
