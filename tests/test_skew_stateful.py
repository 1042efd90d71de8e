"""Skew utilities and the applyInPandasWithState stateful sessionizer."""

from datetime import datetime

from pyspark.sql import functions as F

from commerce_data_pipeline_spark.operators import skew
from commerce_data_pipeline_spark.operators.analytics import sessionize
from commerce_data_pipeline_spark.schemas import EVENTS
from commerce_data_pipeline_spark.streaming import stateful


def _skewed(spark):
    # key 1 holds 90% of rows
    rows = [(1, i) for i in range(90)] + [(k, k * 1000) for k in range(2, 12)]
    return spark.createDataFrame(rows, "k long, payload long")


def test_key_skew_profile(spark):
    prof = skew.key_skew_profile(_skewed(spark), "k", top=3).collect()
    assert prof[0]["key"] == 1 and prof[0]["n"] == 90
    assert abs(prof[0]["share"] - 0.9) < 1e-9


def test_salted_join_matches_plain_join(spark):
    large = _skewed(spark)
    small = spark.createDataFrame([(k, f"dim{k}") for k in range(1, 8)], "k long, name string")
    plain = large.join(small, on="k").select("k", "payload", "name")
    salted = skew.salted_join(large, small, on="k", n_salts=4).select("k", "payload", "name")
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(plain) == key(salted)


def test_salted_left_join(spark):
    large = _skewed(spark)
    small = spark.createDataFrame([(1, "one")], "k long, name string")
    plain = large.join(small, on="k", how="left").select("k", "payload", "name")
    salted = skew.salted_join(large, small, on="k", n_salts=4, how="left").select(
        "k", "payload", "name"
    )
    key = lambda df: sorted(map(lambda r: tuple(r), df.collect()), key=str)
    assert key(plain) == key(salted)


def test_salted_count_distinct(spark):
    rows = [(1, v % 7) for v in range(100)] + [(2, v) for v in range(5)]
    df = spark.createDataFrame(rows, "g long, v long")
    got = {
        r["g"]: r["n_distinct"]
        for r in skew.salted_count_distinct(df, "g", "v", n_salts=4).collect()
    }
    assert got == {1: 7, 2: 5}


def _events(spark):
    rows = [
        (1, datetime(2024, 1, 1, 10, 0), 1, "view", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 10, 10), 1, "click", 1.0, "{}"),
        (3, datetime(2024, 1, 1, 11, 0), 1, "view", 1.0, "{}"),   # gap >30m → new session
        (4, datetime(2024, 1, 2, 9, 0), 2, "view", 2.0, "{}"),
    ]
    return spark.createDataFrame(rows, EVENTS)


def test_fold_batch_matches_window_sessionize(spark):
    df = _events(spark)
    folded = stateful.sessionize_fold_batch(df, gap_minutes=30)
    batch = (
        sessionize(df, gap_minutes=30)
        .groupBy("user_id", "session_seq")
        .agg(
            F.unix_micros(F.min("ts")).alias("s"),
            F.unix_micros(F.max("ts")).alias("e"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    got = sorted(
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in folded.collect()
    )
    want = sorted((r["user_id"], r["s"], r["e"], r["n"]) for r in batch.collect())
    assert got == want


def test_stateful_streaming_sessions(spark, tmp_path):
    """Real micro-batch run of applyInPandasWithState over a file source."""
    src = str(tmp_path / "in")
    _events(spark).write.parquet(src)

    stream = (
        spark.readStream.schema(EVENTS).parquet(src).withWatermark("ts", "1 hour")
    )
    sess = stateful.sessionize_stateful(stream, gap_minutes=30, idle_timeout_minutes=60)
    q = (
        sess.writeStream.format("memory")
        .queryName("stateful_sessions")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM stateful_sessions").collect()
    by = {(r["user_id"], r["status"], r["session_start_us"]): r for r in rows}

    us = lambda dt: int(dt.timestamp() * 1_000_000)
    t0 = us(datetime(2024, 1, 1, 10, 0))
    t1 = us(datetime(2024, 1, 1, 10, 10))
    t2 = us(datetime(2024, 1, 1, 11, 0))
    t3 = us(datetime(2024, 1, 2, 9, 0))

    closed = by[(1, "closed", t0)]
    assert closed["session_end_us"] == t1 and closed["n_events"] == 2
    open1 = by[(1, "open", t2)]
    assert open1["n_events"] == 1
    open2 = by[(2, "open", t3)]
    assert open2["n_events"] == 1


def test_join_profile_overlap_orphans_cardinality(spark):
    from commerce_data_pipeline_spark.operators.skew import join_profile

    left = spark.createDataFrame([(k,) for k in [1, 1, 1, 2, 3]], ["k"])
    right = spark.createDataFrame([(k,) for k in [1, 2, 2, 4]], ["k"])
    r = join_profile(left, right, "k").collect()[0]
    assert (r["n_keys_left"], r["n_keys_right"], r["n_shared"]) == (3, 3, 2)
    assert (r["orphans_left"], r["orphans_right"]) == (1, 1)
    assert (r["max_mult_left"], r["max_mult_right"]) == (3, 2)
    # shared keys: 1 -> 3*1, 2 -> 1*2
    assert r["est_join_rows"] == 5


def test_guarded_join_passes_and_matches_plain_join(spark):
    l = spark.createDataFrame([(1, "a"), (2, "b"), (2, "c")], ["k", "lv"])
    r = spark.createDataFrame([(2, "x"), (3, "y")], ["k", "rv"])
    out = skew.guarded_join(l, r, "k", max_rows=10)
    plain = l.join(r, on="k")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, plain.collect()))


def test_guarded_join_refuses_explosion_with_audit(spark):
    import pytest

    # 100 x 100 on one hot key = 10,000 output rows
    l = spark.createDataFrame([(1, i) for i in range(100)], ["k", "lv"])
    r = spark.createDataFrame([(1, i) for i in range(100)], ["k", "rv"])
    with pytest.raises(ValueError) as e:
        skew.guarded_join(l, r, "k", max_rows=5000)
    msg = str(e.value)
    assert "10000" in msg and "est_join_rows" in msg  # the audit row is shown


def test_guarded_join_left_counts_orphans(spark):
    import pytest

    l = spark.createDataFrame([(1, "a"), (9, "orphan")], ["k", "lv"])
    r = spark.createDataFrame([(1, "x")], ["k", "rv"])
    # inner part = 1 row, left orphans = 1 -> expected 2 > max_rows 1
    with pytest.raises(ValueError):
        skew.guarded_join(l, r, "k", max_rows=1, how="left")
    out = skew.guarded_join(l, r, "k", max_rows=2, how="left")
    assert out.count() == 2


def test_guarded_join_routes_through_salting(spark):
    l = spark.createDataFrame([(1, i) for i in range(50)] + [(2, 99)], ["k", "lv"])
    r = spark.createDataFrame([(1, "hot"), (2, "cold")], ["k", "rv"])
    out = skew.guarded_join(l, r, "k", max_rows=1000, salt_threshold=10, n_salts=4)
    plain = l.join(r, on="k")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, plain.collect()))
