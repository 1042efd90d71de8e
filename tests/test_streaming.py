"""Structured Streaming tests: real micro-batch execution against a file
source, plus batch/streaming parity of the shared transforms."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from commerce_data_pipeline_spark.operators.analytics import sessionize
from commerce_data_pipeline_spark.schemas import EVENTS
from commerce_data_pipeline_spark.operators import profiling as PR
from commerce_data_pipeline_spark.streaming import events as SE


def _events_df(spark):
    rows = [
        (1, datetime(2024, 1, 1, 10, 0), 1, "view", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 10, 10), 1, "purchase", 5.0, "{}"),
        (3, datetime(2024, 1, 1, 11, 0), 1, "view", 1.0, "{}"),   # >30min gap → session 2
        (4, datetime(2024, 1, 2, 9, 0), 2, "view", 2.0, "{}"),
    ]
    return spark.createDataFrame(rows, EVENTS)


def test_daily_counts_batch_semantics(spark):
    out = SE.daily_event_counts(_events_df(spark)).collect()
    got = {(r["day"], r["event_type"]): (r["n_events"], r["total_value"]) for r in out}
    assert got[("2024-01-01", "view")] == (2, 2.0)
    assert got[("2024-01-01", "purchase")] == (1, 5.0)
    assert got[("2024-01-02", "view")] == (1, 2.0)


def test_session_window_matches_batch_sessionize(spark):
    df = _events_df(spark)
    sw = SE.session_window_stats(df).collect()
    batch = (
        sessionize(df, gap_minutes=30)
        .groupBy("user_id", "session_seq")
        .agg(F.min("ts").alias("session_start"), F.max("ts").alias("session_end"),
             F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    key = lambda rs: sorted((r["user_id"], r["session_start"], r["session_end"], r["n_events"]) for r in rs)
    assert key(sw) == key(batch)


def test_streaming_end_to_end(spark, tmp_path):
    """Genuine streaming run: parquet file source → windowed agg → memory
    sink, availableNow trigger (the backlog-then-stop execution mode)."""
    src_dir = str(tmp_path / "in")
    _events_df(spark).write.parquet(src_dir)

    stream = SE.read_events_stream(spark, src_dir)
    assert stream.isStreaming
    agg = SE.daily_event_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("daily_counts_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM daily_counts_test").collect()
    got = {(r["day"], r["event_type"]): r["n_events"] for r in out}
    assert got[("2024-01-01", "view")] == 2
    assert got[("2024-01-02", "view")] == 1


def test_dedup_stream_drops_redelivery(spark, tmp_path):
    """Duplicate event_ids across micro-batches are dropped within the
    watermark window."""
    rows = [
        (1, datetime(2024, 1, 1, 10, 0), 1, "view", 1.0, "{}"),
        (1, datetime(2024, 1, 1, 10, 0), 1, "view", 1.0, "{}"),   # re-delivery
        (2, datetime(2024, 1, 1, 10, 5), 1, "click", 1.0, "{}"),
        (2, datetime(2024, 1, 1, 10, 5), 1, "click", 1.0, "{}"),  # re-delivery
        (3, datetime(2024, 1, 1, 10, 9), 2, "view", 2.0, "{}"),
    ]
    src = str(tmp_path / "in")
    spark.createDataFrame(rows, EVENTS).write.parquet(src)

    stream = SE.read_events_stream(spark, src)
    deduped = SE.dedup_stream(stream, key_cols=("event_id",), watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT event_id FROM dedup_stream_test").collect()
    assert sorted(r["event_id"] for r in out) == [1, 2, 3]


def test_dedup_stream_batch_fallback(spark):
    df = _events_df(spark)
    doubled = df.unionAll(df)
    assert SE.dedup_stream(doubled).count() == df.count()


def test_maintain_daily_gold_incremental_upsert(spark, tmp_path):
    """foreachBatch gold maintenance: second batch of late-but-in-watermark
    events updates only its day partition; other days stay intact."""
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    gold = str(tmp_path / "gold")

    _events_df(spark).write.parquet(src)
    stream = SE.read_events_stream(spark, src)
    q = SE.maintain_daily_gold(stream, gold, ckpt)
    q.awaitTermination(120)

    first = {
        (r["day"], r["event_type"]): r["n_events"]
        for r in spark.read.parquet(gold).collect()
    }
    assert first[("2024-01-01", "view")] == 2
    assert first[("2024-01-02", "view")] == 1

    # new file: one more 2024-01-02 view → that day's aggregate must update
    more = [(9, datetime(2024, 1, 2, 9, 30), 3, "view", 1.0, "{}")]
    spark.createDataFrame(more, EVENTS).write.mode("append").parquet(src)
    q2 = SE.maintain_daily_gold(SE.read_events_stream(spark, src), gold, ckpt)
    q2.awaitTermination(120)

    second = {
        (r["day"], r["event_type"]): r["n_events"]
        for r in spark.read.parquet(gold).collect()
    }
    assert second[("2024-01-02", "view")] == 2   # updated in place
    assert second[("2024-01-01", "view")] == 2   # untouched partition intact
    assert second[("2024-01-01", "purchase")] == 1


def test_streaming_bronze_sink(spark, tmp_path):
    src_dir = str(tmp_path / "in")
    _events_df(spark).write.parquet(src_dir)
    out_dir = str(tmp_path / "bronze")

    stream = SE.read_events_stream(spark, src_dir)
    q = SE.write_stream_to_bronze(stream, out_dir, str(tmp_path / "ckpt2"))
    q.awaitTermination(120)
    back = spark.read.parquet(out_dir)
    assert back.count() == 4
    # partition discovery type-infers event_day=2024-01-01 as DateType;
    # compare on the string form
    days = {
        r["d"]
        for r in back.select(F.col("event_day").cast("string").alias("d")).distinct().collect()
    }
    assert days == {"2024-01-01", "2024-01-02"}


def test_sliding_window_stream_matches_batch(spark, tmp_path):
    """The sliding_counts registry shape as a REAL stream: 1h windows at a
    30min slide over a file source must produce the same per-window
    counts as the batch groupBy(window(...)) twin — each event lands in
    exactly two epoch-aligned windows in both modes."""
    from pyspark.sql import functions as F

    src_dir = str(tmp_path / "in")
    df = _events_df(spark)
    df.write.parquet(src_dir)

    def agg(frame):
        return (
            frame.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.unix_micros(F.col("w.start")).alias("ws"), "n_events")
        )

    batch = {(r["ws"]): r["n_events"] for r in agg(df).collect()}
    stream = SE.read_events_stream(spark, src_dir)
    q = (
        agg(stream)
        .writeStream.format("memory")
        .queryName("sliding_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_sliding"))
        .start()
    )
    q.awaitTermination(120)
    got = {r["ws"]: r["n_events"] for r in spark.sql("SELECT * FROM sliding_test").collect()}
    assert got == batch
    assert sum(got.values()) == 2 * df.count()  # every event in exactly 2 windows


def test_interval_join_stream_matches_batch(spark, tmp_path):
    """burst_window_events' interval-join shape under the streaming
    runner (r6 VERDICT #7): events stream through foreachBatch into
    `temporal.interval_join` against a STATIC window table — the
    bucket-explode + equi-join + exact-range-filter plan is stateless,
    so the per-batch result over one availableNow batch must equal the
    batch twin row-for-row."""
    from pyspark.sql import functions as F

    from commerce_data_pipeline_spark.operators import temporal

    src_dir = str(tmp_path / "in_ij")
    df = _events_df(spark)
    df.coalesce(1).write.parquet(src_dir)  # one file → one micro-batch
    hour = 3_600_000_000
    base = int(df.agg(F.min(F.unix_micros("ts"))).collect()[0][0]) // hour * hour
    intervals = spark.createDataFrame(
        [(base, base + 2 * hour), (base + hour, base + 3 * hour)],
        "start_us long, end_us long",
    )

    def classify(frame):
        j = temporal.interval_join(
            frame.withColumn("ts_us", F.unix_micros("ts")).select("ts_us", "user_id"),
            intervals, "ts_us", bucket_us=1_800_000_000,
        )
        return (
            j.groupBy("start_us")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.countDistinct("user_id").alias("n_users"))
        )

    batch = {r["start_us"]: (r["n_events"], r["n_users"])
             for r in classify(df).collect()}
    got: dict[int, tuple[int, int]] = {}

    def sink(bdf, _bid):
        for r in classify(bdf).collect():
            got[r["start_us"]] = (r["n_events"], r["n_users"])

    q = (
        SE.read_events_stream(spark, src_dir)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_ij"))
        .start()
    )
    q.awaitTermination(120)
    assert got == batch and len(got) == 2


def test_snapshot_diff_cdc_stream_matches_batch(spark, tmp_path):
    """snapshot_diff as a CDC step (r6 VERDICT #7): a refreshed snapshot
    arrives as a stream and foreachBatch diffs it against the static
    published snapshot — the one-pass merge (per-key pre-aggregates,
    assert_true duplicate guard) runs identically under the streaming
    runner, so the four counts must match the batch call."""
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, v double")
    new_rows = [(2, "b", 20.0), (3, "c", 99.0), (4, "d", 40.0)]
    new_df = spark.createDataFrame(new_rows, "k long, s string, v double")
    src_dir = str(tmp_path / "in_cdc")
    new_df.coalesce(1).write.parquet(src_dir)

    expected = PR.snapshot_diff(old, new_df, ["k"]).collect()[0].asDict()
    seen: list[dict] = []

    def sink(bdf, _bid):
        seen.append(PR.snapshot_diff(old, bdf, ["k"]).collect()[0].asDict())

    q = (
        spark.readStream.schema("k long, s string, v double").parquet(src_dir)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_cdc"))
        .start()
    )
    q.awaitTermination(120)
    assert seen == [expected]
    assert expected == {"n_added": 1, "n_removed": 1, "n_changed": 1,
                        "n_unchanged": 1}


def test_chi_square_drift_stream_matches_batch(spark, tmp_path):
    """chi_square_drift as a monitoring step: the CURRENT window's events
    arrive as a stream and foreachBatch compares them against the static
    reference snapshot — two keyed counts + a broadcast totals join run
    identically under the streaming runner, so every per-category row
    must match the batch call (the corpus-shift alarm a training
    pipeline hangs on its ingest stream)."""
    ref = spark.createDataFrame(
        [("x",)] * 30 + [("y",)] * 10, "c string")
    cur_rows = [("x",)] * 10 + [("y",)] * 30
    cur_df = spark.createDataFrame(cur_rows, "c string")
    src_dir = str(tmp_path / "in_drift")
    cur_df.coalesce(1).write.parquet(src_dir)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    expected = rows(PR.chi_square_drift(ref, cur_df, "c"))
    seen: list[list[tuple]] = []

    def sink(bdf, _bid):
        seen.append(rows(PR.chi_square_drift(ref, bdf, "c")))

    q = (
        spark.readStream.schema("c string").parquet(src_dir)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_drift"))
        .start()
    )
    q.awaitTermination(120)
    assert seen == [expected]
    assert expected[0][-1] == 10_000_000  # chi2_e6 column


def test_centroid_stats_stream_matches_batch(spark, tmp_path):
    """centroid_similarity's (label, dim) sums are pure mergeable
    statistics: stream the embeddings in two file-batches, accumulate
    per-batch partial (sum, count) aggregates in a ledger, and the
    centroid matrix rebuilt from the MERGED partials must reproduce the
    batch operator's pairwise dots exactly — the one-pass streaming shape
    of the embedding-drift audit."""
    import math
    from collections import defaultdict

    from pyspark.sql import functions as F

    from commerce_data_pipeline_spark.operators.similarity import centroid_similarity

    rows_a = [(0, [0.5, -0.25]), (1, [0.125, 0.75])]
    rows_b = [(0, [0.25, 0.5]), (1, [-0.5, 0.25]), (0, [0.75, -0.125])]
    schema = "label int, embedding array<float>"
    src = str(tmp_path / "in_cent")
    spark.createDataFrame(rows_a, schema).coalesce(1).write.parquet(src)
    spark.createDataFrame(rows_b, schema).coalesce(1).write.mode("append").parquet(src)

    ledger: dict = defaultdict(lambda: [0, 0])  # (label, dim) -> [sum_e3, n]

    def sink(bdf, _bid):
        part = (
            bdf.select(
                "label",
                F.posexplode(
                    F.transform(
                        "embedding",
                        lambda x: F.floor(x.cast("double") * F.lit(1000.0)).cast("long"),
                    )
                ).alias("dim", "v"),
            )
            .groupBy("label", "dim")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        )
        for r in part.collect():
            e = ledger[(r["label"], r["dim"])]
            e[0] += int(r["s"])
            e[1] += int(r["n"])

    q = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_cent"))
        .start()
    )
    q.awaitTermination(120)

    # rebuild centroids from the merged ledger (same floor contract)
    cents: dict = {}
    ns: dict = {}
    for (g, d), (s, n) in ledger.items():
        cents.setdefault(g, {})[d] = math.floor(s * 1000.0 / n)
        ns[g] = n
    got = {}
    for a in cents:
        for b in cents:
            if a <= b:
                got[(a, b)] = sum(cents[a][d] * cents[b][d] for d in cents[a])

    batch_df = spark.createDataFrame(rows_a + rows_b, schema)
    expected = {
        (r["label_a"], r["label_b"]): r["dot_e12"]
        for r in centroid_similarity(batch_df).collect()
    }
    assert got == expected
    assert len(ledger) == 4  # 2 labels x 2 dims, merged across 2 batches


def test_split_leakage_stream_matches_batch(spark, tmp_path):
    """The leakage audit's per-entity state is a mergeable split-set:
    stream the assignments in two file-batches, fold each batch's
    (entity, distinct-splits, rows) partial into a ledger (set-union +
    row-count add), and the summary rebuilt from the merged ledger must
    equal the batch operator — the continuous-governance shape (audit
    the split as data lands, not after)."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from commerce_data_pipeline_spark.operators.corpus import split_leakage

    rows_a = [(1, "train"), (1, "train"), (2, "train"), (3, "val")]
    rows_b = [(2, "test"), (2, "test"), (3, "val"), (4, "train")]
    schema = "ent int, split string"
    src = str(tmp_path / "in_leak")
    spark.createDataFrame(rows_a, schema).coalesce(1).write.parquet(src)
    spark.createDataFrame(rows_b, schema).coalesce(1).write.mode("append").parquet(src)

    ledger: dict = defaultdict(lambda: [set(), 0])  # ent -> [splits, n_rows]

    def sink(bdf, _bid):
        part = bdf.groupBy("ent").agg(
            F.collect_set("split").alias("splits"), F.count(F.lit(1)).alias("n")
        )
        for r in part.collect():
            e = ledger[r["ent"]]
            e[0].update(r["splits"])
            e[1] += int(r["n"])

    q = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        .writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_leak"))
        .start()
    )
    q.awaitTermination(120)

    got = {
        "n_entities": len(ledger),
        "n_rows": sum(n for _s, n in ledger.values()),
        "n_leaked_entities": sum(1 for s, _n in ledger.values() if len(s) > 1),
        "n_leaked_rows": sum(n for s, n in ledger.values() if len(s) > 1),
    }
    batch = split_leakage(
        spark.createDataFrame(rows_a + rows_b, schema), "ent"
    ).collect()[0]
    assert got == {k: batch[k] for k in got}
    # entity 2 leaks only across the two batches — the merge caught it
    assert got["n_leaked_entities"] == 1 and got["n_leaked_rows"] == 3
