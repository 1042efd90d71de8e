"""Stream-stream join: watermarked, time-range-bounded attribution join."""

from datetime import datetime

from commerce_data_pipeline_spark.schemas import EVENTS
from commerce_data_pipeline_spark.streaming.joins import attribute_purchases_stream


def test_stream_stream_attribution_join(spark, tmp_path):
    rows = [
        (1, datetime(2024, 1, 1, 10, 0), 1, "view", 1.0, "{}"),      # in window
        (2, datetime(2024, 1, 1, 10, 30), 1, "view", 1.0, "{}"),     # in window
        (3, datetime(2024, 1, 1, 10, 45), 1, "purchase", 9.0, "{}"),
        (4, datetime(2024, 1, 1, 8, 0), 1, "view", 1.0, "{}"),       # >1h before → out
        (5, datetime(2024, 1, 1, 11, 0), 1, "view", 1.0, "{}"),      # after purchase → out
        (6, datetime(2024, 1, 1, 10, 40), 2, "view", 1.0, "{}"),     # other user → out
    ]
    src = str(tmp_path / "in")
    spark.createDataFrame(rows, EVENTS).write.parquet(src)

    stream = spark.readStream.schema(EVENTS).parquet(src)
    joined = attribute_purchases_stream(stream, window="1 hour", watermark="1 hour")
    assert joined.isStreaming
    q = (
        joined.writeStream.format("memory")
        .queryName("stream_attr")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM stream_attr").collect()
    got = {(r["purchase_event_id"], r["touch_event_id"]) for r in out}
    assert got == {(3, 1), (3, 2)}


def test_stream_join_batch_twin(spark):
    """The same join condition on batch input (sanity of the predicate)."""
    rows = [
        (1, datetime(2024, 1, 1, 10, 0), 1, "view", 1.0, "{}"),
        (3, datetime(2024, 1, 1, 10, 45), 1, "purchase", 9.0, "{}"),
    ]
    df = spark.createDataFrame(rows, EVENTS)
    out = attribute_purchases_stream(df).collect()
    assert [(r["purchase_event_id"], r["touch_event_id"]) for r in out] == [(3, 1)]


def test_per_conversion_output_cap(spark):
    """r11 VERDICT #6 — the hot-key output contract: a user with many
    in-window views per purchase is truncated to the most-recent
    `max_touches_per_conversion` touches, deterministically (touch_ts
    DESC, touch_event_id ASC); a streaming frame with the cap raises."""
    import pytest

    rows = []
    # hot user 1: one purchase at 11:00, 12 views in the prior hour
    for m in range(12):
        rows.append((100 + m, datetime(2024, 1, 1, 10, m * 5), 1, "view", 1.0, "{}"))
    rows.append((200, datetime(2024, 1, 1, 11, 0), 1, "purchase", 9.0, "{}"))
    # two views at the SAME ts — the event_id tie-break decides
    rows.append((301, datetime(2024, 1, 1, 10, 55), 1, "view", 1.0, "{}"))
    rows.append((302, datetime(2024, 1, 1, 10, 55), 1, "view", 1.0, "{}"))
    df = spark.createDataFrame(rows, EVENTS)

    capped = attribute_purchases_stream(df, max_touches_per_conversion=4).collect()
    assert len(capped) == 4
    got = [r["touch_event_id"] for r in capped]
    # most recent first by ts: 10:55 pair (ids 301, 302 — asc tie-break),
    # then 10:55(m=11)=111, 10:50(m=10)=110
    assert sorted(got) == [110, 111, 301, 302]
    # uncapped sees all 14
    assert len(attribute_purchases_stream(df).collect()) == 14
    # the cap is a per-CONVERSION bound: 2 purchases → ≤ 2*cap rows
    rows.append((201, datetime(2024, 1, 1, 11, 1), 1, "purchase", 9.0, "{}"))
    df2 = spark.createDataFrame(rows, EVENTS)
    capped2 = attribute_purchases_stream(df2, max_touches_per_conversion=4).collect()
    assert len(capped2) == 8

    stream = (
        spark.readStream.schema(EVENTS)
        .parquet("/root/testdata/sf0.001")  # never started; just isStreaming
    )
    with pytest.raises(ValueError, match="max_touches_per_conversion"):
        attribute_purchases_stream(stream, max_touches_per_conversion=4)
