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
