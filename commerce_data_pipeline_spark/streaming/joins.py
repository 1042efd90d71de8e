"""Stream-stream joins (SURVEY.md §2e streaming surface).

Joining two unbounded streams requires both sides to buffer state; without
bounds that state grows forever. Structured Streaming makes the join
tractable with (a) watermarks on both sides and (b) a time-range join
condition — together they let the engine expire buffered rows once no
future match is possible.

`attribute_purchases_stream` is the streaming twin of the batch
attribution operator (operators/analytics.attribution): each purchase
joins to the same user's view events within the preceding `window`. The
batch operator picks the single latest touch via a window function;
stream-stream joins can't run ranking over unbounded input, so the
streaming shape emits ALL in-window touches and leaves last-touch
selection to a downstream batch/gold step — the standard decomposition
(bounded-state join now, ranking at read time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def attribute_purchases_stream(
    events: DataFrame,
    convert_type: str = "purchase",
    touch_type: str = "view",
    window: str = "1 hour",
    watermark: str = "1 hour",
    max_touches_per_conversion: int | None = None,
) -> DataFrame:
    """Join purchase events to same-user touch events within the trailing
    `window`. Both sides watermarked; the time-range predicate bounds the
    join state to `watermark + window` per user.

    Returns (user_id, purchase_event_id, purchase_ts, touch_event_id,
    touch_ts) — one row per (purchase, in-window touch) pair.

    OUTPUT-VOLUME contract (r11 VERDICT #6): join STATE is bounded by
    watermark + window, but OUTPUT per hot user grows ~k·v (every
    purchase × every in-window view — STRESS r11 measured 60.9× rows
    under a 10%-of-events hot user). `max_touches_per_conversion` caps
    it deterministically: keep each conversion's most RECENT touches
    (ORDER BY touch_ts DESC, touch_event_id ASC — a total order, the
    phash_pairs truncation precedent), bounding output to
    n_conversions × cap. Batch frames only — a per-conversion rank is
    not expressible after a stream-stream join. For live streams, apply
    the same rank inside foreachBatch: that bounds output per
    (conversion, micro-batch); a conversion whose touches arrive across
    batches (out-of-order within the watermark) can exceed the global
    cap by up to cap·n_batches until a downstream compaction applies
    the identical rank over the sink — an eventually-exact cap, the
    honest streaming semantics. Or leave uncapped and let the sink
    absorb the documented k·v.
    """
    purchases = (
        events.filter(F.col("event_type") == convert_type)
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_event_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    touches = (
        events.filter(F.col("event_type") == touch_type)
        .select(
            F.col("user_id").alias("t_user"),
            F.col("event_id").alias("touch_event_id"),
            F.col("ts").alias("touch_ts"),
        )
        .withWatermark("touch_ts", watermark)
    )
    cond = (
        (F.col("p_user") == F.col("t_user"))
        & (F.col("touch_ts") <= F.col("purchase_ts"))
        & (F.col("touch_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {window}"))
    )
    out = purchases.join(touches, cond).select(
        F.col("p_user").alias("user_id"),
        "purchase_event_id",
        "purchase_ts",
        "touch_event_id",
        "touch_ts",
    )
    if max_touches_per_conversion is not None:
        if out.isStreaming:
            raise ValueError(
                "attribute_purchases_stream: max_touches_per_conversion "
                "requires a batch frame (rank after a stream-stream join "
                "is unsupported); apply the same rank in foreachBatch"
            )
        from pyspark.sql import Window

        w = Window.partitionBy("purchase_event_id").orderBy(
            F.desc("touch_ts"), F.asc("touch_event_id")
        )
        out = (
            out.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= int(max_touches_per_conversion))
            .drop("_r")
        )
    return out
