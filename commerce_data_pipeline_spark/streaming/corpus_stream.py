"""Streaming corpus ingestion: continuous document arrival → quality gate
→ watermarked exact-dedup → partitioned corpus sink.

A 100 TB training corpus is not loaded once — it ARRIVES (crawl drops,
partner feeds). This pipeline is the streaming twin of the batch corpus
operators (operators/corpus.py, operators/text.py, operators/dedup.py):
the same scan-side expressions (language ID, quality score, fingerprint)
run per micro-batch, so batch and stream produce identical per-document
values (pinned in tests/test_corpus_stream.py).

Scale posture:
- All enrichment is map-only codegen — no Python, no shuffle.
- Dedup state is bounded by `dropDuplicatesWithinWatermark` on the md5
  fingerprint: only keys within the watermark window are retained, the
  store never grows unboundedly (a plain dropDuplicates on a stream
  would). Cross-window duplicates are the batch dedup's job downstream.
- The sink partitions by language, so downstream per-language training
  mixes read only their partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from commerce_data_pipeline_spark.operators.dedup import fingerprint
from commerce_data_pipeline_spark.operators.text import language_id, quality_score, token_count
from commerce_data_pipeline_spark.schemas import DOCUMENTS


def read_documents_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source document stream (each dropped file = one arrival)."""
    reader = spark.readStream.schema(DOCUMENTS)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def enrich_documents(docs: DataFrame, base_ts: str = "2026-01-01") -> DataFrame:
    """Scan-side enrichment, identical in batch and stream: predicted
    language, quality score (e4-floored), token count, content
    fingerprint, plus a deterministic ingest timestamp derived from
    doc_id (the synthetic stand-in for arrival time — real feeds carry
    their own; it exists so watermarking has an event-time column)."""
    return docs.select(
        "doc_id",
        "lang",
        "source",
        "text",
        language_id("text").alias("lang_pred"),
        F.floor(quality_score("text") * 10000).cast("long").alias("quality_e4"),
        token_count("text").cast("long").alias("n_tokens"),
        fingerprint("text").alias("fp"),
        (F.to_timestamp(F.lit(base_ts)) + F.make_interval(secs=F.col("doc_id")))
        .alias("ingest_ts"),
    )


def quality_gate(enriched: DataFrame, min_quality_e4: int = 5000,
                 min_tokens: int = 5) -> DataFrame:
    """Drop low-quality / too-short documents before they cost any state."""
    return enriched.filter(
        (F.col("quality_e4") >= min_quality_e4) & (F.col("n_tokens") >= min_tokens)
    )


def dedup_documents(enriched: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exact-dedup on the content fingerprint with bounded state. Batch
    input falls back to plain dropDuplicates (identical semantics when
    the whole corpus is one 'window')."""
    if not enriched.isStreaming:
        return enriched.dropDuplicates(["fp"])
    return enriched.withWatermark("ingest_ts", watermark).dropDuplicatesWithinWatermark(
        ["fp"]
    )


def corpus_pipeline(docs: DataFrame, min_quality_e4: int = 5000,
                    min_tokens: int = 5, watermark: str = "1 hour") -> DataFrame:
    """enrich → gate → dedup; works identically on batch and stream."""
    return dedup_documents(
        quality_gate(enrich_documents(docs), min_quality_e4, min_tokens), watermark
    )


def write_corpus_stream(clean: DataFrame, out_path: str, checkpoint: str):
    """Partitioned-by-language corpus sink; availableNow processes the
    current backlog then stops (the batch-parity trigger)."""
    return (
        clean.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("lang_pred")
        .trigger(availableNow=True)
        .start()
    )


def write_corpus_stream_with_ledger(
    clean: DataFrame,
    ledger_path: str,
    out_path: str,
    checkpoint: str,
    near_dup: bool = False,
):
    """Streaming ingestion with DURABLE cross-run dedup state: each
    micro-batch runs through a ledger (sources/ledger.py) inside
    `foreachBatch`, so duplicates are dropped against EVERYTHING ever
    admitted — not just the watermark window that bounds
    `dropDuplicatesWithinWatermark`. This is the production composition:
    the watermarked operator handles the hot window cheaply in-stream,
    the ledger closes the unbounded tail with one equi-join per batch
    against prefix-partitioned digest state.

    `near_dup=False` uses the exact `FingerprintLedger` (md5 content
    equality); `near_dup=True` the `BandLedger` (MinHash band collisions
    — admits only documents with no near-duplicate in history).

    foreachBatch + availableNow keeps exactly-once semantics per batch id
    via the checkpoint; the ledger append is idempotent at the content
    level (re-admitted batches admit nothing), so replays are safe.
    """
    from commerce_data_pipeline_spark.sources.ledger import (
        BandLedger,
        FingerprintLedger,
    )

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        ledger = (
            BandLedger(spark, ledger_path)
            if near_dup
            else FingerprintLedger(spark, ledger_path)
        )
        admitted = ledger.ingest(batch_df)
        (
            admitted.write.mode("append")
            .partitionBy("lang_pred")
            .parquet(out_path)
        )

    return (
        clean.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
