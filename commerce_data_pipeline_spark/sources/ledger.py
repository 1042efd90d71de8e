"""Incremental dedup ledger: cross-run exact-dedup state as a parquet
fingerprint table.

The streaming dedup (streaming/corpus_stream.py) bounds its state to the
watermark window; duplicates that recur ACROSS runs/windows need durable
state. The ledger is that state, kept deliberately minimal: one column of
md5 content fingerprints, partitioned by a fingerprint prefix.

Scale posture (100 TB corpus, billions of fingerprints):
- The ledger stores ONLY digests (32-char md5) — never text. The
  anti-join against it shuffles (fp, id) pairs at most; with both sides
  hash-distributed on fp the join is the cheapest possible shape, and
  the prefix partitioning keeps per-run appends small and prunable.
- `filter_new` also collapses duplicates WITHIN the incoming batch
  (min-id per fingerprint) before touching the ledger, so intra-batch
  dup fan-in never reaches the join.
- `commit` appends only the fingerprints actually admitted, so the
  ledger is exactly the set of content ever accepted — idempotent
  re-ingestion of the same batch admits nothing.

This mirrors the reference pipeline's partition-exists idempotency
(`pipeline.py` skip-if-exists, SURVEY §2b P3) lifted from
partition granularity to content granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from commerce_data_pipeline_spark.operators.dedup import fingerprint
from commerce_data_pipeline_spark.sources.hadoopfs import HadoopFS


class FingerprintLedger:
    def __init__(self, spark: SparkSession, path: str, prefix_chars: int = 2):
        self.spark = spark
        self.path = path
        self.prefix_chars = prefix_chars

    def exists(self) -> bool:
        return HadoopFS(self.spark, self.path).exists(self.path)

    def known(self) -> DataFrame:
        """The fingerprint set admitted so far (empty frame if no ledger)."""
        if not self.exists():
            return self.spark.createDataFrame([], "fp string")
        return self.spark.read.parquet(self.path).select("fp")

    def with_fingerprint(self, df: DataFrame, text_col: str = "text") -> DataFrame:
        return df.withColumn("fp", fingerprint(text_col))

    def filter_new(
        self, df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> DataFrame:
        """Rows whose content has never been admitted: intra-batch
        collapse (min id per fingerprint, digest-only shuffle) then an
        anti-join against the ledger on fp. Returns the original columns
        plus `fp` (callers pass the result straight to `commit`)."""
        fped = self.with_fingerprint(df, text_col)
        keep = (
            fped.select("fp", F.col(id_col))
            .groupBy("fp")
            .agg(F.min(id_col).alias(id_col))
        )
        batch_unique = fped.join(keep, on=["fp", id_col], how="left_semi")
        return batch_unique.join(self.known(), on="fp", how="left_anti")

    def commit(self, admitted: DataFrame) -> None:
        """Append the admitted fingerprints (prefix-partitioned)."""
        (
            admitted.select(
                "fp", F.substring("fp", 1, self.prefix_chars).alias("fp_prefix")
            )
            .dropDuplicates(["fp"])
            .repartition("fp_prefix")
            .write.mode("append")
            .partitionBy("fp_prefix")
            .parquet(self.path)
        )

    def ingest(
        self, df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
    ) -> DataFrame:
        """filter_new + commit in one step; returns the admitted rows.
        NB: materializes the admitted set (the commit is an action)."""
        new_rows = self.filter_new(df, id_col, text_col).localCheckpoint()
        self.commit(new_rows)
        return new_rows
