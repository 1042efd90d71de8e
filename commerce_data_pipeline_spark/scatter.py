"""Guarded scatter for narrow-split scans (r17 VERDICT #3).

A single-file local parquet table scans as ONE split, so CPU-bound
scan-side stages (shingle hashing, GEMM bucketize, normalize/explode)
run on one core unless the frame is repartitioned first. The r13-r17
fix was an unconditional ``repartition(defaultParallelism)`` — right for
the bench inputs, wrong at scale: a 100 TB table already arrives in
thousands of splits, where the scatter is a full extra exchange of the
table, and when splits exceed defaultParallelism it actively REDUCES
parallelism.

``scatter`` makes that admission guard-decided like every other path
choice in this package: the exchange fires only when the scan's
partition count is below defaultParallelism. The partition count comes
from the physical plan (no job runs), and round-robin placement never
feeds a result — every query using it is order-free by construction —
so declared outputs are unchanged either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def scatter(df: DataFrame) -> DataFrame:
    """Repartition `df` to defaultParallelism ONLY when it currently has
    fewer partitions — the multi-split production scan skips the
    exchange entirely."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
