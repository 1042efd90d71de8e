"""Data-layout operators: Z-order clustering for multi-column data skipping
(100 TB posture; SURVEY.md §4 "partitioned layout").

Partitioning prunes on ONE column hierarchy; parquet min/max row-group
stats prune on whatever the file happens to be sorted by. Sorting by a
single column destroys locality on every other column. Z-ordering
interleaves the bits of several columns into one sort key, so files end up
covering small hyper-rectangles of the combined space — min/max stats stay
tight on ALL clustered columns and selective predicates on any of them
skip most files.

All pure expressions: width_bucket normalization (one min/max agg) + bit
interleaving (shift/or chain inside codegen) + repartitionByRange on the
key. One range shuffle at write time buys stat-based skipping on every
subsequent read — the classic write-once/read-many trade.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def interleave_bits(cols: list[Column], bits: int = 8) -> Column:
    """Morton (Z-order) key: bit i of column j lands at position
    i*ncols + j. Inputs must already be integers in [0, 2^bits)."""
    n = len(cols)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, b * n + j)
    return key


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8) -> Column:
    """Z-order key over arbitrary numeric columns: each column is
    width-bucketed into 2^bits equal-width bins between its min and max
    (one tiny driver-side agg), then bit-interleaved. Equal-width binning
    is stat-skipping-grade — exact quantiles aren't needed for locality."""
    nbins = 1 << bits
    bounds = df.agg(
        *[F.min(c).alias(f"_min_{c}") for c in cols],
        *[F.max(c).alias(f"_max_{c}") for c in cols],
    ).collect()[0]
    bucketed = []
    for c in cols:
        lo, hi = float(bounds[f"_min_{c}"]), float(bounds[f"_max_{c}"])
        if hi <= lo:
            hi = lo + 1.0
        # width_bucket → [1, nbins+1]; clamp and shift to [0, nbins)
        b = F.width_bucket(F.col(c).cast("double"), F.lit(lo), F.lit(hi), F.lit(nbins))
        bucketed.append(F.least(b - 1, F.lit(nbins - 1)).cast("long"))
    return interleave_bits(bucketed, bits)


def cluster_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 8,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write `df` Z-clustered on `cols`: range-partition by the Z-key into
    `num_files` contiguous key ranges, sort within each, drop the key.
    Each output file then covers a compact region of the clustered space →
    tight per-file min/max on every clustered column."""
    key = zorder_key(df, cols, bits)
    (
        df.withColumn("_zkey", key)
        .repartitionByRange(num_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode(mode)
        .parquet(path)
    )
