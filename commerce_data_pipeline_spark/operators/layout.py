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


def skipping_profile(
    df: DataFrame,
    c1: str,
    c2: str,
    bits: int = 4,
    band_pct: tuple[int, int] = (45, 55),
) -> DataFrame:
    """Data-skipping EFFECTIVENESS audit — the measurable claim behind
    Z-ordering, as a query instead of a write: simulate two file layouts
    over (c1, c2) and count how many files a predicate's min/max pruning
    would actually touch.

    Layouts (both assignments are pure map-side integer expressions — no
    global sort, no write):
    - 'linear': file = the 2^bits equal-width bin of c1 alone (what a
      sort-by-c1 layout yields) — perfect pruning on c1, none on c2.
    - 'zorder': file = zkey >> bits, the quad-tree cell of the
      interleaved key (interleave_bits — the same operator cluster_write
      sorts by) — bounded ranges on BOTH columns per file.

    Everything is integer-exact in both engines: bin = ((x-lo)·2^bits)
    div (hi-lo+1); the probe band on each column is [lo + span·p/100
    div 100, ...] derived from the same bounds — so the audit
    value-hashes cross-engine. Bounds compose as a broadcast 1-row
    aggregate (no driver round-trip); the only shuffle after the scan is
    the ≤ 2·2^(2·bits)-group per-file aggregation.

    Returns per layout: n_files (non-empty), n_rows, files_hit_band
    (c2-only band — where z-order shines: the linear layout must touch
    every file), files_hit_rect ((c1, c2) rectangle), rows_band,
    rows_rect (exact matching rows — identical across layouts, pinning
    that pruning changes I/O, never answers).
    """
    nbins = 1 << bits
    x1, x2 = F.col(c1).cast("long"), F.col(c2).cast("long")
    bounds = df.agg(
        F.min(x1).alias("_lo1"),
        F.max(x1).alias("_hi1"),
        F.min(x2).alias("_lo2"),
        F.max(x2).alias("_hi2"),
    )
    b = (
        df.select(x1.alias("_c1"), x2.alias("_c2"))
        .crossJoin(F.broadcast(bounds))
        .withColumn("_span1", F.col("_hi1") - F.col("_lo1") + F.lit(1))
        .withColumn("_span2", F.col("_hi2") - F.col("_lo2") + F.lit(1))
        .withColumn(
            "_b1", F.expr(f"(( _c1 - _lo1 ) * {nbins}) div _span1").cast("long")
        )
        .withColumn(
            "_b2", F.expr(f"(( _c2 - _lo2 ) * {nbins}) div _span2").cast("long")
        )
    )
    zkey = interleave_bits([F.col("_b1"), F.col("_b2")], bits)
    p1, p2 = band_pct
    band_lo = lambda lo, span: F.col(lo) + F.expr(f"({span} * {p1}) div 100")
    band_hi = lambda lo, span: F.col(lo) + F.expr(f"({span} * {p2}) div 100")
    b = (
        b.withColumn("_file_z", F.shiftright(zkey, bits))
        .withColumn("_file_l", F.col("_b1"))
        .withColumn("_p_lo", band_lo("_lo1", "_span1"))
        .withColumn("_p_hi", band_hi("_lo1", "_span1"))
        .withColumn("_s_lo", band_lo("_lo2", "_span2"))
        .withColumn("_s_hi", band_hi("_lo2", "_span2"))
    )
    both = b.select(
        F.explode(
            F.array(
                F.struct(F.lit("zorder").alias("layout"), F.col("_file_z").alias("file_id")),
                F.struct(F.lit("linear").alias("layout"), F.col("_file_l").alias("file_id")),
            )
        ).alias("_lf"),
        "_c1", "_c2", "_p_lo", "_p_hi", "_s_lo", "_s_hi",
    ).select(F.col("_lf.layout").alias("layout"), F.col("_lf.file_id").alias("file_id"),
             "_c1", "_c2", "_p_lo", "_p_hi", "_s_lo", "_s_hi")
    in_band = F.col("_c2").between(F.col("_s_lo"), F.col("_s_hi"))
    in_rect = in_band & F.col("_c1").between(F.col("_p_lo"), F.col("_p_hi"))
    per_file = both.groupBy("layout", "file_id").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.min("_c1").alias("_min1"),
        F.max("_c1").alias("_max1"),
        F.min("_c2").alias("_min2"),
        F.max("_c2").alias("_max2"),
        F.count(F.when(in_band, 1)).cast("long").alias("_n_band"),
        F.count(F.when(in_rect, 1)).cast("long").alias("_n_rect"),
        F.max("_p_lo").alias("_p_lo"),
        F.max("_p_hi").alias("_p_hi"),
        F.max("_s_lo").alias("_s_lo"),
        F.max("_s_hi").alias("_s_hi"),
    )
    hit_band = (F.col("_max2") >= F.col("_s_lo")) & (F.col("_min2") <= F.col("_s_hi"))
    hit_rect = hit_band & (F.col("_max1") >= F.col("_p_lo")) & (
        F.col("_min1") <= F.col("_p_hi")
    )
    return per_file.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum("_n").cast("long").alias("n_rows"),
        F.count(F.when(hit_band, 1)).cast("long").alias("files_hit_band"),
        F.count(F.when(hit_rect, 1)).cast("long").alias("files_hit_rect"),
        F.sum("_n_band").cast("long").alias("rows_band"),
        F.sum("_n_rect").cast("long").alias("rows_rect"),
    )
