"""Z-order clustering: interleave correctness and per-file stat tightness."""

import glob
import os

from pyspark.sql import functions as F

from commerce_data_pipeline_spark.operators import layout


def test_interleave_bits_known_values(spark):
    df = spark.createDataFrame([(3, 0), (0, 3), (3, 3), (1, 2)], "x int, y int")
    out = df.select(
        "x", "y", layout.interleave_bits([F.col("x"), F.col("y")], bits=2).alias("z")
    ).collect()
    got = {(r["x"], r["y"]): r["z"] for r in out}
    # x bits land at even positions, y bits at odd: z(3,0)=0b0101, z(0,3)=0b1010
    assert got[(3, 0)] == 0b0101
    assert got[(0, 3)] == 0b1010
    assert got[(3, 3)] == 0b1111
    assert got[(1, 2)] == 0b1001  # x=0b01 → bit0; y=0b10 → bit3


def test_zorder_locality_beats_single_column_sort(spark, tmp_path):
    """Z-clustered files have tight min/max ranges on BOTH dimensions; a
    single-column sort leaves the other dimension's per-file spread at
    ~full range (no skipping possible)."""
    n = 20_000
    # two independent uniform dims
    df = spark.range(n).select(
        (F.col("id") * 2654435761 % 10_000).alias("x"),
        (F.col("id") * 97 % 10_000).alias("y"),
    )

    z_path = str(tmp_path / "zorder")
    layout.cluster_write(df, z_path, ["x", "y"], bits=8, num_files=16)

    s_path = str(tmp_path / "xsort")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(s_path)

    def mean_file_spread(path, col):
        spreads = []
        for f in glob.glob(os.path.join(path, "*.parquet")):
            row = spark.read.parquet(f).agg(
                (F.max(col) - F.min(col)).alias("spread")
            ).collect()[0]
            spreads.append(row["spread"])
        return sum(spreads) / len(spreads)

    # x-sorted layout: x tight, y ~full range (≈10k)
    assert mean_file_spread(s_path, "x") < 2_000
    assert mean_file_spread(s_path, "y") > 8_000
    # z-ordered: BOTH dims substantially tighter than full range
    zx, zy = mean_file_spread(z_path, "x"), mean_file_spread(z_path, "y")
    assert zx < 6_000 and zy < 6_000


def test_cluster_write_roundtrip(spark, tmp_path):
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("x"), (F.col("id") % 13).alias("y")
    )
    p = str(tmp_path / "c")
    layout.cluster_write(df, p, ["x", "y"], bits=4, num_files=4)
    back = spark.read.parquet(p)
    assert back.count() == 1000
    assert set(back.columns) == {"id", "x", "y"}  # helper key dropped


def test_skipping_profile_grid(spark):
    """Uniform 64x64 grid, bits=2 -> 16 files either way. A c2-only band
    covering one c2 quad-bin: linear must touch ALL 16 files, z-order
    touches exactly the 4 cells of that c2 stripe. Row counts identical."""
    df = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    # band_pct (26, 49) -> lo + [span*26//100, span*49//100] = [16, 31]:
    # exactly y-bin 1 of 4 (y in 16..31), and x-band [16, 31] likewise
    rows = {
        r["layout"]: r
        for r in layout.skipping_profile(df, "x", "y", bits=2, band_pct=(26, 49)).collect()
    }
    lin, z = rows["linear"], rows["zorder"]
    # zkey >> bits keeps the top `bits` bits -> 2^bits cells, same file
    # count as the linear layout's 2^bits c1-bins (here: 4 each, a 2x2 grid)
    assert lin["n_files"] == 4 and z["n_files"] == 4
    # linear files = 4 x-bins, each spans all y -> every file hits the y band
    assert lin["files_hit_band"] == 4
    # z-order: the y band lies in y-half 0 -> only the 2 cells of that stripe
    assert z["files_hit_band"] == 2
    # rectangle: linear prunes to the single x-bin; z-order to 1 quad cell
    assert lin["files_hit_rect"] == 1 and z["files_hit_rect"] == 1
    assert lin["rows_band"] == z["rows_band"] == 64 * 16
    assert lin["rows_rect"] == z["rows_rect"] == 16 * 16
