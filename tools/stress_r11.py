"""One-off 8x sweep for the r11 additions + the two r10 stragglers VERDICT
r10 directive #6 named (appends nothing — prints a STRESS.md-ready table).
Reuses the stress harness's scaled loader / cache-tag machinery.

    python tools/stress_r11.py [K] [sf_dir]

Rows:
- bpe_tokenize: training is one word-frequency agg (vocab grows ~k under
  the word-salted copies), the emit is map-only over k x docs. Expect
  ~linear.
- value_psi_drift: scaled copies repeat the same value support, so the
  boundary agg and band counts see k x rows into the SAME <=10 bands;
  scan-bound. Expect ~linear or below.
- fisher_dims dim=64 vs dim=256 (the agg-key knob, directive #6): the
  widened embedding concatenates 4 deterministic element-transforms of
  the base vector, so posexplode rows x4 and the agg carries 256 keys
  instead of 64. Expect the 8x ratio to stay scan-bound (~r10's 1.8x)
  at BOTH widths — the agg-key count is not the scale axis, rows are.
- stream_attribution_pairs SKEWED (directive #6): one global hot user
  (user_id % 10 == 0 collapsed to user 0 AFTER key-shifted scaling)
  holds ~10% of all events on ONE join key. The interval join's output
  on that key grows ~k^2 (purchases x trailing-hour views both grow k),
  so the honest metric is TIME ratio vs OUTPUT-ROWS ratio — the join
  should stay sublinear in work produced; a time ratio near or above
  the rows ratio would mean the hot key serializes the stage.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from commerce_data_pipeline_spark import queries as Q
from commerce_data_pipeline_spark.operators import selection
from commerce_data_pipeline_spark.session import get_spark
from commerce_data_pipeline_spark.streaming import joins as stream_joins
from tools.stress import _timed_min, scaled_loader, unpersist_all_rdds

REGISTRY_ROWS = ["bpe_tokenize", "value_psi_drift", "fisher_dims"]


def run_registry(spark, sf_dir: str, k: int) -> dict[str, float]:
    Q.rebind_load_table(scaled_loader(k))
    original_tag = Q.get_cache_tag()
    Q.set_cache_tag(f"x{k}" if k != 1 else "")
    try:
        out: dict[str, float] = {}
        for name in REGISTRY_ROWS:

            def run(name=name):
                Q.REGISTRY[name].spark(spark, sf_dir).count()
                spark.catalog.clearCache()
                unpersist_all_rdds(spark)

            out[name] = _timed_min(run)
        return out
    finally:
        Q.rebind_load_table(Q.load_table)
        Q.set_cache_tag(original_tag)


def _widened(emb, width_factor: int = 4):
    """256-dim embedding: the base 64-dim vector concatenated with 3
    deterministic element-transforms (scaled/shifted/negated) — same row
    count, 4x posexplode output, 256 agg keys."""
    e = F.col("embedding")
    return emb.select(
        "label",
        F.concat(
            e,
            F.transform(e, lambda x: x * F.lit(0.5)),
            F.transform(e, lambda x: -x),
            F.transform(e, lambda x: x * F.lit(0.25) + F.lit(0.1)),
        ).alias("embedding"),
    )


def fisher_time(spark, sf_dir: str, k: int, dim: int) -> float:
    emb = scaled_loader(k)(spark, sf_dir, "embeddings").select("label", "embedding")
    if dim == 256:
        emb = _widened(emb)

    def run():
        selection.fisher_separation(emb, target_label=0, top_k=10).count()
        spark.catalog.clearCache()
        unpersist_all_rdds(spark)

    return _timed_min(run)


def stream_skew(spark, sf_dir: str, k: int) -> tuple[float, int]:
    """Interval join with one global hot user holding ~10% of events.
    The key shift per copy is a multiple of 10, so `% 10 == 0` selects
    the same residue class in every copy — collapsing it AFTER scaling
    yields ONE hot key whose event share stays ~10% of the k x corpus."""
    ev = scaled_loader(k)(spark, sf_dir, "events").withColumn(
        "user_id",
        F.when(F.col("user_id") % 10 == 0, F.lit(0)).otherwise(F.col("user_id")),
    )
    pairs = stream_joins.attribute_purchases_stream(
        ev, convert_type="purchase", touch_type="view", window="1 hour"
    )
    n_rows = pairs.count()

    def run():
        pairs.count()
        spark.catalog.clearCache()
        unpersist_all_rdds(spark)

    return _timed_min(run), n_rows


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("stress_r11")
    spark.range(1000).selectExpr("sum(id)").collect()

    run_registry(spark, sf_dir, 1)  # untimed warm pass
    base = run_registry(spark, sf_dir, 1)
    big = run_registry(spark, sf_dir, k)
    f256_1 = fisher_time(spark, sf_dir, 1, 256)
    f256_k = fisher_time(spark, sf_dir, k, 256)
    sk1, rows1 = stream_skew(spark, sf_dir, 1)
    skk, rowsk = stream_skew(spark, sf_dir, k)

    print(f"| query | 1x sec | {k}x sec | ratio |")
    print("|---|---|---|---|")
    for name in REGISTRY_ROWS:
        print(f"| {name} | {base[name]:.2f} | {big[name]:.2f} | {big[name] / base[name]:.1f}x |")
    print(f"| fisher_dims dim=256 (4x explode rows, 256 agg keys) | {f256_1:.2f} | {f256_k:.2f} | {f256_k / f256_1:.1f}x |")
    print(
        f"| stream_attribution_pairs SKEWED (hot user ~10% of events) | {sk1:.2f} | {skk:.2f} | {skk / sk1:.1f}x "
        f"(output rows {rows1} -> {rowsk}, {rowsk / max(rows1, 1):.1f}x) |"
    )


if __name__ == "__main__":
    main()
