"""One-off 8x sweep for the r12 additions (appends nothing — prints a
STRESS.md-ready table). Reuses the stress harness's scaled loader /
cache-tag machinery.

    python tools/stress_r12.py [K] [sf_dir]

Rows:
- ann_ivf_upsert: the whole maintenance lifecycle (build -> upsert ->
  compact -> tombstone delete) re-runs at k x corpus under the x{k}
  cache tag, then the probe query. Corpus-sized work is the build's
  assignment plus the upsert batch's assignment (both broadcast-argmax
  map stages); tombstone/compact cost scales with the MUTATED fraction
  only. Expect ~linear.
- bpe_train_batched: training is one word-frequency aggregation (vocab
  grows ~k under word-salted copies) + rounds bounded collects; the
  candidate rank job is vocabulary-sized. Expect ~linear or below.
- stream_attribution_pairs CAPPED + SKEWED: the r11 sweep measured the
  uncapped hot-user output at ~k^2 rows (60.9x at one hot key). The r12
  per-conversion cap (most-recent-8) bounds output to
  n_conversions x 8 — the honest metric is again TIME ratio vs OUTPUT
  ratio; the cap's job is to hold the output ratio near the conversion
  growth (~k), not k^2.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from commerce_data_pipeline_spark import queries as Q
from commerce_data_pipeline_spark.session import get_spark
from commerce_data_pipeline_spark.streaming import joins as stream_joins
from tools.stress import _timed_min, scaled_loader, unpersist_all_rdds

REGISTRY_ROWS = ["ann_ivf_upsert", "bpe_train_batched"]


def _wipe_upsert_cache(tag: str, sf_dir: str) -> None:
    """The upsert scenario is marker-idempotent per cache dir; timing the
    lifecycle (not just the probe) requires a fresh dir per rep."""
    from commerce_data_pipeline_spark.queries import _shared

    original = _shared.CACHE_TAG
    _shared.CACHE_TAG = tag
    try:
        leaf = _shared._cache_dir("ivf_upsert", sf_dir)
        if os.path.isdir(leaf):
            shutil.rmtree(leaf, ignore_errors=True)
    finally:
        _shared.CACHE_TAG = original


def run_registry(spark, sf_dir: str, k: int) -> dict[str, float]:
    Q.rebind_load_table(scaled_loader(k))
    original_tag = Q.get_cache_tag()
    Q.set_cache_tag(f"x{k}" if k != 1 else "")
    try:
        out: dict[str, float] = {}
        for name in REGISTRY_ROWS:

            def run(name=name):
                if name == "ann_ivf_upsert":
                    # time the LIFECYCLE, not a cached probe
                    _wipe_upsert_cache(f"x{k}" if k != 1 else "", sf_dir)
                Q.REGISTRY[name].spark(spark, sf_dir).count()
                spark.catalog.clearCache()
                unpersist_all_rdds(spark)

            out[name] = _timed_min(run)
        return out
    finally:
        Q.rebind_load_table(Q.load_table)
        Q.set_cache_tag(original_tag)


def stream_skew_capped(spark, sf_dir: str, k: int) -> tuple[float, int, int]:
    """r11's skew fixture with the r12 cap: one global hot user holding
    ~10% of all events; output bounded per conversion to 8 touches."""
    ev = scaled_loader(k)(spark, sf_dir, "events").withColumn(
        "user_id",
        F.when(F.col("user_id") % 10 == 0, F.lit(0)).otherwise(F.col("user_id")),
    )
    capped = stream_joins.attribute_purchases_stream(
        ev, convert_type="purchase", touch_type="view", window="1 hour",
        max_touches_per_conversion=8,
    )
    uncapped = stream_joins.attribute_purchases_stream(
        ev, convert_type="purchase", touch_type="view", window="1 hour"
    )
    n_capped = capped.count()
    n_uncapped = uncapped.count()

    def run():
        capped.count()
        spark.catalog.clearCache()
        unpersist_all_rdds(spark)

    return _timed_min(run), n_capped, n_uncapped


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("stress_r12")
    spark.range(1000).selectExpr("sum(id)").collect()

    run_registry(spark, sf_dir, 1)  # untimed warm pass
    base = run_registry(spark, sf_dir, 1)
    big = run_registry(spark, sf_dir, k)
    sk1, c1, u1 = stream_skew_capped(spark, sf_dir, 1)
    skk, ck, uk = stream_skew_capped(spark, sf_dir, k)

    print(f"| query | 1x sec | {k}x sec | ratio |")
    print("|---|---|---|---|")
    for name in REGISTRY_ROWS:
        print(
            f"| {name} | {base[name]:.2f} | {big[name]:.2f} "
            f"| {big[name] / base[name]:.1f}x |"
        )
    print(
        f"| stream_attribution_pairs CAPPED+SKEWED | {sk1:.2f} | {skk:.2f} "
        f"| {skk / sk1:.1f}x (capped rows {c1} -> {ck}, {ck / max(c1, 1):.1f}x; "
        f"uncapped would be {u1} -> {uk}, {uk / max(u1, 1):.1f}x) |"
    )


if __name__ == "__main__":
    main()
