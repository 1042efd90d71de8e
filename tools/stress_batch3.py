"""One-off 8x sweep of the r7 third-batch queries (appends nothing; prints
a STRESS.md-ready table). Reuses the stress harness's scaled loader and
cache-tag machinery so persisted-layout queries measure scaled layouts.

    python tools/stress_batch3.py [K] [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from commerce_data_pipeline_spark import queries as Q
from commerce_data_pipeline_spark.session import get_spark
from tools.stress import _timed_min, scaled_loader, unpersist_all_rdds

BATCH3 = [
    "bpe_train",
    "bpe_compression",
    "ndcg_eval",
    "split_leakage",
    "zorder_skipping",
    "centroid_sim",
    "quantile_groups",
    "pca_power",
    "degree_histogram",
    "lsh_cost_plan",
]


def run_at_scale(spark, sf_dir: str, k: int) -> dict[str, float]:
    # queries is now a package (r10 split): rebind load_table inside every
    # query module; the package-level Q.load_table stays the restore point.
    Q.rebind_load_table(scaled_loader(k))
    original_tag = Q.get_cache_tag()
    Q.set_cache_tag(f"x{k}" if k != 1 else "")
    try:
        out: dict[str, float] = {}
        for name in BATCH3:

            def run(name=name):
                Q.REGISTRY[name].spark(spark, sf_dir).count()
                spark.catalog.clearCache()
                unpersist_all_rdds(spark)

            out[name] = _timed_min(run)
        return out
    finally:
        Q.rebind_load_table(Q.load_table)
        Q.set_cache_tag(original_tag)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    if len(sys.argv) > 3:  # explicit query list overrides the default batch
        BATCH3[:] = sys.argv[3:]
    spark = get_spark("stress-b3")
    spark.range(1000).selectExpr("sum(id)").collect()
    run_at_scale(spark, sf_dir, 1)  # untimed warm pass
    base = run_at_scale(spark, sf_dir, 1)
    big = run_at_scale(spark, sf_dir, k)
    print("| query | 1x sec | 8x sec | ratio |")
    print("|---|---|---|---|")
    for name in BATCH3:
        r = big[name] / base[name] if base[name] > 0 else float("nan")
        print(f"| {name} | {base[name]:.2f} | {big[name]:.2f} | {r:.1f}x |")
    spark.stop()


if __name__ == "__main__":
    main()
