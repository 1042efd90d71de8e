"""One-off 8x sweep for the r13 additions (appends nothing — prints a
STRESS.md-ready table). Reuses the stress harness's scaled loader /
cache-tag machinery.

    python tools/stress_r13.py [K] [sf_dir]

Rows:
- ann_ivf_rebalance: the split LIFECYCLE (build -> size census ->
  seed -> local reassign -> routing swap), fresh cache per rep, at k x
  corpus. Corpus-sized work is the build's broadcast-argmax assignment;
  split cost scales with the OVERSIZED fraction. Expect ~linear or
  below.
- ledger_cross_run_dups: BandLedger lifecycle (3 commits + compact) +
  the cross-run match join, fresh ledger per rep. Everything is one
  minhash pass over the corpus + digest-only joins. Expect ~linear.
- ivf_recall_audit (r12 VERDICT #3): recall@5 at FIXED n_probe=4 pre
  vs post split — the number a production split decision must see. Not
  a timing row; printed as recall_e6 pre/post at 1x and kx.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from commerce_data_pipeline_spark import queries as Q
from commerce_data_pipeline_spark.operators import index as ivf_index
from commerce_data_pipeline_spark.session import get_spark
from tools.stress import _timed_min, scaled_loader, unpersist_all_rdds

REGISTRY_ROWS = ["ann_ivf_rebalance", "ledger_cross_run_dups"]
_CACHE_KINDS = {"ann_ivf_rebalance": "ivf_split", "ledger_cross_run_dups": "band_ledger"}


def _wipe_cache(kind: str, tag: str, sf_dir: str) -> None:
    """Both scenarios are marker-idempotent per cache dir; timing the
    lifecycle (not a cached probe) requires a fresh dir per rep."""
    from commerce_data_pipeline_spark.queries import _shared

    original = _shared.CACHE_TAG
    _shared.CACHE_TAG = tag
    try:
        leaf = _shared._cache_dir(kind, sf_dir)
        if os.path.isdir(leaf):
            shutil.rmtree(leaf, ignore_errors=True)
    finally:
        _shared.CACHE_TAG = original


def run_registry(spark, sf_dir: str, k: int) -> dict[str, float]:
    Q.rebind_load_table(scaled_loader(k))
    original_tag = Q.get_cache_tag()
    tag = f"x{k}" if k != 1 else ""
    Q.set_cache_tag(tag)
    try:
        out: dict[str, float] = {}
        for name in REGISTRY_ROWS:

            def run(name=name):
                _wipe_cache(_CACHE_KINDS[name], tag, sf_dir)
                Q.REGISTRY[name].spark(spark, sf_dir).count()
                spark.catalog.clearCache()
                unpersist_all_rdds(spark)

            out[name] = _timed_min(run)
        return out
    finally:
        Q.rebind_load_table(Q.load_table)
        Q.set_cache_tag(original_tag)


def recall_audit(spark, sf_dir: str, k: int) -> tuple[int, int]:
    """(pre_split, post_split) mean recall@5 e6 at FIXED n_probe=4."""
    import tempfile

    from commerce_data_pipeline_spark.operators.similarity import auto_n_centroids

    emb = scaled_loader(k)(spark, sf_dir, "embeddings")
    total = emb.count()
    queries = emb.filter((F.col("vec_id") % 20 == 0) & (F.col("vec_id") < 2500))
    with tempfile.TemporaryDirectory() as td:
        path = f"file://{td}/ivf"
        ivf_index.build_ivf_index(emb, path, corpus_count=total)
        pre = ivf_index.ivf_recall_audit(
            spark, path, emb, queries, k=5, n_probe=4
        ).collect()[0]["mean_recall_e6"]
        step = max(1, total // auto_n_centroids(total))
        ivf_index.rebalance_ivf_index(
            spark, path, max_list_size=(13 * step) // 10, n_splits=2
        )
        post = ivf_index.ivf_recall_audit(
            spark, path, emb, queries, k=5, n_probe=4
        ).collect()[0]["mean_recall_e6"]
    spark.catalog.clearCache()
    unpersist_all_rdds(spark)
    return int(pre), int(post)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("stress_r13")
    spark.range(1000).selectExpr("sum(id)").collect()

    run_registry(spark, sf_dir, 1)  # untimed warm pass
    base = run_registry(spark, sf_dir, 1)
    big = run_registry(spark, sf_dir, k)
    r1_pre, r1_post = recall_audit(spark, sf_dir, 1)
    rk_pre, rk_post = recall_audit(spark, sf_dir, k)

    print(f"| query | 1x sec | {k}x sec | ratio |")
    print("|---|---|---|---|")
    for name in REGISTRY_ROWS:
        print(
            f"| {name} (full lifecycle, fresh cache per rep) "
            f"| {base[name]:.2f} | {big[name]:.2f} "
            f"| {big[name] / base[name]:.1f}x |"
        )
    print(
        f"| ivf recall@5 at FIXED n_probe=4 (pre-split -> post-split) "
        f"| {r1_pre / 1e6:.3f} -> {r1_post / 1e6:.3f} "
        f"| {rk_pre / 1e6:.3f} -> {rk_post / 1e6:.3f} | — |"
    )


if __name__ == "__main__":
    main()
