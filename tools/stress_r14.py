"""One-off r14 measurement sweep (appends nothing — prints STRESS.md-ready
tables). Two jobs, both r13 VERDICT directives:

1. (#3) Refresh the STALE 8x rows for every plan the r13
   recompute-signature sweep restructured: referential_integrity,
   jaccard_topk, containment_topk, price_outliers, embedding_outliers,
   session_funnel, lang_id_agreement, fd_check. Their published ratios
   predate the restructures of exactly those plans, so their scaling
   story was inferred, not measured. Standard harness: scaled loader,
   min-of-3 warm, fresh-cache tags per scale.

2. (#4) Price the RELIABLE checkpoint mode: run the iterative family
   (dedup_clusters, part_pagerank, part_communities, bpe_train,
   part_walks) at 1x sf0.1 under spark.commerce.checkpoint.mode=local
   (default) vs =reliable with a file: checkpoint dir, min-of-3 warm
   each, and report the wall-time delta plus the number of checkpoint
   directories the reliable pass wrote (the proof the mode was actually
   exercised on that query's path — budget-guarded driver fast paths
   legitimately skip distributed rounds at this scale).

    python tools/stress_r14.py [K] [sf_dir]

NEVER run concurrently with pytest/oracle/bench — contention fakes
scaling cliffs (the standing harness rule).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from commerce_data_pipeline_spark import queries as Q
from commerce_data_pipeline_spark.session import get_spark
from tools.stress import _timed_min, run_at_scale, scaled_loader, unpersist_all_rdds

SWEEP_ROWS = [
    "referential_integrity",
    "jaccard_topk",
    "containment_topk",
    "price_outliers",
    "embedding_outliers",
    "session_funnel",
    "lang_id_agreement",
    "fd_check",
]

ITERATIVE_ROWS = [
    "dedup_clusters",
    "part_pagerank",
    "part_communities",
    "bpe_train",
    "part_walks",
]


def run_rows(spark, sf_dir: str, k: int, names: list[str]) -> dict[str, float]:
    # ONE harness (tools/stress.py run_at_scale) — this sweep only picks
    # the query list and asks for an untimed warm pass per query
    return run_at_scale(spark, sf_dir, k, names=names, warm=True)


def _count_checkpoint_dirs(ckpt_root: str) -> int:
    """Reliable checkpoints land as <root>/<uuid>/rdd-N dirs; count the
    rdd-N leaves written since the last sweep of the root."""
    n = 0
    for dirpath, dirnames, _ in os.walk(ckpt_root):
        n += sum(1 for d in dirnames if d.startswith("rdd-"))
    return n


def price_reliable(spark, sf_dir: str) -> list[tuple[str, float, float, int]]:
    """(name, local_sec, reliable_sec, n_reliable_checkpoints) per query."""
    from commerce_data_pipeline_spark.checkpoint import DIR_CONF, MODE_CONF

    rows = []
    ckpt_root = tempfile.mkdtemp(prefix="ckpt_price_")
    # one-time: reliable mode applies the dir conf via sc.setCheckpointDir
    spark.conf.set(DIR_CONF, f"file://{ckpt_root}")
    try:
        local = run_rows(spark, sf_dir, 1, ITERATIVE_ROWS)
        spark.conf.set(MODE_CONF, "reliable")
        for name in ITERATIVE_ROWS:
            before = _count_checkpoint_dirs(ckpt_root)

            def run(name=name):
                Q.REGISTRY[name].spark(spark, sf_dir).count()
                spark.catalog.clearCache()
                unpersist_all_rdds(spark)

            t = _timed_min(run)
            wrote = (_count_checkpoint_dirs(ckpt_root) - before) // 3  # per rep
            rows.append((name, local[name], t, wrote))
    finally:
        spark.conf.set(MODE_CONF, "local")
        shutil.rmtree(ckpt_root, ignore_errors=True)
    return rows


def run_lifecycles(spark, sf_dir: str, k: int) -> dict[str, float]:
    """Fresh-cache FULL-lifecycle timings for this round's new queries
    (the stress_r13 precedent for ann_ivf_rebalance):
    - ann_rebalance_recall: build → split → fixed-n_probe recall audit
      (brute force + refined-routing probe), fresh ivf_split dir per rep;
    - ann_rebalance_gate (registers in r15): build → census → pre-audit
      → split → post-audit → verdict row, fresh ivf_gate dir per rep.
    Corpus-sized work in both is the build assignment + the brute-force
    audit scans; split work scales with the oversized fraction."""
    import shutil

    from commerce_data_pipeline_spark.queries import _shared
    from commerce_data_pipeline_spark.queries.similarity import (
        _q_ann_rebalance_gate,
    )

    rows = {
        "ann_rebalance_recall": ("ivf_split", Q.REGISTRY["ann_rebalance_recall"].spark),
        "ann_rebalance_gate": ("ivf_gate", _q_ann_rebalance_gate),
    }
    Q.rebind_load_table(scaled_loader(k))
    original_tag = Q.get_cache_tag()
    tag = f"x{k}" if k != 1 else ""
    Q.set_cache_tag(tag)
    try:
        out: dict[str, float] = {}
        for name, (kind, fn) in rows.items():

            def run(kind=kind, fn=fn):
                orig = _shared.CACHE_TAG
                _shared.CACHE_TAG = tag
                try:
                    leaf = _shared._cache_dir(kind, sf_dir)
                finally:
                    _shared.CACHE_TAG = orig
                shutil.rmtree(leaf, ignore_errors=True)
                fn(spark, sf_dir).count()
                spark.catalog.clearCache()
                unpersist_all_rdds(spark)

            out[name] = _timed_min(run)
        return out
    finally:
        Q.rebind_load_table(Q.load_table)
        Q.set_cache_tag(original_tag)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "lifecycles":
        k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
        spark = get_spark("stress_r14")
        spark.range(1000).selectExpr("sum(id)").collect()
        base = run_lifecycles(spark, sf_dir, 1)
        big = run_lifecycles(spark, sf_dir, k)
        print(f"| query (full lifecycle, fresh cache per rep) | 1x sec | {k}x sec | ratio |")
        print("|---|---|---|---|")
        for name in base:
            print(f"| {name} | {base[name]:.2f} | {big[name]:.2f} "
                  f"| {big[name] / base[name]:.1f}x |")
        return

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("stress_r14")
    spark.range(1000).selectExpr("sum(id)").collect()

    base = run_rows(spark, sf_dir, 1, SWEEP_ROWS)
    big = run_rows(spark, sf_dir, k, SWEEP_ROWS)
    print(f"| query (r13-restructured plan) | 1x sec | {k}x sec | ratio |")
    print("|---|---|---|---|")
    for name in SWEEP_ROWS:
        print(
            f"| {name} | {base[name]:.2f} | {big[name]:.2f} "
            f"| {big[name] / base[name]:.1f}x |"
        )
    print()
    priced = price_reliable(spark, sf_dir)
    print("| iterative query (1x) | local sec | reliable sec | overhead | reliable ckpts/run |")
    print("|---|---|---|---|---|")
    for name, lo, re, n in priced:
        print(f"| {name} | {lo:.2f} | {re:.2f} | {re / lo:.2f}x | {n} |")


if __name__ == "__main__":
    main()
