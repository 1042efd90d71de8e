"""One-off r15 measurement sweep (appends nothing — prints STRESS.md-ready
tables). Jobs, all r14 VERDICT directives / ADVICE items:

1. (#5) Price the DISTRIBUTED reliable-checkpoint path for the
   pagerank-family: at sf0.1 the budget-guarded driver fast path handles
   the graph and never reaches the distributed loop's checkpoint sites,
   so the r14 table priced part_pagerank at 0 reliable ckpts/run. This
   sweep re-runs part_pagerank and part_communities with
   driver_budget_edges=0 (the distributed loop a 100 TB graph would
   take), local vs reliable mode, and reports wall delta + reliable
   ckpts/run — which must be >= 1.

2. (r14 ADVICE) Harness fixes vs stress_r14: the per-rep checkpoint-dir
   division imports REPS from tools/stress instead of hardcoding 3, and
   BOTH legs (local and reliable) get one untimed warm rep before
   _timed_min so the comparison is symmetric.

3. Fresh-cache full-lifecycle timing for this round's new query
   (ann_veto_rollback: build -> gated veto -> rollback -> probe) at 1x
   and Kx — the stress_r13/r14 precedent for never-attested candidates.

    python tools/stress_r15.py            # distributed reliable pricing
    python tools/stress_r15.py lifecycles [K] [sf_dir]

NEVER run concurrently with pytest/oracle/bench — contention fakes
scaling cliffs (the standing harness rule).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F

from commerce_data_pipeline_spark import queries as Q
from commerce_data_pipeline_spark.operators import graph
from commerce_data_pipeline_spark.queries._shared import _ensure_copurchase_pairs
from commerce_data_pipeline_spark.session import get_spark
from tools.stress import REPS, _timed_min, scaled_loader, unpersist_all_rdds


def _distributed_pagerank(spark, sf_dir: str):
    """_q_part_pagerank's exact shape with the driver budget OFF — the
    distributed power-iteration loop (one src-key join + one dst-key agg
    + one checkpoint per round) a 100 TB graph would take."""
    pr = graph.pagerank(
        None, iterations=10,
        undirected_pairs=_ensure_copurchase_pairs(spark, sf_dir),
        driver_budget_edges=0,
    )
    return pr.orderBy(F.desc("rank"), F.asc("node")).limit(100)


def _distributed_communities(spark, sf_dir: str):
    """_q_part_communities with the driver budget OFF — the distributed
    3-round LPA loop (per round: dst-key join + two aggs + checkpoint)."""
    return graph.label_propagation(
        None, rounds=3,
        undirected_pairs=_ensure_copurchase_pairs(spark, sf_dir),
        driver_budget_edges=0,
    ).orderBy("node")


DISTRIBUTED_ROWS = {
    "part_pagerank (distributed)": _distributed_pagerank,
    "part_communities (distributed)": _distributed_communities,
}


def _count_checkpoint_dirs(ckpt_root: str) -> int:
    """Reliable checkpoints land as <root>/<uuid>/rdd-N dirs; count the
    rdd-N leaves written since the last sweep of the root."""
    n = 0
    for dirpath, dirnames, _ in os.walk(ckpt_root):
        n += sum(1 for d in dirnames if d.startswith("rdd-"))
    return n


def price_reliable_distributed(spark, sf_dir: str):
    """(name, local_sec, reliable_sec, n_reliable_checkpoints) per row.
    Symmetric legs (r14 ADVICE): each mode gets one untimed warm rep,
    then min-of-REPS; ckpts/run divides by the imported REPS."""
    from commerce_data_pipeline_spark.checkpoint import DIR_CONF, MODE_CONF

    rows = []
    ckpt_root = tempfile.mkdtemp(prefix="ckpt_price_")
    spark.conf.set(DIR_CONF, f"file://{ckpt_root}")
    try:
        for name, build in DISTRIBUTED_ROWS.items():

            def run(build=build):
                build(spark, sf_dir).count()
                spark.catalog.clearCache()
                unpersist_all_rdds(spark)

            spark.conf.set(MODE_CONF, "local")
            run()  # untimed warm
            t_local = _timed_min(run)
            spark.conf.set(MODE_CONF, "reliable")
            run()  # untimed warm — the reliable leg warms too (r14 ADVICE)
            before = _count_checkpoint_dirs(ckpt_root)
            t_rel = _timed_min(run)
            wrote = (_count_checkpoint_dirs(ckpt_root) - before) // REPS
            rows.append((name, t_local, t_rel, wrote))
    finally:
        spark.conf.set(MODE_CONF, "local")
        shutil.rmtree(ckpt_root, ignore_errors=True)
    return rows


def run_lifecycles(spark, sf_dir: str, k: int) -> dict[str, float]:
    """Fresh-cache FULL-lifecycle timing for ann_veto_rollback: build ->
    census -> pre-audit -> split -> post-audit -> VETO -> rollback ->
    probe, fresh ivf_veto dir per rep (the stress_r13/r14 precedent)."""
    from commerce_data_pipeline_spark.queries import _shared
    from commerce_data_pipeline_spark.queries.similarity import _q_ann_veto_rollback

    Q.rebind_load_table(scaled_loader(k))
    original_tag = Q.get_cache_tag()
    tag = f"x{k}" if k != 1 else ""
    Q.set_cache_tag(tag)
    try:
        out: dict[str, float] = {}

        def run():
            orig = _shared.CACHE_TAG
            _shared.CACHE_TAG = tag
            try:
                leaf = _shared._cache_dir("ivf_veto", sf_dir)
            finally:
                _shared.CACHE_TAG = orig
            shutil.rmtree(leaf, ignore_errors=True)
            _q_ann_veto_rollback(spark, sf_dir).count()
            spark.catalog.clearCache()
            unpersist_all_rdds(spark)

        out["ann_veto_rollback"] = _timed_min(run)
        return out
    finally:
        Q.rebind_load_table(Q.load_table)
        Q.set_cache_tag(original_tag)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "lifecycles":
        k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
        spark = get_spark("stress_r15")
        spark.range(1000).selectExpr("sum(id)").collect()
        base = run_lifecycles(spark, sf_dir, 1)
        big = run_lifecycles(spark, sf_dir, k)
        print(f"| query (full lifecycle, fresh cache per rep) | 1x sec | {k}x sec | ratio |")
        print("|---|---|---|---|")
        for name in base:
            print(f"| {name} | {base[name]:.2f} | {big[name]:.2f} "
                  f"| {big[name] / base[name]:.1f}x |")
        return

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("stress_r15")
    spark.range(1000).selectExpr("sum(id)").collect()
    priced = price_reliable_distributed(spark, sf_dir)
    print("| query (driver budget OFF) | local sec | reliable sec | overhead | reliable ckpts/run |")
    print("|---|---|---|---|---|")
    for name, lo, re, n in priced:
        print(f"| {name} | {lo:.2f} | {re:.2f} | {re / lo:.2f}x | {n} |")


if __name__ == "__main__":
    main()
