"""One-off r16 measurement sweep (appends nothing — prints STRESS.md-ready
tables). Jobs, covering this round's touched paths:

1. (default) 8× scaling of the restructured LM family: bigram_lm and
   heldout_perplexity after the single-explode / single-conditional-agg
   rewrite (VERDICT r15 #4) — the held-out path no longer re-scans and
   re-explodes the train slice, so its ratio should sit in the same
   data-bound band as the self-scored row, not above it.

2. `lifecycles [K]` — fresh-cache FULL-lifecycle timing for this
   round's pre-built never-attested candidate (ann_commit_selfheal:
   build -> deferred split -> simulated commit crash -> self-healing
   maintenance pass -> probe) at 1x and Kx — the stress_r13/r14/r15
   precedent for lifecycle rows.

3. `midswap [K]` — same fresh-cache lifecycle sweep for the session's
   second pre-built candidate (ann_recover_midswap: build -> deferred
   split -> simulated mid-swap crash -> guard + commit refusals ->
   recover rollback + sweep -> probe).

4. `recovercommit [K]` — same sweep for the third candidate
   (ann_recover_commit: build -> deferred split -> public
   recover(commit) -> routine-pass clean check -> probe).

5. `fpledger [K]` — same sweep for the fourth candidate
   (ledger_fp_new: two-run FingerprintLedger ingest -> replayed
   commit -> compact -> filter_new of a re-crawl-bearing batch).

6. `deltacc [K]` — scaling sweep for the fifth candidate
   (part_components_delta: previous-labels star compression +
   delta-only re-convergence vs the full graph; warm shared
   copurchase cache, the family contract).

    python tools/stress_r16.py            # LM family at 1x vs 8x
    python tools/stress_r16.py lifecycles [K] [sf_dir]
    python tools/stress_r16.py midswap [K] [sf_dir]
    python tools/stress_r16.py recovercommit [K] [sf_dir]
    python tools/stress_r16.py fpledger [K] [sf_dir]
    python tools/stress_r16.py deltacc [K] [sf_dir]

NEVER run concurrently with pytest/oracle/bench — contention fakes
scaling cliffs (the standing harness rule).
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from commerce_data_pipeline_spark import queries as Q
from commerce_data_pipeline_spark.session import get_spark
from tools.stress import _timed_min, run_at_scale, scaled_loader, unpersist_all_rdds

LM_ROWS = ["bigram_lm", "heldout_perplexity"]


def run_lifecycles(spark, sf_dir: str, k: int) -> dict[str, float]:
    """Fresh-cache FULL-lifecycle timing for ann_commit_selfheal: build
    -> deferred split -> simulated commit crash (rename-aside copy
    deleted, retired lists left) -> routine maintenance pass (sweep) ->
    probe, fresh ivf_selfheal dir per rep."""
    from commerce_data_pipeline_spark.queries import _shared
    from commerce_data_pipeline_spark.queries.similarity import _q_ann_commit_selfheal

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
                leaf = _shared._cache_dir("ivf_selfheal", sf_dir)
            finally:
                _shared.CACHE_TAG = orig
            shutil.rmtree(leaf, ignore_errors=True)
            _q_ann_commit_selfheal(spark, sf_dir).count()
            spark.catalog.clearCache()
            unpersist_all_rdds(spark)

        out["ann_commit_selfheal"] = _timed_min(run)
        return out
    finally:
        Q.rebind_load_table(Q.load_table)
        Q.set_cache_tag(original_tag)


def run_midswap(spark, sf_dir: str, k: int) -> dict[str, float]:
    """Fresh-cache FULL-lifecycle timing for ann_recover_midswap: build
    -> deferred split -> simulated mid-swap crash (promoted routing
    deleted, only the rename-aside copy left) -> guard + commit
    refusals -> recover rollback + unroutable sweep -> probe, fresh
    ivf_midswap dir per rep."""
    from commerce_data_pipeline_spark.queries import _shared
    from commerce_data_pipeline_spark.queries.similarity import _q_ann_recover_midswap

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
                leaf = _shared._cache_dir("ivf_midswap", sf_dir)
            finally:
                _shared.CACHE_TAG = orig
            shutil.rmtree(leaf, ignore_errors=True)
            _q_ann_recover_midswap(spark, sf_dir).count()
            spark.catalog.clearCache()
            unpersist_all_rdds(spark)

        out["ann_recover_midswap"] = _timed_min(run)
        return out
    finally:
        Q.rebind_load_table(Q.load_table)
        Q.set_cache_tag(original_tag)


def run_recover_commit(spark, sf_dir: str, k: int) -> dict[str, float]:
    """Fresh-cache FULL-lifecycle timing for ann_recover_commit: build
    -> deferred split -> public recover(commit) + sweep -> routine-pass
    clean check -> probe, fresh ivf_recover_commit dir per rep."""
    from commerce_data_pipeline_spark.queries import _shared
    from commerce_data_pipeline_spark.queries.similarity import _q_ann_recover_commit

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
                leaf = _shared._cache_dir("ivf_recover_commit", sf_dir)
            finally:
                _shared.CACHE_TAG = orig
            shutil.rmtree(leaf, ignore_errors=True)
            _q_ann_recover_commit(spark, sf_dir).count()
            spark.catalog.clearCache()
            unpersist_all_rdds(spark)

        out["ann_recover_commit"] = _timed_min(run)
        return out
    finally:
        Q.rebind_load_table(Q.load_table)
        Q.set_cache_tag(original_tag)


def run_fpledger(spark, sf_dir: str, k: int) -> dict[str, float]:
    """Fresh-cache FULL-lifecycle timing for ledger_fp_new: two-run
    FingerprintLedger ingest -> replayed run-1 commit -> compact ->
    filter_new of the re-crawl-bearing batch, fresh fp_ledger dir per
    rep."""
    from commerce_data_pipeline_spark.queries import _shared
    from commerce_data_pipeline_spark.queries.dedup_text import _q_ledger_fp_new

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
                leaf = _shared._cache_dir("fp_ledger", sf_dir)
            finally:
                _shared.CACHE_TAG = orig
            shutil.rmtree(leaf, ignore_errors=True)
            _q_ledger_fp_new(spark, sf_dir).count()
            spark.catalog.clearCache()
            unpersist_all_rdds(spark)

        out["ledger_fp_new"] = _timed_min(run)
        return out
    finally:
        Q.rebind_load_table(Q.load_table)
        Q.set_cache_tag(original_tag)


def run_deltacc(spark, sf_dir: str, k: int) -> dict[str, float]:
    """Warm-cache timing for part_components_delta (the shared
    copurchase pairs cache is the family contract — it is built once
    per scale, outside the timed window, like run_at_scale does for
    registered X12 rows)."""
    from commerce_data_pipeline_spark.queries.profiling_ml import (
        _q_part_components_delta,
    )

    Q.rebind_load_table(scaled_loader(k))
    original_tag = Q.get_cache_tag()
    Q.set_cache_tag(f"x{k}" if k != 1 else "")
    try:
        _q_part_components_delta(spark, sf_dir).count()  # warm the cache
        out = {"part_components_delta": _timed_min(
            lambda: _q_part_components_delta(spark, sf_dir).count()
        )}
        spark.catalog.clearCache()
        unpersist_all_rdds(spark)
        return out
    finally:
        Q.rebind_load_table(Q.load_table)
        Q.set_cache_tag(original_tag)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "lifecycles":
        k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
        spark = get_spark("stress_r16")
        spark.range(1000).selectExpr("sum(id)").collect()
        base = run_lifecycles(spark, sf_dir, 1)
        big = run_lifecycles(spark, sf_dir, k)
        print(f"| query (full lifecycle, fresh cache per rep) | 1x sec | {k}x sec | ratio |")
        print("|---|---|---|---|")
        for name in base:
            print(f"| {name} | {base[name]:.2f} | {big[name]:.2f} "
                  f"| {big[name] / base[name]:.1f}x |")
        return

    if len(sys.argv) > 1 and sys.argv[1] == "deltacc":
        k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
        spark = get_spark("stress_r16")
        spark.range(1000).selectExpr("sum(id)").collect()
        base = run_deltacc(spark, sf_dir, 1)
        big = run_deltacc(spark, sf_dir, k)
        print(f"| query | 1x sec | {k}x sec | ratio |")
        print("|---|---|---|---|")
        for name in base:
            print(f"| {name} | {base[name]:.2f} | {big[name]:.2f} "
                  f"| {big[name] / base[name]:.1f}x |")
        return

    if len(sys.argv) > 1 and sys.argv[1] == "fpledger":
        k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
        spark = get_spark("stress_r16")
        spark.range(1000).selectExpr("sum(id)").collect()
        base = run_fpledger(spark, sf_dir, 1)
        big = run_fpledger(spark, sf_dir, k)
        print(f"| query (full lifecycle, fresh cache per rep) | 1x sec | {k}x sec | ratio |")
        print("|---|---|---|---|")
        for name in base:
            print(f"| {name} | {base[name]:.2f} | {big[name]:.2f} "
                  f"| {big[name] / base[name]:.1f}x |")
        return

    if len(sys.argv) > 1 and sys.argv[1] == "recovercommit":
        k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
        spark = get_spark("stress_r16")
        spark.range(1000).selectExpr("sum(id)").collect()
        base = run_recover_commit(spark, sf_dir, 1)
        big = run_recover_commit(spark, sf_dir, k)
        print(f"| query (full lifecycle, fresh cache per rep) | 1x sec | {k}x sec | ratio |")
        print("|---|---|---|---|")
        for name in base:
            print(f"| {name} | {base[name]:.2f} | {big[name]:.2f} "
                  f"| {big[name] / base[name]:.1f}x |")
        return

    if len(sys.argv) > 1 and sys.argv[1] == "midswap":
        k = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
        spark = get_spark("stress_r16")
        spark.range(1000).selectExpr("sum(id)").collect()
        base = run_midswap(spark, sf_dir, 1)
        big = run_midswap(spark, sf_dir, k)
        print(f"| query (full lifecycle, fresh cache per rep) | 1x sec | {k}x sec | ratio |")
        print("|---|---|---|---|")
        for name in base:
            print(f"| {name} | {base[name]:.2f} | {big[name]:.2f} "
                  f"| {big[name] / base[name]:.1f}x |")
        return

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("stress_r16")
    spark.range(1000).selectExpr("sum(id)").collect()
    base = run_at_scale(spark, sf_dir, 1, names=LM_ROWS, warm=True)
    big = run_at_scale(spark, sf_dir, k, names=LM_ROWS, warm=True)
    print(f"| query | 1x sec | {k}x sec | ratio |")
    print("|---|---|---|---|")
    for name in LM_ROWS:
        print(f"| {name} | {base[name]:.2f} | {big[name]:.2f} "
              f"| {big[name] / base[name]:.1f}x |")


if __name__ == "__main__":
    main()
