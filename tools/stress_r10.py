"""One-off 8x sweep of the r9/r10 additions not yet in STRESS.md (VERDICT
r9 directive #6; appends nothing — prints a STRESS.md-ready table). Reuses
the stress harness's scaled loader / cache-tag machinery.

    python tools/stress_r10.py [K] [sf_dir]

Four rows:
- ranking_auc_hicard: the exact AUC gate with an ALL-DISTINCT score
  (score = doc_id) — distinct-score cardinality is this operator's scale
  knob (the groupBy(score) contract: per-score groups shrink to 1 row,
  the range-exchange prefix sum carries k× more keys). Expect ≈ linear.
- calibration_bins: one window shuffle (per-source percentile) + a
  ≤ 10-key binning agg. Expect ≈ linear, window-bound.
- stream_attribution_pairs: the stream-twin interval join; copies carry
  disjoint user spaces, so pair output grows k× (never k²). Expect ≈
  linear.
- quality_gate_report (k× INGEST HISTORY, fixed bins): like the
  BandLedger row, this scales the LEDGER HISTORY k× (2k parquet appends
  of <= n_bins rows each) and times `report()` only — the contract
  (merged() scans O(k·n_bins) aggregate rows, never raw history)
  predicts a near-flat ratio, NOT ≈ k.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from commerce_data_pipeline_spark import queries as Q
from commerce_data_pipeline_spark.catalog import load_table
from commerce_data_pipeline_spark.operators import selection
from commerce_data_pipeline_spark.session import get_spark
from tools.stress import _timed_min, scaled_loader, unpersist_all_rdds

# vocab_coverage/fisher_dims joined in the second pass; knn_label_agreement
# is EXCLUDED by design: it composes brute_force_topk, the documented
# quadratic baseline (the scale path is the IVF index) — same exclusion as
# similarity_topk in tools/stress.py.
# knn_label_agreement_ivf IS swept: its query set is bounded (vec_id <
# 2500 — fixed 125 queries at any k under the key-shift harness) while the
# corpus and its sqrt(N) index grow, so the probe cost should be SUB-linear
# (list length ~sqrt(N) x 4 probes), unlike the excluded brute twin.
REGISTRY_ROWS = ["calibration_bins", "stream_attribution_pairs",
                 "vocab_coverage", "fisher_dims", "knn_label_agreement_ivf",
                 "value_ks_drift"]


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


def auc_hicard_time(spark, sf_dir: str, k: int) -> float:
    """ranking_auc with an all-distinct score: doc_id is unique per row
    (key-shifted per copy), so the groupBy(score) stage degenerates to
    one group per row — the operator's worst case and its true scale
    axis (the registry query's n_chars score has ~4k distinct values at
    any sf, which under-exercises the prefix sum)."""
    docs = scaled_loader(k)(spark, sf_dir, "documents").select(
        (F.col("lang") == "en").alias("y"), F.col("doc_id").alias("score")
    )

    def run():
        selection.ranking_auc(docs, "y", "score").count()
        spark.catalog.clearCache()
        unpersist_all_rdds(spark)

    return _timed_min(run)


def gate_report_time(spark, sf_dir: str, k: int) -> float:
    """QualityGateLedger report over a k× ingest history: 2k parity-split
    ingests (untimed — history build), then time report(). State is
    O(n_bins) per ingest and merged() never touches raw rows, so the
    ratio should be near-flat."""
    from commerce_data_pipeline_spark.sources.ledger import QualityGateLedger

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars"
    )
    cal = selection.calibrate_scores(
        docs.select("doc_id", "source", "n_chars"), "n_chars"
    )
    lab = docs.select("doc_id", (F.col("lang") == "en").alias("is_en"))
    scored = cal.join(lab, "doc_id").localCheckpoint()
    tmp = tempfile.mkdtemp(prefix=f"stress_gate_{k}x_")
    try:
        led = QualityGateLedger(spark, os.path.join(tmp, "bins"))
        for i in range(k):
            led.ingest(scored.filter(F.col("doc_id") % 2 == 0), "is_en", "calib_e6")
            led.ingest(scored.filter(F.col("doc_id") % 2 == 1), "is_en", "calib_e6")

        def run():
            led.report().count()
            spark.catalog.clearCache()
            unpersist_all_rdds(spark)

        return _timed_min(run)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("stress_r10")
    spark.range(1000).selectExpr("sum(id)").collect()

    run_registry(spark, sf_dir, 1)  # untimed warm pass
    base = run_registry(spark, sf_dir, 1)
    big = run_registry(spark, sf_dir, k)
    auc1 = auc_hicard_time(spark, sf_dir, 1)
    auck = auc_hicard_time(spark, sf_dir, k)
    gr1 = gate_report_time(spark, sf_dir, 1)
    grk = gate_report_time(spark, sf_dir, k)

    print(f"| query | 1x sec | {k}x sec | ratio |")
    print("|---|---|---|---|")
    print(f"| ranking_auc (all-distinct score, {k}x rows) | {auc1:.2f} | {auck:.2f} | {auck / auc1:.1f}x |")
    for name in REGISTRY_ROWS:
        print(f"| {name} | {base[name]:.2f} | {big[name]:.2f} | {big[name] / base[name]:.1f}x |")
    print(f"| quality_gate_report (fixed bins, {k}x INGEST HISTORY) | {gr1:.2f} | {grk:.2f} | {grk / gr1:.1f}x |")


if __name__ == "__main__":
    main()
