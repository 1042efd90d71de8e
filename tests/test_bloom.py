"""Bloom-filter decontamination (operators/bloom.py).

Pins: (1) the no-false-negative guarantee — every shingle actually present
in the benchmark set must hit the filter; (2) the packed bitmap layout
(word = pos div 64, bit = pos mod 64); (3) edge cases: short docs with no
shingles, parameter validation; (4) the scan-side plan shape — the check
stage must contain no joins and no shuffle exchanges.
"""

import pytest
from pyspark.sql import functions as F

from commerce_data_pipeline_spark.operators import bloom


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_no_false_negatives(spark):
    bench = _docs(spark, [(1, "alpha beta gamma delta epsilon zeta")])
    corpus = _docs(
        spark,
        [
            (10, "alpha beta gamma delta"),  # all shingles ⊂ benchmark
            (11, "totally unrelated words here now friend"),
        ],
    )
    bits = bloom.bloom_pack(bloom.bloom_build(bench, shingle_n=3))
    out = {
        r["doc_id"]: r
        for r in bloom.bloom_contamination(corpus, bits, shingle_n=3).collect()
    }
    # doc 10: both its 3-gram shingles appear verbatim in the benchmark —
    # Bloom can NEVER miss them
    assert out[10]["n_shingles"] == 2
    assert out[10]["n_bloom_hits"] == 2
    assert out[10]["hit_e6"] == 1_000_000
    assert out[10]["flagged"]
    # doc 11: hits can only be false positives; with 4 shingles against a
    # 4-shingle benchmark in a 2^17-bit filter, expect zero
    assert out[11]["n_bloom_hits"] == 0
    assert not out[11]["flagged"]


def test_benchmark_docs_fully_flagged(spark, sf_dir):
    from commerce_data_pipeline_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 37 == 0)
    bits = bloom.bloom_pack(bloom.bloom_build(bench))
    out = bloom.bloom_contamination(docs, bits)
    bench_rows = out.filter((F.col("doc_id") % 37 == 0) & (F.col("n_shingles") > 0))
    # every benchmark member's own shingles are all in the filter
    assert bench_rows.filter(F.col("hit_e6") != 1_000_000).count() == 0
    assert bench_rows.filter(~F.col("flagged")).count() == 0


def test_short_doc_has_no_shingles(spark):
    bench = _docs(spark, [(1, "alpha beta gamma delta")])
    corpus = _docs(spark, [(20, "two words")])
    bits = bloom.bloom_pack(bloom.bloom_build(bench, shingle_n=3))
    row = bloom.bloom_contamination(corpus, bits, shingle_n=3).collect()[0]
    assert row["n_shingles"] == 0
    assert row["n_bloom_hits"] == 0
    assert row["hit_e6"] == 0
    assert not row["flagged"]


def test_pack_layout(spark):
    bench = _docs(spark, [(1, "alpha beta gamma")])
    bm = bloom.bloom_build(bench, shingle_n=3, k=1).collect()
    bits = bloom.bloom_pack(
        bloom.bloom_build(bench, shingle_n=3, k=1)
    )
    # one shingle, k=1 → exactly one set bit, in the word the build stage says
    assert len(bm) == 1
    widx, word = bm[0]["word_idx"], bm[0]["bits"]
    assert bits[widx] == word
    assert sum(bin(w & ((1 << 64) - 1)).count("1") for w in bits) == 1


def test_param_validation(spark):
    bench = _docs(spark, [(1, "a b c d")])
    with pytest.raises(ValueError, match="multiple of 64"):
        bloom.bloom_build(bench, m_bits=100)
    with pytest.raises(ValueError, match="k must be"):
        bloom.bloom_build(bench, k=0)
    with pytest.raises(ValueError, match="exactly"):
        bloom.bloom_contamination(bench.withColumnRenamed("a", "a"), [0] * 7)


def test_check_stage_is_map_only(spark):
    corpus = _docs(spark, [(1, "alpha beta gamma delta")])
    bits = [0] * (bloom.DEFAULT_M_BITS // 64)
    plan = bloom.bloom_contamination(corpus, bits)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_scan_and_explode_methods_agree(spark, sf_dir):
    from commerce_data_pipeline_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 37 == 0)
    bits = bloom.bloom_pack(bloom.bloom_build(bench))
    a = bloom.bloom_contamination(docs, bits, method="scan")
    b = bloom.bloom_contamination(docs, bits, method="explode")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    with pytest.raises(ValueError, match="method"):
        bloom.bloom_contamination(docs, bits, method="nope")


def test_min_long_bitmap_word_roundtrips(spark):
    # a word with only bit 63 set is MIN_LONG — the SQL literal path must
    # spell it arithmetically (the parser rejects the bare literal)
    corpus = _docs(spark, [(1, "alpha beta gamma")])
    bits = [0] * (bloom.DEFAULT_M_BITS // 64)
    bits[0] = -(1 << 63)
    out = bloom.bloom_contamination(corpus, bits)
    assert out.count() == 1  # plan builds and runs


def test_fpr_audit_counts_only_false_positives(spark):
    """Probes are absent by construction (no spaces vs 3-gram shingles),
    so n_hits IS the false-positive count; with a near-empty filter the
    measured FPR must be ~0, and the booleans/bounds stay consistent."""
    from commerce_data_pipeline_spark.operators.bloom import (
        bloom_build, bloom_fpr_audit, bloom_pack,
    )

    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    bits = bloom_pack(bloom_build(bench, shingle_n=3))
    r = bloom_fpr_audit(bench, bits, shingle_n=3, n_probes=5000).collect()[0]
    assert r["n_inserted"] == 4  # 6 words -> 4 distinct 3-grams
    assert r["n_probes"] == 5000
    # 12 set bits of 131072 -> p ~ (12/131072)^3 ~ 1e-12: zero hits expected
    assert r["n_hits"] == 0 and r["fpr_e6"] == 0
    assert r["fpr_ok"]


def test_fpr_audit_detects_saturated_filter(spark):
    """An all-ones bitmap makes every probe a false positive — fpr_ok
    must flip (the audit is falsifiable, not decorative)."""
    from commerce_data_pipeline_spark.operators.bloom import (
        DEFAULT_M_BITS, bloom_fpr_audit,
    )

    bench = spark.createDataFrame([(0, "alpha beta gamma delta")], ["doc_id", "text"])
    saturated = [-1] * (DEFAULT_M_BITS // 64)
    r = bloom_fpr_audit(bench, saturated, shingle_n=3, n_probes=1000).collect()[0]
    assert r["n_hits"] == 1000 and r["fpr_e6"] == 1_000_000
    assert not r["fpr_ok"]
