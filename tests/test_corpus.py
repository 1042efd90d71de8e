"""Unit tests for operators/corpus.py (LLM training-data shaping)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from commerce_data_pipeline_spark.operators import corpus as C


def _docs(spark, texts, langs=None):
    langs = langs or ["en"] * len(texts)
    return spark.createDataFrame(
        [(i, t, l) for i, (t, l) in enumerate(zip(texts, langs))],
        "doc_id long, text string, lang string",
    )


# ---------------------------------------------------------------- sampling

def test_stratified_sample_rate_bounds(spark):
    df = _docs(spark, [f"doc {i}" for i in range(200)])
    assert C.stratified_sample(df, {"en": 1.0}).count() == 200
    assert C.stratified_sample(df, {"en": 0.0}).count() == 0
    # absent stratum falls back to default_rate
    assert C.stratified_sample(df, {"zz": 1.0}, default_rate=0.0).count() == 0
    assert C.stratified_sample(df, {"zz": 0.0}, default_rate=1.0).count() == 200


def test_stratified_sample_deterministic_and_nested(spark):
    df = _docs(spark, [f"doc {i}" for i in range(300)])
    a = {r["doc_id"] for r in C.stratified_sample(df, {"en": 0.4}).collect()}
    b = {r["doc_id"] for r in C.stratified_sample(df, {"en": 0.4}).collect()}
    assert a == b  # same sample every run
    # lower rate selects a SUBSET of a higher rate (hash thresholding)
    small = {r["doc_id"] for r in C.stratified_sample(df, {"en": 0.2}).collect()}
    assert small <= a
    # rate roughly honored (hash-uniform: 300 rows, generous band)
    assert 60 <= len(a) <= 180


def test_stratified_sample_rate_differs_by_stratum(spark):
    df = _docs(spark, [f"doc {i}" for i in range(100)], ["en"] * 50 + ["de"] * 50)
    out = C.stratified_sample(df, {"en": 1.0, "de": 0.0})
    langs = {r["lang"] for r in out.collect()}
    assert langs == {"en"} and out.count() == 50


# ----------------------------------------------------------- contamination

def test_contamination_full_and_zero_overlap(spark):
    texts = [
        "alpha beta gamma delta epsilon",   # 0: in benchmark
        "alpha beta gamma delta epsilon",   # 1: identical to benchmark doc
        "one two three four five six",      # 2: disjoint
        "xx",                               # 3: too short for 3-shingles
    ]
    df = _docs(spark, texts)
    bench = df.filter(F.col("doc_id") == 0)
    rows = {r["doc_id"]: r for r in C.benchmark_contamination(df, bench).collect()}
    assert rows[1]["overlap_e6"] == 1_000_000 and rows[1]["contaminated"]
    assert rows[2]["n_hits"] == 0 and not rows[2]["contaminated"]
    assert rows[3]["n_shingles"] == 0 and rows[3]["overlap_e6"] == 0


def test_contamination_partial_overlap(spark):
    # doc 1 shares exactly its first 3-shingle with the benchmark doc
    df = _docs(spark, ["a b c d", "a b c z z2 z3"])
    bench = df.filter(F.col("doc_id") == 0)
    row = {r["doc_id"]: r for r in C.benchmark_contamination(df, bench).collect()}[1]
    assert row["n_shingles"] == 4 and row["n_hits"] == 1
    assert row["overlap_e6"] == 250_000


# ----------------------------------------------------------------- packing

def test_chunk_pack_offsets_and_spans(spark):
    df = spark.createDataFrame(
        [(0, "en", 300), (1, "en", 300), (2, "en", 600), (3, "de", 100)],
        "doc_id long, lang string, n_tokens long",
    )
    rows = {r["doc_id"]: r for r in C.chunk_pack(df, budget=512).collect()}
    assert (rows[0]["start_offset"], rows[0]["first_chunk"], rows[0]["last_chunk"]) == (0, 0, 0)
    # doc 1: offsets 300..599 → spans chunk 0 and 1
    assert (rows[1]["start_offset"], rows[1]["first_chunk"], rows[1]["last_chunk"]) == (300, 0, 1)
    # doc 2: offsets 600..1199 → chunks 1..2
    assert (rows[2]["start_offset"], rows[2]["first_chunk"], rows[2]["last_chunk"]) == (600, 1, 2)
    # separate group restarts at offset 0
    assert (rows[3]["start_offset"], rows[3]["first_chunk"], rows[3]["last_chunk"]) == (0, 0, 0)


def test_greedy_pack_bins_and_oversize(spark):
    df = spark.createDataFrame(
        [(0, "en", 300), (1, "en", 300), (2, "en", 200), (3, "en", 900), (4, "en", 10)],
        "doc_id long, lang string, n_tokens long",
    )
    rows = {r["doc_id"]: r for r in C.greedy_pack(df, budget=512).collect()}
    assert rows[0]["bin_id"] == 0 and rows[0]["bin_fill"] == 300
    assert rows[1]["bin_id"] == 1  # 300+300 > 512 → new bin
    assert rows[2]["bin_id"] == 1 and rows[2]["bin_fill"] == 500
    assert rows[3]["bin_id"] == 2 and rows[3]["bin_fill"] == 900  # oversize: own bin
    assert rows[4]["bin_id"] == 3  # 900+10 > 512 → next bin


def test_greedy_pack_never_splits_and_respects_budget(spark):
    import random

    rng = random.Random(3)
    data = [(i, "en", rng.randrange(1, 400)) for i in range(60)]
    df = spark.createDataFrame(data, "doc_id long, lang string, n_tokens long")
    rows = sorted(C.greedy_pack(df, budget=512).collect(), key=lambda r: r["doc_id"])
    fills: dict[int, int] = {}
    for r in rows:
        fills[r["bin_id"]] = fills.get(r["bin_id"], 0) + r["n_tokens"]
        assert fills[r["bin_id"]] == r["bin_fill"]
    # every doc < 400 < budget here, so no bin may exceed the budget
    assert all(v <= 512 for v in fills.values())
    # bins are consecutive starting at 0
    assert sorted(fills) == list(range(len(fills)))


# --------------------------------------------------------------- redaction

def test_redact_pii_counts_and_replacement(spark):
    df = _docs(
        spark,
        [
            "reach me at jane.doe+spam@mail.example.org or 555-123-4567.",
            "no pii here at all",
            "two mails a@b.io c@d.ai one phone 111-222-3333",
        ],
    )
    rows = {r["doc_id"]: r for r in C.redact_pii(df).collect()}
    assert (rows[0]["n_emails"], rows[0]["n_phones"]) == (1, 1)
    assert "<EMAIL>" in rows[0]["redacted_text"] and "<PHONE>" in rows[0]["redacted_text"]
    assert "jane.doe" not in rows[0]["redacted_text"]
    assert "555-123-4567" not in rows[0]["redacted_text"]
    assert rows[1]["redacted_text"] == "no pii here at all"
    assert (rows[2]["n_emails"], rows[2]["n_phones"]) == (2, 1)


def test_redact_pii_phone_word_boundary(spark):
    # embedded in a longer digit run → \b prevents a match
    df = _docs(spark, ["serial 9555-123-45678 is not a phone"])
    r = C.redact_pii(df).collect()[0]
    assert r["n_phones"] == 0 and "<PHONE>" not in r["redacted_text"]


# -------------------------------------------------------------------- mix

def test_quota_topk_caps_each_group(spark):
    df = spark.createDataFrame(
        [(i, "g" + str(i % 2), float(i)) for i in range(10)],
        "doc_id long, grp string, score double",
    )
    out = C.quota_topk(df, ["grp"], [F.desc("score"), F.asc("doc_id")], k=2)
    rows = sorted(out.collect(), key=lambda r: (r["grp"], r["rank"]))
    assert [(r["grp"], r["doc_id"], r["rank"]) for r in rows] == [
        ("g0", 8, 1), ("g0", 6, 2), ("g1", 9, 1), ("g1", 7, 2),
    ]


def test_fixed_size_sample_exact_k_and_stable(spark):
    df = _docs(spark, [f"doc {i}" for i in range(100)], ["en"] * 60 + ["de"] * 40)
    out = C.fixed_size_sample(df, k=7)
    counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"en": 7, "de": 7}
    # deterministic: identical ids on re-evaluation
    a = {r["doc_id"] for r in out.collect()}
    b = {r["doc_id"] for r in C.fixed_size_sample(df, k=7).collect()}
    assert a == b
    # k larger than the stratum returns the whole stratum
    tiny = _docs(spark, ["x", "y"], ["fr", "fr"])
    assert C.fixed_size_sample(tiny, k=10).count() == 2


def test_train_val_test_split_stable_partition(spark):
    df = _docs(spark, [f"doc {i}" for i in range(300)])
    out = C.train_val_test_split(df, val_pct=0.1, test_pct=0.1)
    rows = out.collect()
    assert len(rows) == 300  # partition: every row assigned exactly once
    by_split = {}
    for r in rows:
        by_split.setdefault(r["split"], set()).add(r["doc_id"])
    assert set(by_split) <= {"train", "val", "test"}
    # splits are disjoint and stable across evaluations
    again = {r["doc_id"]: r["split"] for r in
             C.train_val_test_split(df, val_pct=0.1, test_pct=0.1).collect()}
    for split, ids in by_split.items():
        assert all(again[i] == split for i in ids)
    # roughly 80/10/10 (hash-uniform, generous band)
    assert len(by_split.get("train", ())) > 200


def test_greedy_pack_with_int_shard_group(spark):
    # the documented 100 TB group key is (lang, shard) with an INT shard —
    # the output schema must carry the real group-col types
    df = spark.createDataFrame(
        [(0, "en", 0, 300), (1, "en", 0, 300), (2, "en", 1, 400), (3, "en", 1, 200)],
        "doc_id long, lang string, shard int, n_tokens long",
    )
    out = C.greedy_pack(df, budget=512, group_cols=["lang", "shard"])
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[0]["shard"] == 0 and rows[1]["bin_id"] == 1
    assert rows[2]["bin_id"] == 0 and rows[3]["bin_id"] == 1  # shard 1 independent


def test_token_budget_select_whole_doc_semantics(spark):
    rows = [
        ("en", 1, 100), ("en", 2, 100), ("en", 3, 100),
        ("de", 4, 50), ("de", 5, 300),
    ]
    df = spark.createDataFrame(rows, "lang string, doc_id long, n_tokens long")
    out = {r["doc_id"]: r for r in C.token_budget_select(
        df, budget=250, group_cols=["lang"]).collect()}
    # en: 100+100 fits, third crosses 250 → dropped
    # de: cum after 4 = 50, doc 5 pushes cum to 350 > 250 → dropped
    assert set(out) == {1, 2, 4}
    assert out[2]["cum_tokens"] == 200
    assert out[4]["cum_tokens"] == 50


def test_token_budget_respects_priority_order(spark):
    from pyspark.sql import functions as F

    rows = [("en", 1, 5, 100), ("en", 2, 9, 200), ("en", 3, 7, 180)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, q long, n_tokens long")
    kept = sorted(r["doc_id"] for r in C.token_budget_select(
        df, budget=380, group_cols=["lang"],
        order_cols=[F.desc("q"), F.asc("doc_id")]).collect())
    # priority: 2 (200), then 3 (cum 380 fits), then 1 (cum 480 > 380)
    assert kept == [2, 3]


def test_overlap_chunks_spans(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 300)], "doc_id long, n_tokens long"
    )
    rows = sorted(
        (r["doc_id"], r["chunk_index"], r["start_tok"], r["span_len"])
        for r in C.overlap_chunks(df, size=128, stride=64).collect()
    )
    # doc 1 (10 toks < size): one chunk covering the whole doc
    assert rows[0] == (1, 0, 0, 10)
    # doc 2 (300 toks): last start = ceil((300-128)/64)·64 = 192
    doc2 = [r for r in rows if r[0] == 2]
    assert [(r[1], r[2]) for r in doc2] == [(0, 0), (1, 64), (2, 128), (3, 192)]
    assert doc2[-1][3] == 108  # final chunk truncated: 300 - 192
    # every token is covered by at least one chunk
    covered = set()
    for _, _, start, span in doc2:
        covered |= set(range(start, start + span))
    assert covered == set(range(300))


def test_epoch_shuffle_deterministic_and_epoch_dependent(spark):
    from commerce_data_pipeline_spark.operators import corpus as C

    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = C.epoch_shuffle(docs, epoch=1, n_buckets=8).collect()
    # same epoch, different partitioning → identical (file, offset) layout
    b = C.epoch_shuffle(docs.repartition(7), epoch=1, n_buckets=8).collect()
    key = lambda rows: sorted((r["doc_id"], r["bucket"], r["pos_in_bucket"]) for r in rows)
    assert key(a) == key(b)
    # every doc appears exactly once; positions are gapless per bucket
    assert len({r["doc_id"] for r in a}) == 200
    from collections import defaultdict
    per = defaultdict(list)
    for r in a:
        per[r["bucket"]].append(r["pos_in_bucket"])
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in per.values())
    # a different epoch produces a different order
    c = C.epoch_shuffle(docs, epoch=2, n_buckets=8).collect()
    assert key(a) != key(c)


def test_epoch_shuffle_populates_past_256_buckets(spark):
    # bucket now derives from 32 key bits: counts above the old one-byte
    # ceiling must actually populate (256+ distinct buckets on 4000 docs)
    from commerce_data_pipeline_spark.operators import corpus as C

    docs = spark.createDataFrame([(i,) for i in range(4000)], "doc_id long")
    out = C.epoch_shuffle(docs, epoch=1, n_buckets=1000)
    n_distinct = out.select("bucket").distinct().count()
    assert n_distinct > 256
    assert out.agg(F.max("bucket")).first()[0] <= 999
    assert out.agg(F.min("bucket")).first()[0] >= 0

    with pytest.raises(ValueError):
        C.epoch_shuffle(docs, epoch=1, n_buckets=0)
    with pytest.raises(ValueError):
        C.epoch_shuffle(docs, epoch=1, n_buckets=(1 << 20) + 1)


# ---------------------------------------------------------------------------
# temperature_mix
# ---------------------------------------------------------------------------

def test_temperature_mix_upweights_small_sources(spark):
    from commerce_data_pipeline_spark.operators.corpus import temperature_mix

    rows = [(i, "big") for i in range(900)] + [(900 + i, "small") for i in range(100)]
    docs = spark.createDataFrame(rows, ["doc_id", "source"])
    out = temperature_mix(docs, alpha=0.5, target=200)
    thr = {r["source"]: r["thr_e4"] for r in out.select("source", "thr_e4").distinct().collect()}
    # sqrt weighting: per-DOC keep rate for the small source must exceed
    # the big source's by ~3x (sqrt(900)/900 = 1/30 vs sqrt(100)/100 = 1/10)
    assert thr["small"] > 2 * thr["big"]
    # expected total ≈ target (hash sampling: loose band)
    n = out.count()
    assert 120 <= n <= 280


def test_temperature_mix_alpha1_is_proportional(spark):
    from commerce_data_pipeline_spark.operators.corpus import temperature_mix

    rows = [(i, "a") for i in range(400)] + [(400 + i, "b") for i in range(100)]
    docs = spark.createDataFrame(rows, ["doc_id", "source"])
    out = temperature_mix(docs, alpha=1.0, target=100)
    thr = {r["source"]: r["thr_e4"] for r in out.select("source", "thr_e4").distinct().collect()}
    # alpha=1: every source keeps the same per-doc rate = target/N
    assert thr["a"] == thr["b"] == 100 * 10000 // 500


def test_temperature_mix_validation(spark):
    import pytest
    from commerce_data_pipeline_spark.operators.corpus import temperature_mix

    docs = spark.createDataFrame([(1, "a")], ["doc_id", "source"])
    with pytest.raises(ValueError, match="alpha"):
        temperature_mix(docs, alpha=1.5)
    with pytest.raises(ValueError, match="target"):
        temperature_mix(docs, target=0)


def test_weighted_sample_matches_python_replay(spark):
    import hashlib
    import math

    from pyspark.sql import Row

    rows = [Row(doc_id=i, w=(i % 7) * 10 + (1 if i % 7 else 0) * 0) for i in range(40)]
    df = spark.createDataFrame(rows)
    out = C.weighted_sample(df, "w", k=8, id_col="doc_id").collect()

    def key(i, w):
        v = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        u = (v + 1) / 4294967297.0
        return math.floor(1000000000.0 * (-math.log(u)) / float(w))

    expect = sorted(
        ((key(i, (i % 7) * 10), i) for i in range(40) if (i % 7) * 10 > 0)
    )[:8]
    assert [(r["key_e9"], r["doc_id"]) for r in out] == expect
    # zero-weight rows (i % 7 == 0) can never appear
    assert all(r["doc_id"] % 7 != 0 for r in out)


def test_weighted_sample_prefers_heavy_rows(spark):
    from pyspark.sql import Row

    # weights 1 vs 1000: the heavy half should dominate the sample
    df = spark.createDataFrame(
        [Row(doc_id=i, w=1000 if i < 50 else 1) for i in range(100)]
    )
    got = C.weighted_sample(df, "w", k=20).collect()
    heavy = sum(1 for r in got if r["doc_id"] < 50)
    assert heavy >= 16


def test_split_leakage_detects_row_level_splits(spark):
    from commerce_data_pipeline_spark.operators.corpus import split_leakage

    rows = [
        # entity 1: rows split consistently
        (1, "a", "train"), (1, "b", "train"),
        # entity 2: straddles train/test -> leaked (3 rows)
        (2, "c", "train"), (2, "d", "test"), (2, "e", "test"),
        # entity 3: single row
        (3, "f", "val"),
    ]
    df = spark.createDataFrame(rows, "ent int, rid string, split string")
    out = split_leakage(df, "ent").collect()[0]
    assert (
        out["n_entities"], out["n_rows"], out["n_leaked_entities"], out["n_leaked_rows"]
    ) == (3, 6, 1, 3)


def test_split_leakage_clean_on_entity_hash(spark, sf_dir):
    from commerce_data_pipeline_spark.operators.corpus import (
        split_leakage, train_val_test_split,
    )

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    by_cust = train_val_test_split(orders, id_col="o_custkey")
    clean = split_leakage(by_cust, "o_custkey").collect()[0]
    assert clean["n_leaked_entities"] == 0 and clean["n_leaked_rows"] == 0
    # the row-level split really does leak (the audit is falsifiable)
    by_order = train_val_test_split(orders, id_col="o_orderkey")
    dirty = split_leakage(by_order, "o_custkey").collect()[0]
    assert dirty["n_leaked_entities"] > 0
    assert dirty["n_leaked_rows"] > dirty["n_leaked_entities"]
