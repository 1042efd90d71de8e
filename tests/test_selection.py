"""Unit tests for training-data selection operators (operators/selection.py):
the hashed-linear quality classifier and DSIR importance resampling."""

import pytest
from pyspark.sql import Row, functions as F

from commerce_data_pipeline_spark.operators import selection as S


def _docs(spark, texts, langs=None):
    langs = langs or ["en"] * len(texts)
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=lang) for i, (t, lang) in enumerate(zip(texts, langs))]
    )


def test_classifier_scores_deterministic_and_additive(spark):
    df = _docs(spark, ["alpha beta", "alpha beta", "alpha", "beta"])
    rows = {r["doc_id"]: r for r in S.classifier_scores(df).collect()}
    # identical text → identical score
    assert rows[0]["score"] == rows[1]["score"]
    # bag-of-words linearity: score("alpha beta") = score("alpha") + score("beta")
    assert rows[0]["score"] == rows[2]["score"] + rows[3]["score"]
    assert rows[0]["n_tokens"] == 2
    assert rows[2]["keep"] == (rows[2]["score"] >= 0)


def test_classifier_margin_floor_semantics(spark):
    df = _docs(spark, ["alpha beta gamma"])
    r = S.classifier_scores(df).collect()[0]
    import math

    assert r["margin_e4"] == math.floor(r["score"] * 10000.0 / r["n_tokens"])


def test_classifier_filter_keeps_only_nonnegative(spark):
    df = _docs(spark, [f"word{i} tail{i * 7} mid{i * 13}" for i in range(40)])
    scored = {r["doc_id"]: r["keep"] for r in S.classifier_scores(df).collect()}
    kept = {r["doc_id"] for r in S.classifier_filter(df).collect()}
    assert kept == {i for i, k in scored.items() if k}
    assert 0 < len(kept) < 40  # stub weights split the corpus both ways


def test_dsir_weights_favor_target_features(spark):
    # target docs share the bigram "good stuff"; raw-only docs share "bad junk"
    texts = ["good stuff here"] * 6 + ["bad junk there"] * 6
    langs = ["en"] * 6 + ["de"] * 6
    df = _docs(spark, texts, langs)
    w = S.dsir_bucket_weights(df, F.col("lang") == "en", n_buckets=64)
    lam = {r["bucket"]: r["lambda_e6"] for r in w.collect()}
    # bucket of a target-only bigram must outweigh a raw-only bigram's
    import hashlib

    def bucket(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 64

    assert lam[bucket("good stuff")] > lam[bucket("bad junk")]


def test_dsir_topk_selects_target_like_docs(spark):
    texts = ["the quick brown fox jumps over the lazy dog"] * 5 + [
        "der schnelle braune fuchs springt faul"
    ] * 5
    langs = ["en"] * 5 + ["de"] * 5
    df = _docs(spark, texts, langs)
    top = S.dsir_topk(df, F.col("lang") == "en", k=5)
    ids = {r["doc_id"] for r in top.collect()}
    assert ids == {0, 1, 2, 3, 4}


def test_dsir_scores_match_manual_codebook(spark):
    df = _docs(spark, ["a b c", "b c d"])
    w = S.dsir_bucket_weights(df, F.col("lang") == "en", n_buckets=32)
    lam = {r["bucket"]: r["lambda_e6"] for r in w.collect()}
    out = {r["doc_id"]: r for r in S.dsir_scores(df, w, n_buckets=32).collect()}
    import hashlib

    def bucket(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % 32

    for doc_id, text in ((0, "a b c"), (1, "b c d")):
        ws = text.split()
        grams = {f"{a} {b}" for a, b in zip(ws, ws[1:])}
        expect = sum(lam[bucket(g)] for g in grams)
        assert out[doc_id]["score_e6"] == expect
        assert out[doc_id]["n_feats"] == len(grams)


def test_dsir_scores_absent_bucket_gets_smoothed_zero_lambda(spark):
    # weights estimated on one corpus, scoring a DIFFERENT corpus whose
    # bigrams land in buckets the weights never saw: those buckets take
    # the add-one-smoothed zero-count lambda, not a silent 0
    import math

    ref = _docs(spark, ["a b", "a b"])
    w = S.dsir_bucket_weights(ref, F.col("lang") == "en", n_buckets=8)
    rows = w.collect()
    t_t = sum(int(r["n_target"]) for r in rows)
    t_r = sum(int(r["n_raw"]) for r in rows)
    lam_zero = int(math.floor(
        (math.log(1.0 / (t_t + 8.0)) - math.log(1.0 / (t_r + 8.0))) * 1e6))
    # pick a probe corpus whose single bigram hashes OUTSIDE the seen bucket
    import hashlib

    seen = {r["bucket"] for r in rows}
    probe = None
    for cand in ("x y", "p q", "m n", "u v", "c d", "e f", "g h"):
        a, b = cand.split()
        bkt = int(hashlib.md5(f"{a} {b}".encode()).hexdigest()[:8], 16) % 8
        if bkt not in seen:
            probe = cand
            break
    assert probe is not None, "all candidate bigrams landed in seen buckets"
    out = S.dsir_scores(_docs(spark, [probe]), w, n_buckets=8).collect()
    assert out[0]["score_e6"] == lam_zero


def test_dsir_empty_and_short_docs_drop_out(spark):
    df = _docs(spark, ["single", "two words", ""])
    w = S.dsir_bucket_weights(df, F.col("lang") == "en", n_buckets=16)
    scored = {r["doc_id"] for r in S.dsir_scores(df, w, n_buckets=16).collect()}
    assert scored == {1}  # only the doc with >= 2 words has bigram features


def _emb(spark, vecs):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in enumerate(vecs)]
    )


def test_mmr_rank1_is_most_relevant(spark):
    # id 0 = query; id 1 is a scaled copy of the query (cosine 1), id 2 orthogonal
    df = _emb(spark, [[1, 0, 0], [2, 0, 0], [0, 1, 0], [1, 1, 0]])
    out = {r["rank"]: r for r in S.mmr_rerank(df, k=3).collect()}
    assert out[1]["vec_id"] == 1
    assert out[1]["rel_e6"] == 1_000_000
    assert out[1]["max_sim_e6"] == 0  # nothing picked yet
    assert out[1]["mmr_score"] == 7 * 1_000_000


def test_mmr_diversity_beats_pure_relevance(spark):
    # q at 0°, candidates at −5° (id1), −4° (id2), +10° (id3). Pure
    # relevance orders 2, 1, 3; after picking id2, id1 is a near-twin
    # (sim cos1° ≈ .9998) so MMR's second pick is the farther id3:
    # 7·984894 − 3·970347 = 3983217 > 7·996119 − 3·999837 = 3973322
    # (exact integer scores under the q_scale=1000 contract).
    import math as m

    def at(deg):
        return [m.cos(m.radians(deg)), m.sin(m.radians(deg))]

    df = _emb(spark, [at(0), at(-5), at(-4), at(10)])
    picked = [r["vec_id"] for r in sorted(S.mmr_rerank(df, k=3).collect(), key=lambda r: r["rank"])]
    assert picked == [2, 3, 1]


def test_mmr_score_arithmetic_and_ordering(spark):
    df = _emb(spark, [[1, 0], [3, 1], [1, 3], [2, 2], [0, 1]])
    rows = sorted(S.mmr_rerank(df, k=4, pool=10).collect(), key=lambda r: r["rank"])
    assert [r["rank"] for r in rows] == [1, 2, 3, 4]
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == 4 and 0 not in ids
    for r in rows:
        assert r["mmr_score"] == 7 * r["rel_e6"] - 3 * r["max_sim_e6"]
    # determinism: bit-identical on re-run
    again = sorted(S.mmr_rerank(df, k=4, pool=10).collect(), key=lambda r: r["rank"])
    assert [tuple(r) for r in again] == [tuple(r) for r in rows]


def test_mmr_zero_norm_and_missing_query(spark):
    # zero-norm candidates are excluded (cosine undefined)
    df = _emb(spark, [[1, 0], [0, 0], [0, 1]])
    ids = {r["vec_id"] for r in S.mmr_rerank(df, k=5).collect()}
    assert ids == {2}
    with pytest.raises(ValueError):
        S.mmr_rerank(df, query_id=99)
    with pytest.raises(ValueError):
        S.mmr_rerank(df, query_id=1)  # zero-norm query


def test_mmr_incremental_matches_naive_spec(spark):
    # regression pin for the incremental max-sim bookkeeping: on vectors
    # engineered to have NEGATIVE pairwise cosines (the case a 0-floored
    # sentinel silently breaks), the operator must equal a naive
    # recompute-everything reference run in plain Python
    import math
    import random

    rng = random.Random(7)
    vecs = [[rng.uniform(-1, 1) for _ in range(8)] for _ in range(30)]
    vecs[0] = [1.0] + [0.0] * 7  # query
    df = _emb(spark, vecs)
    out = sorted(S.mmr_rerank(df, k=10, pool=25).collect(), key=lambda r: r["rank"])

    def q(v):
        return [math.floor(x * 1000.0) for x in v]

    cand_rows = []
    q0 = q(vecs[0])
    n0 = sum(x * x for x in q0)
    for i, v in enumerate(vecs[1:], start=1):
        qv = q(v)
        n2 = sum(x * x for x in qv)
        if n2 <= 0:
            continue
        dot = sum(a * b for a, b in zip(qv, q0))
        rel = math.floor(1000000.0 * dot / (math.sqrt(n2) * math.sqrt(n0)))
        cand_rows.append((i, qv, n2, rel))
    cand_rows.sort(key=lambda r: (-r[3], r[0]))
    cand = {r[0]: (r[1], r[2], r[3]) for r in cand_rows[:25]}

    def sim(a, b):
        va, na2, _ = cand[a]
        vb, nb2, _ = cand[b]
        d = sum(x * y for x, y in zip(va, vb))
        return math.floor(1000000.0 * d / (math.sqrt(na2) * math.sqrt(nb2)))

    picked, rem = [], set(cand)
    for rank in range(1, 11):
        best = None
        for cid in rem:
            ms = max((sim(cid, p[1]) for p in picked), default=0)
            sc = 7 * cand[cid][2] - 3 * ms
            if best is None or (-sc, cid) < best[0]:
                best = ((-sc, cid), cid, cand[cid][2], ms, sc)
        _, cid, rc, ms, sc = best
        picked.append((rank, cid, rc, ms, sc))
        rem.discard(cid)
    assert [tuple(r) for r in out] == picked
    # the scenario actually exercises negative maxima
    assert any(p[3] < 0 for p in picked)


def test_calibrate_scores_percentile_semantics(spark):
    rows = [
        Row(doc_id=1, source="a", s=10),
        Row(doc_id=2, source="a", s=20),
        Row(doc_id=3, source="a", s=20),  # tie broken by id
        Row(doc_id=4, source="a", s=99),
        Row(doc_id=5, source="b", s=7),   # singleton group -> 0
    ]
    df = spark.createDataFrame(rows)
    out = {r["doc_id"]: r["calib_e6"] for r in
           S.calibrate_scores(df, "s", group_col="source").collect()}
    # group a: ranks 1..4 over (s, id) -> percent_rank 0, 1/3, 2/3, 1
    assert out[1] == 0
    assert out[2] == 333333
    assert out[3] == 666666
    assert out[4] == 1000000
    assert out[5] == 0


def _naive_auc_e6(pairs):
    """Reference AUC by literal pairwise Mann-Whitney counting: 1 per
    positive>negative pair, ½ per tie, floored to e6 in exact integer
    arithmetic (U2 = twice the U statistic, so ties stay integral)."""
    pos = [s for lab, s in pairs if lab]
    neg = [s for lab, s in pairs if not lab]
    if not pos or not neg:
        return None
    u2 = sum(2 if p > n else (1 if p == n else 0) for p in pos for n in neg)
    return (1_000_000 * u2) // (2 * len(pos) * len(neg))


@pytest.mark.parametrize(
    "pairs",
    [
        # tie-heavy mixed ranking
        [(True, 5), (True, 3), (False, 3), (False, 1), (True, 3), (False, 5)],
        # perfect separation → 1_000_000
        [(True, 10), (True, 9), (False, 2), (False, 1)],
        # perfectly inverted → 0
        [(False, 10), (False, 9), (True, 2), (True, 1)],
        # all scores tied → exactly 500_000
        [(True, 7), (False, 7), (True, 7), (False, 7)],
        # negative scores and an asymmetric class balance
        [(True, -1), (False, -3), (False, -1), (False, 0), (False, -2)],
    ],
)
def test_ranking_auc_matches_naive_pairwise(spark, pairs):
    df = spark.createDataFrame(pairs, ["label", "score"])
    r = S.ranking_auc(df, "label", "score").collect()[0]
    assert r["n_pos"] == sum(1 for lab, _ in pairs if lab)
    assert r["n_neg"] == sum(1 for lab, _ in pairs if not lab)
    assert r["auc_e6"] == _naive_auc_e6(pairs)


@pytest.mark.parametrize("label", [True, False])
def test_ranking_auc_degenerate_single_class_is_null(spark, label):
    """Zero positives (or zero negatives) means AUC is undefined — the
    operator returns NULL, never a division error or a fake 0/1."""
    df = spark.createDataFrame([(label, s) for s in (1, 2, 3)], ["label", "score"])
    r = S.ranking_auc(df, "label", "score").collect()[0]
    assert r["auc_e6"] is None
    assert (r["n_pos"] == 0) == (not label)


def test_ranking_auc_banded_bound_contains_exact(spark):
    """The falsifiable contract: for ANY band count, the banded AUC's
    reported error interval must contain the exact Mann-Whitney AUC.
    Coarser bands → wider (but still honest) bounds."""
    rows = [((i % 3 == 0), (i * 37) % 101 - 50) for i in range(200)]
    df = spark.createDataFrame(rows, ["label", "score"])
    exact = S.ranking_auc(df, "label", "score").collect()[0]["auc_e6"]
    last_err = None
    for n_bands in (2, 4, 10):
        r = S.ranking_auc_banded(df, "label", "score", n_bands=n_bands).collect()[0]
        assert abs(r["auc_banded_e6"] - exact) <= r["max_err_e6"]
        assert r["n_pos"] == sum(1 for lab, _ in rows if lab)
        assert r["n_neg"] == sum(1 for lab, _ in rows if not lab)
        if last_err is not None:
            assert r["max_err_e6"] <= last_err  # finer bands tighten the bound
        last_err = r["max_err_e6"]


def test_ranking_auc_banded_degenerate_and_validation(spark):
    df = spark.createDataFrame([(True, s) for s in (1, 2, 3)], ["label", "score"])
    r = S.ranking_auc_banded(df, "label", "score").collect()[0]
    assert r["auc_banded_e6"] is None and r["max_err_e6"] is None
    with pytest.raises(ValueError):
        S.ranking_auc_banded(df, "label", "score", n_bands=1)
    with pytest.raises(ValueError):
        # 1/3 has no exact 6-decimal form — the cross-engine boundary
        # contract refuses rather than silently diverging from an oracle
        S.ranking_auc_banded(df, "label", "score", n_bands=3)


def _naive_calibration(rows, n_bins=10, scale=1_000_000):
    bins = {}
    for y, c in rows:
        if c is None:
            continue
        b = min(c * n_bins // scale, n_bins - 1)
        n, np_, sc = bins.get(b, (0, 0, 0))
        bins[b] = (n + 1, np_ + (1 if y else 0), sc + c)
    rep = {
        b: (
            n,
            np_,
            1_000_000 * np_ // n,
            1_000_000 * sc // (n * scale),
            1_000_000 * abs(np_ * scale - sc) // (n * scale),
        )
        for b, (n, np_, sc) in bins.items()
    }
    total = sum(n for n, _, _ in bins.values())
    gapsum = sum(abs(np_ * scale - sc) for _, np_, sc in bins.values())
    ece = (1_000_000 * gapsum) // (total * scale) if total else None
    return rep, total, ece


def test_calibration_report_matches_naive(spark):
    rows = [((i * 7) % 3 == 0, ((i * 131071) % 1_000_001)) for i in range(300)]
    rows += [(True, 1_000_000), (False, 0)]  # exact edges: top bin closes
    df = spark.createDataFrame(rows, ["label", "conf"])
    got = {
        r["bin"]: (r["n"], r["n_pos"], r["acc_e6"], r["avg_conf_e6"], r["gap_e6"])
        for r in S.calibration_report(df, "label", "conf").collect()
    }
    want, total, ece = _naive_calibration(rows)
    assert got == want
    e = S.expected_calibration_error(df, "label", "conf").collect()[0]
    assert (e["n"], e["ece_e6"]) == (total, ece)


def test_calibration_perfectly_calibrated_has_zero_gap(spark):
    """A bin where confidence equals realized accuracy exactly: 4 rows at
    conf 0.75, 3 of them positive → acc == avg_conf == 750000, gap 0."""
    rows = [(True, 750_000), (True, 750_000), (True, 750_000), (False, 750_000)]
    df = spark.createDataFrame(rows, ["label", "conf"])
    r = S.calibration_report(df, "label", "conf").collect()
    assert len(r) == 1 and r[0]["gap_e6"] == 0 and r[0]["acc_e6"] == 750_000
    assert S.expected_calibration_error(df, "label", "conf").collect()[0]["ece_e6"] == 0


def test_calibration_null_conf_excluded_and_validation(spark):
    df = spark.createDataFrame(
        [(True, 500_000), (False, None)], ["label", "conf"]
    )
    r = S.calibration_report(df, "label", "conf").collect()
    assert len(r) == 1 and r[0]["n"] == 1
    with pytest.raises(ValueError):
        S.calibration_report(df, "label", "conf", n_bins=1)


def test_ranking_auc_banded_approx_boundaries_keep_the_contract(spark):
    """The production switch (percentile_approx boundaries, same plan):
    the containment contract survives because the bound never reads
    boundary values — only realized band populations. On this input the
    sketch is exact (far under its accuracy budget), so the reports
    coincide too; the contract assertion is the part that holds at any
    scale."""
    rows = [((i % 3 == 0), (i * 37) % 101 - 50) for i in range(200)]
    df = spark.createDataFrame(rows, ["label", "score"])
    exact_auc = S.ranking_auc(df, "label", "score").collect()[0]["auc_e6"]
    r = S.ranking_auc_banded(
        df, "label", "score", n_bands=10, approx_boundaries=True
    ).collect()[0]
    assert abs(r["auc_banded_e6"] - exact_auc) <= r["max_err_e6"]
    assert r["n_pos"] == sum(1 for lab, _ in rows if lab)
    disc = S.ranking_auc_banded(df, "label", "score", n_bands=10).collect()[0]
    assert r == disc  # exact-regime sketch → identical banding end-to-end


def test_fisher_separation_exact(spark):
    """Hand-computable two-dim case: dim 0 separates classes, dim 1 does
    not; degenerate (zero-variance) dims yield NULL (den = 0)."""
    from commerce_data_pipeline_spark.operators.selection import fisher_separation

    rows = [
        (0, [1.0, 5.0]),
        (0, [1.1, 5.2]),
        (1, [3.0, 5.1]),
        (1, [3.1, 5.3]),
    ]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    out = {r["dim"]: r for r in fisher_separation(df, 0, top_k=2).collect()}
    # dim 0: means 1.05 vs 3.05, tiny within-class variance → huge score
    # dim 1: overlapping → small score
    assert out[0]["fisher_e6"] > out[1]["fisher_e6"] > 0
    assert out[0]["n0"] == 2 and out[0]["n1"] == 2


def test_fisher_separation_null_when_degenerate(spark):
    from commerce_data_pipeline_spark.operators.selection import fisher_separation

    # all-identical coordinates: den = 0 → NULL, ranked last
    df = spark.createDataFrame(
        [(0, [2.0]), (1, [2.0])], "label int, embedding array<float>"
    )
    out = fisher_separation(df, 0, top_k=1).collect()
    assert out[0]["fisher_e6"] is None


def test_calibration_negative_conf_raises(spark):
    """r10 ADVICE: the binning `div` truncates toward zero, so a negative
    confidence (outside the [0, conf_scale] domain) must raise scan-side
    rather than silently landing in a bin floor division would not pick."""
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    from commerce_data_pipeline_spark.operators import selection as S

    df = spark.createDataFrame(
        [(True, 500_000), (False, -1)], "label boolean, conf long"
    )
    with pytest.raises((SparkRuntimeException, Py4JJavaError)) as exc:
        S.calibration_report(df, "label", "conf").collect()
    assert "negative" in str(exc.value)


def test_fisher_separation_large_coordinates_exact(spark):
    """r10 ADVICE: |v| ~ 4000 at e6 quantization squares past int64
    (16e18 > 9.2e18) — the decimal square must stay exact where the old
    BIGINT square wrapped. With symmetric classes around distinct means,
    fisher is replayable by hand."""
    from commerce_data_pipeline_spark.operators import selection as S

    # label 0: coordinates 4000 and 4002; label 1: -4000 and -4002
    rows = [
        (0, [4000.0]), (0, [4002.0]),
        (1, [-4000.0]), (1, [-4002.0]),
    ]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    out = S.fisher_separation(df, target_label=0, top_k=1).collect()
    assert len(out) == 1
    r = out[0]
    # exact integers: s0 = 8002e6, s1 = -8002e6, q0 = q1 = (4000e6^2 + 4002e6^2)
    n0 = n1 = 2
    s0, s1 = 8_002_000_000, -8_002_000_000
    q = 4_000_000_000**2 + 4_002_000_000**2
    num = (s0 * n1 - s1 * n0) ** 2
    den = (n0 * q - s0 * s0) * n1 * n1 + (n1 * q - s1 * s1) * n0 * n0
    assert r["fisher_e6"] == (1_000_000 * num) // den
