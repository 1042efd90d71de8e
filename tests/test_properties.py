"""Property-based tests (hypothesis): operator invariants on generated
inputs, not just hand-picked fixtures. Examples are kept small and capped
(max_examples) because each example pays a Spark job."""

from datetime import datetime, timedelta

import pandas as pd
from hypothesis import given, settings, strategies as st

from commerce_data_pipeline_spark.operators import skew, temporal
from commerce_data_pipeline_spark.operators.analytics import sessionize
from pyspark.sql import functions as F

BASE = datetime(2024, 1, 1)

# (user_id, minutes-offset) event streams
events_strategy = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 5000)),
    min_size=1,
    max_size=40,
)


def _unique_ts(rows):
    """One event per (user, ts): sessionization tie-order is irrelevant to
    the invariants but duplicate timestamps make assertions ambiguous."""
    return list({(u, m): None for u, m in rows}.keys())


@settings(max_examples=12, deadline=None)
@given(events_strategy)
def test_sessionize_invariants(spark, rows):
    rows = _unique_ts(rows)
    df = spark.createDataFrame(
        [(u, BASE + timedelta(minutes=m)) for u, m in rows], "user_id long, ts timestamp"
    )
    out = sessionize(df, gap_minutes=30).collect()
    # partition property: every event assigned exactly one session
    assert len(out) == len(rows)
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append((r["ts"], r["session_seq"]))
    for user, evs in by_user.items():
        evs.sort()
        for (t0, s0), (t1, s1) in zip(evs, evs[1:]):
            gap = (t1 - t0).total_seconds()
            if s1 == s0:
                assert gap <= 1800  # within-session gap never exceeds threshold
            else:
                assert s1 == s0 + 1 and gap > 1800  # new session iff gap exceeded


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.tuples(st.integers(1, 2), st.integers(0, 1000)), min_size=1, max_size=25),
    st.lists(st.tuples(st.integers(1, 2), st.integers(0, 1000), st.integers(0, 100)),
             min_size=0, max_size=25),
)
def test_asof_join_matches_pandas(spark, left_rows, right_rows):
    left_rows = _unique_ts(left_rows)
    right_rows = list({(k, m): v for k, m, v in right_rows}.items())
    lpdf = pd.DataFrame(
        {"k": [u for u, _ in left_rows],
         "ts": [BASE + timedelta(seconds=m) for _, m in left_rows]}
    )
    rpdf = pd.DataFrame(
        {"k": [k for (k, _), _ in right_rows],
         "ts": [BASE + timedelta(seconds=m) for (_, m), _ in right_rows],
         "v": [float(v) for _, v in right_rows]}
    )
    sl = spark.createDataFrame(lpdf)
    sr = (
        spark.createDataFrame(rpdf)
        if len(rpdf)
        else spark.createDataFrame([], "k bigint, ts timestamp, v double")
    )
    got = temporal.asof_join(sl, sr, on="k", right_cols=["v"]).orderBy("k", "ts").collect()
    want = (
        pd.merge_asof(
            lpdf.sort_values("ts", kind="stable"), rpdf.sort_values("ts", kind="stable"),
            on="ts", by="k",
        )
        .sort_values(["k", "ts"], kind="stable")["v"]
        .tolist()
        if len(rpdf)
        else [None] * len(lpdf)
    )
    got_v = [r["v_matched"] for r in got]
    want_v = [None if pd.isna(v) else v for v in want]
    assert got_v == want_v


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.tuples(st.integers(1, 4), st.integers(0, 50)), min_size=1, max_size=40),
    st.lists(st.integers(1, 6), min_size=1, max_size=6),
)
def test_salted_join_equals_plain_join(spark, large_rows, small_keys):
    large = spark.createDataFrame(large_rows, "k long, payload long")
    small = spark.createDataFrame(
        [(k, f"d{k}") for k in set(small_keys)], "k long, name string"
    )
    plain = sorted(map(tuple, large.join(small, on="k").select("k", "payload", "name").collect()))
    salted = sorted(
        map(tuple, skew.salted_join(large, small, on="k", n_salts=4)
            .select("k", "payload", "name").collect())
    )
    assert plain == salted


@settings(max_examples=8, deadline=None)
@given(st.lists(st.tuples(st.integers(1, 3), st.integers(0, 600)), min_size=1, max_size=25))
def test_band_join_matches_theta_join(spark, rows):
    rows = [(u, i, m) for i, (u, m) in enumerate(_unique_ts(rows))]
    df = spark.createDataFrame(
        [(u, i, BASE + timedelta(seconds=m)) for u, i, m in rows],
        "k long, id long, ts timestamp",
    )
    banded = (
        temporal.band_join(df, df, on="k", band_seconds=60)
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
    )
    theta = (
        df.alias("a").join(df.alias("b"), on="k")
        .filter(F.col("a.id") < F.col("b.id"))
        .filter(F.abs(F.unix_micros("a.ts") - F.unix_micros("b.ts")) <= 60_000_000)
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
    )
    key = lambda d: sorted((r["a_id"], r["b_id"]) for r in d.collect())
    assert key(banded) == key(theta)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=12), min_size=1, max_size=15))
def test_exact_dedup_idempotent_and_normalizing(spark, texts):
    from commerce_data_pipeline_spark.operators import dedup

    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    once = dedup.exact_dedup(df)
    twice = dedup.exact_dedup(once)
    rows_once = sorted(r["doc_id"] for r in once.collect())
    rows_twice = sorted(r["doc_id"] for r in twice.collect())
    assert rows_once == rows_twice  # idempotent
    # survivors have pairwise-distinct normalized text
    import re

    norm = lambda t: re.sub(r"\s+", " ", t.lower()).strip()
    kept = [norm(r["text"]) for r in once.collect()]
    assert len(kept) == len(set(kept))
    # every input text has a surviving representative
    assert {norm(t) for t in texts} == set(kept)


token_lists_strategy = st.lists(
    st.tuples(st.integers(0, 1), st.integers(1, 700)),  # (group, n_tokens)
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None)
@given(token_lists_strategy)
def test_greedy_pack_matches_python_reference(spark, rows):
    from commerce_data_pipeline_spark.operators import corpus as C

    data = [(i, f"g{g}", t) for i, (g, t) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, lang string, n_tokens long")
    got = {
        r["doc_id"]: (r["bin_id"], r["bin_fill"])
        for r in C.greedy_pack(df, budget=512).collect()
    }
    # pure-Python reference of the same greedy recurrence, per group
    expect = {}
    for gname in {f"g{g}" for g, _ in rows}:
        fill, bin_id = 0, 0
        for i, (g, t) in enumerate(rows):
            if f"g{g}" != gname:
                continue
            if fill > 0 and fill + t > 512:
                bin_id += 1
                fill = 0
            fill += t
            expect[i] = (bin_id, fill)
    assert got == expect


@settings(max_examples=10, deadline=None)
@given(token_lists_strategy)
def test_chunk_pack_stream_is_gapless(spark, rows):
    from commerce_data_pipeline_spark.operators import corpus as C

    data = [(i, f"g{g}", t) for i, (g, t) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc_id long, lang string, n_tokens long")
    out = sorted(
        C.chunk_pack(df, budget=512).collect(),
        key=lambda r: (r["lang"], r["doc_id"]),
    )
    offset = {}
    for r in out:
        # offsets are contiguous: each doc starts where the previous ended
        assert r["start_offset"] == offset.get(r["lang"], 0)
        offset[r["lang"]] = r["start_offset"] + r["n_tokens"]
        # chunk span consistent with offsets and budget
        assert r["first_chunk"] == r["start_offset"] // 512
        assert r["last_chunk"] == (r["start_offset"] + r["n_tokens"] - 1) // 512


@settings(max_examples=8, deadline=None)
@given(
    st.lists(st.integers(1, 400), min_size=1, max_size=6),
    st.integers(2, 64),
    st.integers(1, 64),
)
def test_overlap_chunks_full_coverage(spark, lens, size, stride):
    from commerce_data_pipeline_spark.operators.corpus import overlap_chunks

    stride = min(stride, size)  # overlap semantics require stride <= size
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(lens)], "doc_id long, n_tokens long"
    )
    rows = overlap_chunks(df, size=size, stride=stride).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, n in enumerate(lens):
        chunks = sorted(by_doc[i], key=lambda r: r["chunk_index"])
        # chunk indexes are consecutive from 0; starts are stride-aligned
        assert [c["chunk_index"] for c in chunks] == list(range(len(chunks)))
        covered = set()
        for c in chunks:
            assert c["start_tok"] % stride == 0
            assert 1 <= c["span_len"] <= size
            assert c["start_tok"] + c["span_len"] <= n
            covered |= set(range(c["start_tok"], c["start_tok"] + c["span_len"]))
        # every token covered by at least one chunk
        assert covered == set(range(n))


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.booleans(), st.integers(-20, 20)),
        min_size=1,
        max_size=40,
    )
)
def test_ranking_auc_matches_pairwise_on_generated_inputs(spark, rows):
    """ranking_auc == literal pairwise Mann-Whitney counting (1 per
    concordant pair, ½ per tie, floored at e6) on ANY label/score
    multiset, including heavy ties, negative scores, and single-class
    degenerates (where the operator must return NULL)."""
    from commerce_data_pipeline_spark.operators import selection as S

    df = spark.createDataFrame(rows, "label boolean, score int")
    r = S.ranking_auc(df, "label", "score").collect()[0]
    pos = [s for lab, s in rows if lab]
    neg = [s for lab, s in rows if not lab]
    assert r["n_pos"] == len(pos) and r["n_neg"] == len(neg)
    if not pos or not neg:
        assert r["auc_e6"] is None
    else:
        u2 = sum(2 if p > n else (1 if p == n else 0) for p in pos for n in neg)
        assert r["auc_e6"] == (1_000_000 * u2) // (2 * len(pos) * len(neg))


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 12), st.integers(1, 12), st.integers(0, 3)),
        min_size=1,
        max_size=25,
    )
)
def test_best_match_invariants_on_generated_candidates(spark, tuples_):
    """best_match_pairs on ANY candidate set: (a) the output is a subset
    of the input pair set; (b) no record appears in two surviving pairs
    (one-to-one property); (c) every surviving pair is mutual-best under
    (dist, partner-id) ordering computed naively in Python."""
    from commerce_data_pipeline_spark.operators import linkage as L

    pairs = {
        (min(a, b), max(a, b)): d for a, b, d in tuples_ if a != b
    }  # undirected, dedup'd (last dist wins — any deterministic choice works)
    if not pairs:
        return
    rows = [(a, b, d) for (a, b), d in pairs.items()]
    df = spark.createDataFrame(rows, "id_a long, id_b long, dist int")
    got = {(r.id_a, r.id_b) for r in L.best_match_pairs(df).collect()}
    assert got <= set(pairs)
    seen = [x for ab in got for x in ab]
    assert len(seen) == len(set(seen))  # one-to-one
    # naive mutual-best
    best = {}
    for (a, b), d in pairs.items():
        for x, y in ((a, b), (b, a)):
            cur = best.get(x)
            if cur is None or (d, y) < cur:
                best[x] = (d, y)
    want = {
        (a, b)
        for (a, b) in pairs
        if best[a][1] == b and best[b][1] == a
    }
    assert got == want


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.booleans(), st.integers(-30, 30)),
        min_size=4,
        max_size=40,
    ),
    st.sampled_from([2, 4, 5, 10]),
)
def test_ranking_auc_banded_bound_contains_exact_generated(spark, rows, n_bands):
    """On ANY label/score multiset with both classes present, the banded
    AUC's reported error interval must contain the exact AUC — the
    falsifiable contract of the 100 TB twin."""
    from commerce_data_pipeline_spark.operators import selection as S

    if not any(l for l, _ in rows) or all(l for l, _ in rows):
        return
    df = spark.createDataFrame(rows, "label boolean, score int")
    exact = S.ranking_auc(df, "label", "score").collect()[0]["auc_e6"]
    r = S.ranking_auc_banded(df, "label", "score", n_bands=n_bands).collect()[0]
    assert abs(r["auc_banded_e6"] - exact) <= r["max_err_e6"]


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2), st.lists(st.sampled_from("abcdef"), min_size=1, max_size=6)),
        min_size=1,
        max_size=25,
    ),
    st.integers(1, 8),
)
def test_vocab_coverage_conservation(spark, rows, v):
    """OOV + in-vocab = total per group; rate is the exact floored
    division; the top-V vocabulary covers at least as many tokens as any
    other V-word set (frequency optimality on the corpus)."""
    from commerce_data_pipeline_spark.operators.text import vocab_coverage

    data = [(str(g), " ".join(ws)) for g, ws in rows]
    df = spark.createDataFrame(data, "source string, text string")
    out = vocab_coverage(df, vocab_size=v).collect()
    # conservation + exact ratio per group
    from collections import Counter

    corpus = Counter(w for _, ws in rows for w in ws)
    vocab = {
        w for w, _ in sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[:v]
    }
    per = {}
    for g, ws in rows:
        t, o = per.get(str(g), (0, 0))
        per[str(g)] = (t + len(ws), o + sum(1 for w in ws if w not in vocab))
    assert {r["source"]: (r["n_tokens"], r["n_oov"]) for r in out} == per
    for r in out:
        assert r["oov_rate_e6"] == (1_000_000 * r["n_oov"]) // r["n_tokens"]


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 1),
            st.lists(st.integers(-50, 50), min_size=2, max_size=2),
        ),
        min_size=2,
        max_size=20,
    )
)
def test_fisher_separation_matches_numpy_reference(spark, rows):
    """fisher_e6 equals the numpy two-class Fisher criterion computed on
    the e6-quantized values (floored), whenever both classes are present
    and the denominator is nonzero."""
    import numpy as np

    from commerce_data_pipeline_spark.operators.selection import fisher_separation

    df = spark.createDataFrame(
        [(lab, [float(a), float(b)]) for lab, (a, b) in rows],
        "label int, embedding array<float>",
    )
    out = {r["dim"]: r for r in fisher_separation(df, 0, top_k=2).collect()}
    import math

    X = np.array([[float(a), float(b)] for _, (a, b) in rows])
    y = np.array([lab for lab, _ in rows])
    # TRUE python ints (astype(object) would keep float64 objects, whose
    # arithmetic overflows 53-bit precision around 2^71 — the operator's
    # decimal(38,0) path is exact there and the reference must be too)
    xq = np.array(
        [[int(math.floor(v * 1_000_000)) for v in row] for row in X], dtype=object
    )
    for d in range(2):
        a, b = xq[y == 0, d], xq[y != 0, d]
        n0, n1 = len(a), len(b)
        r = out[d]
        assert r["n0"] == n0 and r["n1"] == n1
        if n0 == 0 or n1 == 0:
            assert r["fisher_e6"] is None
            continue
        s0, s1 = sum(a), sum(b)
        q0, q1 = sum(v * v for v in a), sum(v * v for v in b)
        den = (n0 * q0 - s0 * s0) * n1 * n1 + (n1 * q1 - s1 * s1) * n0 * n0
        if den == 0:
            assert r["fisher_e6"] is None
        else:
            num = (s0 * n1 - s1 * n0) ** 2
            assert r["fisher_e6"] == (1_000_000 * num) // den


# two integer samples (values 0..20 so bands duplicate and collapse)
psi_samples = st.tuples(
    st.lists(st.integers(0, 20), min_size=1, max_size=60),
    st.lists(st.integers(0, 20), min_size=0, max_size=60),
)


def _psi_reference(ref_vals, cur_vals, n_bands=10):
    """Pure-Python replay of psi_drift's contract: percentile_disc
    boundaries (value at rank ceil(p*n) over the sorted reference),
    band = 1 + #{boundaries < v ... strictly below via >}, full spine,
    Laplace smoothing, per-band floor(1e6 * dp * ln(ratio)), integer sum."""
    import math

    srt = sorted(ref_vals)
    n = len(srt)
    bounds = [srt[math.ceil(i / n_bands * n) - 1] for i in range(1, n_bands)]

    def band(v):
        return 1 + sum(1 for b in bounds if v > b)

    cr = {b: 0 for b in range(1, n_bands + 1)}
    cc = {b: 0 for b in range(1, n_bands + 1)}
    for v in ref_vals:
        cr[band(v)] += 1
    for v in cur_vals:
        cc[band(v)] += 1
    tr, tc = len(ref_vals), len(cur_vals)
    terms = {}
    for b in range(1, n_bands + 1):
        pr = (cr[b] + 1) / (tr + n_bands)
        pc = (cc[b] + 1) / (tc + n_bands)
        ratio = ((cc[b] + 1) * (tr + n_bands)) / ((cr[b] + 1) * (tc + n_bands))
        terms[b] = math.floor((pc - pr) * math.log(ratio) * 1e6)
    return cr, cc, terms, sum(terms.values())


@settings(max_examples=10, deadline=None)
@given(psi_samples)
def test_psi_drift_matches_python_reference(spark, sides):
    from commerce_data_pipeline_spark.operators.profiling import psi_drift

    ref_vals, cur_vals = sides
    ref = spark.createDataFrame([(float(v),) for v in ref_vals], "value double")
    cur = (
        spark.createDataFrame([(float(v),) for v in cur_vals], "value double")
        if cur_vals
        else spark.createDataFrame([], "value double")
    )
    out = {r["band"]: r for r in psi_drift(ref, cur, "value", n_bands=10).collect()}
    cr, cc, terms, total = _psi_reference(ref_vals, cur_vals)
    assert set(out) == set(range(1, 11))
    for b in range(1, 11):
        assert out[b]["n_ref"] == cr[b], b
        assert out[b]["n_cur"] == cc[b], b
        assert out[b]["psi_term_e6"] == terms[b], b
        assert out[b]["psi_e6"] == total


@settings(max_examples=8, deadline=None)
@given(psi_samples)
def test_js_drift_matches_python_reference(spark, sides):
    import math

    from commerce_data_pipeline_spark.operators.profiling import js_drift

    ref_vals, cur_vals = sides
    ref = spark.createDataFrame([(float(v),) for v in ref_vals], "value double")
    cur = (
        spark.createDataFrame([(float(v),) for v in cur_vals], "value double")
        if cur_vals
        else spark.createDataFrame([], "value double")
    )
    out = {r["band"]: r for r in js_drift(ref, cur, "value", n_bands=10).collect()}
    cr, cc, _pt, _ps = _psi_reference(ref_vals, cur_vals)
    tr, tc = len(ref_vals), len(cur_vals)
    terms = {}
    for b in range(1, 11):
        p = (cr[b] + 1) / (tr + 10)
        q = (cc[b] + 1) / (tc + 10)
        m = (p + q) / 2.0
        terms[b] = math.floor(
            (p * math.log(p / m) + q * math.log(q / m)) * 0.5 * 1e6
        )
    total = sum(terms.values())
    for b in range(1, 11):
        assert out[b]["n_ref"] == cr[b] and out[b]["n_cur"] == cc[b], b
        assert out[b]["js_term_e6"] == terms[b], b
        assert out[b]["js_e6"] == total
