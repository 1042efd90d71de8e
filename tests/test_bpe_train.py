"""BPE training loop (operators/text.bpe_train).

The load-bearing claim is the ORDER-FREE merge rule: position i starts a
merge iff it matches the pair AND the count of consecutive immediately-
preceding matches is even. That must equal sequential greedy left-to-right
BPE (Sennrich et al. 2016) on every input — including the adversarial
l == r runs where naive "replace all matches" over-merges. These tests pin
the equivalence with a fuzz sweep plus hand-built run cases, and pin the
training loop against a pure-Python reference trainer.
"""

import random
import re

import pytest
from pyspark.sql import functions as F

from commerce_data_pipeline_spark.operators import text as T


def _greedy(syms, l, r):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _apply(spark, cases, l, r):
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i int, syms array<string>"
    )
    rows = df.select(
        "i", T.bpe_apply_merge(F.col("syms"), l, r).alias("m")
    ).collect()
    return [row["m"] for row in sorted(rows, key=lambda r_: r_["i"])]


def test_merge_runs_match_sequential_greedy(spark):
    # l == r runs of every parity: greedy pairs floor(run/2) from the left
    cases = [["a"] * n for n in range(1, 8)]
    got = _apply(spark, cases, "a", "a")
    for syms, m in zip(cases, got):
        assert m == _greedy(syms, "a", "a"), syms


def test_merge_fuzz_matches_sequential_greedy(spark):
    rng = random.Random(7)
    alph = ["a", "b", "aa", "ab"]
    cases, pairs = [], []
    for _ in range(60):
        cases.append([rng.choice(alph) for _ in range(rng.randint(0, 9))])
        pairs.append((rng.choice(alph), rng.choice(alph)))
    # group cases by pair so each pair is one scan
    for (l, r) in set(pairs):
        sub = [c for c, p in zip(cases, pairs) if p == (l, r)]
        got = _apply(spark, sub, l, r)
        for syms, m in zip(sub, got):
            assert m == _greedy(syms, l, r), (syms, l, r)


def _ref_train(texts, rounds):
    import collections

    words = []
    for t in texts:
        for w in re.sub(r"\s+", " ", t.lower()).strip().split(" "):
            if w:
                words.append(list(w))
    merges = []
    for rnd in range(1, rounds + 1):
        c = collections.Counter()
        for w in words:
            for i in range(len(w) - 1):
                c[(w[i], w[i + 1])] += 1
        if not c:
            break
        (l, r), n = min(c.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rnd, l, r, n))
        if rnd < rounds:
            words = [_greedy(w, l, r) for w in words]
    return merges


def test_train_matches_reference_on_run_heavy_corpus(spark):
    # 'oo'/'ee' doubles force an l == r merge decision into the trajectory
    texts = [
        "boook seeen boook",
        "foood coool foood seeen",
        "boook boook coool",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        (r["rnk"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in T.bpe_train(df, rounds=4).collect()
    ]
    assert got == _ref_train(texts, 4)
    # the run-heavy corpus actually exercised an l == r merge
    assert any(l == r for _, l, r, _ in got)


def test_train_round1_equals_pair_count_top1(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    top = T.bpe_pair_counts(docs, top=1).collect()[0]
    m1 = T.bpe_train(docs, rounds=1).collect()[0]
    assert (m1["left_sym"], m1["right_sym"], m1["pair_count"]) == (
        top["left_ch"],
        top["right_ch"],
        top["pair_count"],
    )


def test_train_validates_rounds(spark):
    df = spark.createDataFrame([("ab",)], "text string")
    with pytest.raises(ValueError, match="rounds"):
        T.bpe_train(df, rounds=0)


def test_compression_stages_hand(spark):
    from commerce_data_pipeline_spark.operators.text import bpe_compression

    # corpus "aa ab aa": chars = 2+2+2 = 6. merge1 = (a,a) c=2 -> words
    # (aa)(ab->a,b)(aa) total = 1+2+1 = 4. merge2 = (a,b) -> total 3.
    df = spark.createDataFrame([("aa ab",), ("aa",)], "text string")
    out = {r["stage"]: r for r in bpe_compression(df, rounds=2).collect()}
    assert out[0]["total_syms"] == 6 and out[0]["saved_vs_chars"] == 0
    assert out[1]["total_syms"] == 4 and out[1]["saved_vs_chars"] == 2
    assert out[2]["total_syms"] == 3 and out[2]["saved_vs_chars"] == 3


def test_compression_monotone_on_corpus(spark, sf_dir):
    from commerce_data_pipeline_spark.operators.text import bpe_compression

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = sorted(
        bpe_compression(docs, rounds=3).collect(), key=lambda r: r["stage"]
    )
    totals = [r["total_syms"] for r in rows]
    # each merge strictly shrinks the corpus (the chosen pair has count > 0)
    assert all(a > b for a, b in zip(totals, totals[1:]))
    assert rows[0]["saved_vs_chars"] == 0
    assert rows[-1]["saved_vs_chars"] == totals[0] - totals[-1]


def test_tokenize_hand_case(spark):
    """Hand-replayable end-to-end: corpus 'aa ab' + 'aa' learns merges
    (a,a) then (ab has no pair after...) — verify ids and ordering."""
    from commerce_data_pipeline_spark.operators.text import bpe_tokenize

    # corpus words: aa(x2), ab(x1). merge1 = (a,a) count 2 -> aa fused.
    # merge2: remaining pairs: (a,b) count 1 -> ab fused.
    # final vocab syms: aa (cnt 2), ab (cnt 1) -> ids: aa=1, ab=2.
    df = spark.createDataFrame(
        [(10, "aa ab"), (20, "aa"), (30, " ")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bpe_tokenize(df, rounds=2).collect()}
    assert out[10]["n_tokens"] == 2 and out[10]["token_ids"] == "1-2"
    assert out[20]["n_tokens"] == 1 and out[20]["token_ids"] == "1"
    assert out[30]["n_tokens"] == 0 and out[30]["token_ids"] == ""


def test_tokenize_roundtrips_corpus_totals(spark, sf_dir):
    """On the real corpus, Σ n_tokens must equal bpe_compression's final
    total_syms (the tokenized emission IS the corpus the compression
    metric counts), and every doc is present exactly once."""
    from commerce_data_pipeline_spark.operators.text import (
        bpe_compression,
        bpe_tokenize,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = bpe_tokenize(docs, rounds=3)
    total = toks.agg(F.sum("n_tokens")).collect()[0][0]
    comp = {r["stage"]: r["total_syms"] for r in bpe_compression(docs, rounds=3).collect()}
    assert total == comp[3]
    assert toks.count() == docs.count()


def test_tokenize_validates_rounds(spark):
    from commerce_data_pipeline_spark.operators.text import bpe_tokenize

    df = spark.createDataFrame([("ab",)], "text string")
    with pytest.raises(ValueError, match="rounds"):
        bpe_tokenize(df, rounds=0)


def test_tokenizer_fertility_hand_case(spark):
    """Corpus 'aa ab'(A) + 'abc'(B) + ' '(C), rounds=2: merge1=(a,b) (count
    2), merge2=(a,a) (tie broken lexicographically vs (ab,c)). A: tokens
    [aa],[ab] -> fertility 1.0, chars/token 2.0; B: [ab,c] -> fertility
    2.0, chars/token 1.5; C: no words -> zero counts, NULL ratios."""
    from commerce_data_pipeline_spark.operators.text import tokenizer_fertility

    df = spark.createDataFrame(
        [("A", "aa ab"), ("B", "abc"), ("C", " ")],
        "source string, text string",
    )
    out = {r["source"]: r for r in tokenizer_fertility(df, rounds=2).collect()}
    assert out["A"]["n_words"] == 2 and out["A"]["n_chars"] == 4
    assert out["A"]["n_tokens"] == 2
    assert out["A"]["fertility_e6"] == 1_000_000
    assert out["A"]["chars_per_token_e6"] == 2_000_000
    assert out["B"]["n_words"] == 1 and out["B"]["n_chars"] == 3
    assert out["B"]["n_tokens"] == 2
    assert out["B"]["fertility_e6"] == 2_000_000
    assert out["B"]["chars_per_token_e6"] == 1_500_000
    assert out["C"]["n_words"] == 0 and out["C"]["n_tokens"] == 0
    assert out["C"]["fertility_e6"] is None
    assert out["C"]["chars_per_token_e6"] is None


def test_persisted_vocab_parity(spark, sf_dir, tmp_path):
    """The _ensure_bpe_vocab contract: training through a parquet-
    roundtripped vocabulary is bit-identical to the inline build (string
    arrays + integer counts roundtrip exactly; every downstream decision
    is a deterministic aggregate of that frame)."""
    from commerce_data_pipeline_spark.operators.text import (
        _bpe_vocab,
        bpe_compression,
        bpe_tokenize,
        bpe_train,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path / "vocab")
    _bpe_vocab(docs, "text").write.parquet(path)
    vocab = spark.read.parquet(path)

    def rows(df, *order):
        return [tuple(r) for r in df.orderBy(*order).collect()]

    assert rows(bpe_train(docs, rounds=3), "rnk") == rows(
        bpe_train(docs, rounds=3, vocab=vocab), "rnk"
    )
    assert rows(bpe_compression(docs, rounds=3), "stage") == rows(
        bpe_compression(docs, rounds=3, vocab=vocab), "stage"
    )
    assert rows(bpe_tokenize(docs, rounds=3), "doc_id") == rows(
        bpe_tokenize(docs, rounds=3, vocab=vocab), "doc_id"
    )


def test_persisted_merges_parity(spark, sf_dir, tmp_path):
    """The _ensure_bpe_merges contract: consuming a persisted merge table
    (skipping the training loop) yields bit-identical tokenization and
    fertility to inline training, and apply_merges_to_vocab reproduces
    the loop's merged vocabulary."""
    from pyspark.sql import functions as F

    from commerce_data_pipeline_spark.operators.text import (
        _bpe_vocab,
        _train_merges,
        apply_merges_to_vocab,
        bpe_tokenize,
        tokenizer_fertility,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    merges, final_vocab = _train_merges(docs, "text", 3)
    # the map-only replay equals the loop's merged vocabulary
    v_replay = apply_merges_to_vocab(_bpe_vocab(docs, "text"), merges)
    key = lambda df: sorted(
        (tuple(r["syms"]), r["cnt"]) for r in df.collect()
    )
    assert key(v_replay) == key(final_vocab)

    def rows(df, *order):
        return [tuple(r) for r in df.orderBy(*order).collect()]

    inline = rows(bpe_tokenize(docs, rounds=3), "doc_id")
    assert inline == rows(bpe_tokenize(docs, rounds=3, merges=merges), "doc_id")
    # the persisted-codebook path (what _ensure_bpe_merges feeds the query)
    freq = {}
    for syms, cnt in key(final_vocab):
        for sym in syms:
            freq[sym] = freq.get(sym, 0) + cnt
    codebook = [
        (sym, i)
        for i, (sym, _n) in enumerate(
            sorted(freq.items(), key=lambda kv: (-kv[1], kv[0])), 1
        )
    ]
    assert inline == rows(
        bpe_tokenize(docs, rounds=3, merges=merges, codebook=codebook), "doc_id"
    )
    assert rows(tokenizer_fertility(docs, rounds=3), "source") == rows(
        tokenizer_fertility(docs, rounds=3, merges=merges), "source"
    )
    from commerce_data_pipeline_spark.operators.text import bpe_compression

    assert rows(bpe_compression(docs, rounds=3), "stage") == rows(
        bpe_compression(docs, rounds=3, merges=merges), "stage"
    )


def test_tokenize_oov_error_and_skip(spark):
    """r11 ADVICE (medium): a symbol outside the codebook must never
    produce internally inconsistent rows. Default oov='error' raises
    scan-side naming the symbol; oov='skip' drops the symbol from BOTH
    n_tokens and token_ids (the two stay consistent)."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from commerce_data_pipeline_spark.operators.text import bpe_tokenize

    df = spark.createDataFrame([(1, "ab zz")], "doc_id long, text string")
    # codebook lacks 'z': trained elsewhere, applied to an OOV corpus
    cb = [("ab", 1), ("a", 2), ("b", 3)]
    with pytest.raises(SparkRuntimeException, match="symbol not in codebook: z"):
        bpe_tokenize(df, merges=[("a", "b")], codebook=cb, rounds=1).collect()
    row = bpe_tokenize(
        df, merges=[("a", "b")], codebook=cb, rounds=1, oov="skip"
    ).collect()[0]
    # 'zz' -> ['z','z'] both unmapped: dropped from count AND emission
    assert row["n_tokens"] == 1 and row["token_ids"] == "1"
    with pytest.raises(ValueError, match="oov"):
        bpe_tokenize(df, rounds=1, oov="drop")


def test_rounds_slices_supplied_merges(spark):
    """r11 ADVICE (low): a longer persisted merge table with a smaller
    `rounds` must apply merges[:rounds] in EVERY family member —
    bpe_tokenize and tokenizer_fertility agree with bpe_compression's
    truncation (stage counts match tokenization)."""
    from commerce_data_pipeline_spark.operators.text import (
        bpe_tokenize,
        tokenizer_fertility,
    )

    df = spark.createDataFrame(
        [(1, "S", "aa ab aa"), (2, "S", "ab aa")],
        "doc_id long, source string, text string",
    )
    merges = [("a", "a"), ("a", "b")]  # the learned 2-round table
    two = bpe_tokenize(df, rounds=2, merges=merges)
    one_sliced = bpe_tokenize(df, rounds=1, merges=merges)
    one_direct = bpe_tokenize(df, rounds=1, merges=merges[:1])
    k = lambda d: [tuple(r) for r in d.orderBy("doc_id").collect()]
    assert k(one_sliced) == k(one_direct)
    assert k(one_sliced) != k(two)  # rounds genuinely truncates
    f_sliced = tokenizer_fertility(df, rounds=1, merges=merges)
    f_direct = tokenizer_fertility(df, rounds=1, merges=merges[:1])
    kk = lambda d: [tuple(r) for r in d.orderBy("source").collect()]
    assert kk(f_sliced) == kk(f_direct)


def test_tokenize_merge_chain_stays_linear(spark):
    """r11 ADVICE (low): pin the no-multiplicative-inlining invariant on
    the optimized plan. Each merge round consumes `_wsyms` exactly once,
    so whether or not CollapseProject merges the projections, every
    merge's fused literal must appear a BOUNDED number of times and the
    normalize regex exactly once — a Spark version that starts nesting
    round k-1's expression into round k's position probes (the
    apply_merges_to_vocab 3s->50s failure shape) multiplies these counts
    and fails here."""
    from commerce_data_pipeline_spark.operators.text import bpe_tokenize

    df = spark.createDataFrame(
        [(1, "qx zy ev"), (2, "qx qx")], "doc_id long, text string"
    )
    merges = [("q", "x"), ("z", "y"), ("e", "v")]
    cb = [("qx", 1), ("zy", 2), ("ev", 3)]
    out = bpe_tokenize(df, merges=merges, codebook=cb, rounds=3, oov="skip")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    for fused in ("qx", "zy", "ev"):
        # staged: the fused literal appears in its own round's projection
        # plus the codebook map (~a handful); nested inlining would put
        # round 1's whole expression in every probe of rounds 2 and 3.
        assert plan.count(fused) <= 8, (fused, plan.count(fused))
    assert plan.count("regexp_replace") <= 2, plan.count("regexp_replace")


def test_batched_equals_sequential_at_batch1(spark, sf_dir):
    """bpe_train_batched degenerates to bpe_train exactly at batch=1:
    one pick per round IS the sequential top-1 decision."""
    from commerce_data_pipeline_spark.operators.text import (
        bpe_train,
        bpe_train_batched,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seq = [
        (r["rnk"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_train(docs, rounds=3).orderBy("rnk").collect()
    ]
    bat = [
        (r["rnd"], r["left_sym"], r["right_sym"], r["pair_count"])
        for r in bpe_train_batched(docs, rounds=3, batch=1)
        .orderBy("rnd")
        .collect()
    ]
    assert seq == bat


def test_greedy_disjoint_picks_rule():
    """The disjointness contract: no shared symbol with an earlier keep,
    no symbol equal to an earlier keep's fusion; greedy in rank order."""
    from commerce_data_pipeline_spark.operators.text import (
        greedy_disjoint_picks,
    )

    cands = [
        ("e", "r", 100),  # keep 1
        ("r", "s", 90),   # shares r -> skip
        ("i", "n", 80),   # keep 2
        ("er", "x", 70),  # equals keep 1's fusion -> skip
        ("a", "b", 60),   # keep 3
        ("c", "d", 50),   # beyond batch=3 -> cut
    ]
    assert greedy_disjoint_picks(cands, 3) == [
        ("e", "r", 100), ("i", "n", 80), ("a", "b", 60)
    ]
    assert greedy_disjoint_picks([], 4) == []
    # exhaustion: fewer than batch picks is allowed
    assert greedy_disjoint_picks([("a", "a", 5), ("a", "b", 4)], 4) == [
        ("a", "a", 5)
    ]


def test_batched_merge_table_feeds_tokenizer(spark, sf_dir):
    """The batched trainer's output is a drop-in merge table: applying
    its 16 merges through bpe_tokenize reproduces bpe_compression's
    final total (the family roundtrip invariant, batched edition)."""
    from pyspark.sql import functions as F

    from commerce_data_pipeline_spark.operators.text import (
        bpe_compression,
        bpe_tokenize,
        bpe_train_batched,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    table = bpe_train_batched(docs, rounds=4, batch=4).orderBy(
        "rnd", "pick"
    ).collect()
    assert len(table) == 16
    merges = [(r["left_sym"], r["right_sym"]) for r in table]
    toks = bpe_tokenize(docs, rounds=16, merges=merges)
    total = toks.agg(F.sum("n_tokens")).collect()[0][0]
    comp = bpe_compression(docs, rounds=16, merges=merges).collect()
    final = {r["stage"]: r["total_syms"] for r in comp}[16]
    assert total == final


def test_disjoint_batch_apply_equals_sequential(spark):
    """bpe_apply_merges_disjoint's one-pass claim: for symbol-disjoint
    pair batches, the combined pass must equal sequential application
    (in pick order) on every input — fuzzed over run-heavy arrays
    including same-symbol pairs (the even-offset rule's hard case)."""
    from commerce_data_pipeline_spark.operators.text import (
        bpe_apply_merge,
        bpe_apply_merges_disjoint,
    )

    rng = random.Random(11)
    # disjoint batch incl. an l == r pair; alphabet includes their symbols
    batch = [("a", "a"), ("b", "c"), ("d", "e")]
    alph = ["a", "b", "c", "d", "e", "f", "aa", "bc"]
    cases = [
        [rng.choice(alph) for _ in range(rng.randint(0, 10))] for _ in range(80)
    ]
    cases += [["a"] * n for n in range(1, 7)]            # pure runs
    cases += [["b", "c", "b", "c", "a", "a", "d", "e"]]  # mixed adjacents
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i int, syms array<string>"
    )
    combined = df.select(
        "i", bpe_apply_merges_disjoint(F.col("syms"), batch).alias("m")
    )
    seq = F.col("syms")
    for l, r in batch:
        seq = bpe_apply_merge(seq, l, r)
    sequential = df.select("i", seq.alias("m"))
    a = {r["i"]: r["m"] for r in combined.collect()}
    b = {r["i"]: r["m"] for r in sequential.collect()}
    assert a == b
    # THIS batch is fully symbol- AND fusion-disjoint, so order doesn't
    # matter; the general greedy_disjoint_picks contract guarantees only
    # pick-order equivalence (see test_fusion_collision_pick_order_only)
    seq2 = F.col("syms")
    for l, r in reversed(batch):
        seq2 = bpe_apply_merge(seq2, l, r)
    c = {r["i"]: r["m"] for r in df.select("i", seq2.alias("m")).collect()}
    assert a == c
    # empty batch is the identity
    d = df.select("i", bpe_apply_merges_disjoint(F.col("syms"), []).alias("m"))
    assert {r["i"]: r["m"] for r in d.collect()} == {
        i: c_ for i, c_ in enumerate(cases)
    }


def test_fusion_collision_pick_order_only(spark):
    """r12 ADVICE narrowing, pinned: greedy_disjoint_picks accepts a
    later pick whose FUSION equals an earlier keep's symbol
    ([("ab","c"), ("a","b")]); for such batches the one-pass combined
    application equals sequential application in PICK ORDER but NOT in
    reverse order (the later pick's fusion creates fresh occurrences of
    the earlier pair that pick-order semantics leave unfused)."""
    from commerce_data_pipeline_spark.operators.text import (
        bpe_apply_merge,
        bpe_apply_merges_disjoint,
        greedy_disjoint_picks,
    )

    # the rule accepts the collision batch...
    assert greedy_disjoint_picks(
        [("ab", "c", 9), ("a", "b", 5)], batch=2
    ) == [("ab", "c", 9), ("a", "b", 5)]
    # ...and blocks the converse direction (symbol equals earlier fusion)
    assert greedy_disjoint_picks(
        [("a", "b", 9), ("ab", "c", 5)], batch=2
    ) == [("a", "b", 9)]

    batch = [("ab", "c"), ("a", "b")]
    cases = [
        ["a", "b", "c"],           # fusion-then-c: the divergence witness
        ["ab", "c", "a", "b"],     # both pairs match the input array
        ["a", "b", "a", "b", "c"],
        ["ab", "c", "ab", "c"],
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i int, syms array<string>"
    )
    combined = {
        r["i"]: r["m"]
        for r in df.select(
            "i", bpe_apply_merges_disjoint(F.col("syms"), batch).alias("m")
        ).collect()
    }
    pick = F.col("syms")
    for l, r in batch:
        pick = bpe_apply_merge(pick, l, r)
    pick_order = {
        r["i"]: r["m"] for r in df.select("i", pick.alias("m")).collect()
    }
    rev = F.col("syms")
    for l, r in reversed(batch):
        rev = bpe_apply_merge(rev, l, r)
    rev_order = {
        r["i"]: r["m"] for r in df.select("i", rev.alias("m")).collect()
    }
    assert combined == pick_order
    assert combined[0] == ["ab", "c"]      # new "ab" left unfused
    assert rev_order[0] == ["abc"]          # reverse order WOULD fuse it
    assert combined != rev_order
