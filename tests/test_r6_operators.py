"""Unit tests for the round-6 operators: position attribution, canonical
records, k-anonymity, FD audit, winsorization, BPE pair counts, n-gram
novelty."""

from datetime import datetime

from pyspark.sql import Row, functions as F

from commerce_data_pipeline_spark.operators import profiling, text
from commerce_data_pipeline_spark.operators.analytics import position_attribution
from commerce_data_pipeline_spark.operators.dedup import canonical_records


def _ev(spark, rows):
    return spark.createDataFrame(
        [Row(user_id=u, ts=datetime(2024, 1, 1, 0, m), event_id=i, event_type=t)
         for i, (u, m, t) in enumerate(rows)]
    )


def test_position_attribution_u_shape_credit(spark):
    # one user: 4 touches then a purchase -> 4000+rem / 2000/2 each / 4000
    rows = [(1, 0, "view"), (1, 1, "click"), (1, 2, "view"), (1, 3, "click"),
            (1, 4, "purchase")]
    out = sorted(
        position_attribution(_ev(spark, rows), "purchase",
                             tiebreak_cols=("event_id",)).collect(),
        key=lambda r: r["position"],
    )
    assert [r["credit_bp"] for r in out] == [4000, 1000, 1000, 4000]
    assert sum(r["credit_bp"] for r in out) == 10000


def test_position_attribution_small_n_and_remainder(spark):
    # n=1 -> 10000; n=2 -> 5000/5000; n=5 (3 middles, 2000 div 3 = 666,
    # remainder 2 -> first touch gets 4002)
    one = position_attribution(
        _ev(spark, [(1, 0, "view"), (1, 1, "purchase")]), "purchase",
        tiebreak_cols=("event_id",))
    assert [r["credit_bp"] for r in one.collect()] == [10000]
    two = position_attribution(
        _ev(spark, [(1, 0, "view"), (1, 1, "click"), (1, 2, "purchase")]),
        "purchase", tiebreak_cols=("event_id",))
    assert sorted(r["credit_bp"] for r in two.collect()) == [5000, 5000]
    five = sorted(
        position_attribution(
            _ev(spark, [(1, m, "view") for m in range(5)] + [(1, 5, "purchase")]),
            "purchase", tiebreak_cols=("event_id",)).collect(),
        key=lambda r: r["position"])
    # n=5: 3 middles at 2000 div 3 = 666, remainder 2 -> first gets 4002
    assert [r["credit_bp"] for r in five] == [4002, 666, 666, 666, 4000]
    assert sum(r["credit_bp"] for r in five) == 10000


def test_position_attribution_each_touch_credits_one_conversion(spark):
    # two purchases: the first touch group ends at the first purchase
    rows = [(1, 0, "view"), (1, 1, "purchase"), (1, 2, "click"),
            (1, 3, "purchase")]
    out = position_attribution(_ev(spark, rows), "purchase",
                               tiebreak_cols=("event_id",)).collect()
    groups = {(r["conv_group"], r["touch_type"], r["credit_bp"]) for r in out}
    assert groups == {(2, "view", 10000), (1, "click", 10000)}


def test_canonical_records_picks_best_quality_min_id(spark):
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)], ["id", "component"])
    recs = spark.createDataFrame(
        [(1, 10), (2, 50), (3, 50), (7, 5), (8, 5)], ["doc_id", "n_chars"])
    out = {r["component"]: r for r in
           canonical_records(clusters, recs).collect()}
    assert out[1]["canonical_id"] == 2  # quality tie 50/50 -> min id
    assert out[1]["canonical_quality"] == 50 and out[1]["n_members"] == 3
    assert out[7]["canonical_id"] == 7 and out[7]["n_members"] == 2


def test_k_anonymity_flags_small_classes_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "a"), (2, "b"), (None, "c")],
        "nat int, seg string")
    out = {(r["nat"], r["seg"]): r for r in
           profiling.k_anonymity(df, ["nat", "seg"], k=3).collect()}
    assert (1, "a") not in out          # class of 3 meets k
    assert out[(2, "b")]["deficit"] == 2
    assert out[(None, "c")]["class_size"] == 1  # NULL class is audited too


def test_fd_violations_held_and_violated(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "x"), (2, "y"), (3, "z")], "k int, v string")
    held = profiling.fd_violations(df.filter("k <> 2"), ["k"], "v").collect()[0]
    assert held["n_violating_classes"] == 0
    viol = profiling.fd_violations(df, ["k"], "v").collect()[0]
    assert viol["n_violating_classes"] == 1
    assert viol["max_dependents"] == 2
    assert viol["rows_in_violating"] == 2


def test_winsorize_summary_clamps_and_counts(spark):
    # 20 values 1..20 in one group: p5 bound = rank ceil(1)=1 -> 1,
    # p95 bound = rank 19 -> 19; value 20 clamps to 19
    df = spark.createDataFrame([( "g", float(i)) for i in range(1, 21)], "g string, v double")
    out = profiling.winsorize_summary(df, "v", "g").collect()[0]
    assert out["n_rows"] == 20
    assert out["n_capped_low"] == 0      # nothing below the rank-1 value
    assert out["n_capped_high"] == 1     # the 20 clamps to 19
    assert out["winsorized_sum_e2"] == (sum(range(1, 20)) + 19) * 100


def test_bpe_pair_counts_ranks_most_frequent(spark):
    df = spark.createDataFrame([("aab aab ab",)], ["text"])
    out = {(r["left_ch"], r["right_ch"]): r for r in
           text.bpe_pair_counts(df, top=10).collect()}
    assert out[("a", "b")]["pair_count"] == 3
    assert out[("a", "a")]["pair_count"] == 2
    assert out[("a", "b")]["rnk"] == 1


def test_ngram_novelty_first_doc_wins(spark):
    df = spark.createDataFrame(
        [(0, "the quick brown fox"), (1, "the quick brown cat"), (2, "x")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r for r in text.ngram_novelty(df, n=3).collect()}
    assert out[0]["novelty_e6"] == 1_000_000       # everything first seen here
    # doc 1 shares 'the quick brown' with doc 0; 'quick brown cat' is new
    assert out[1]["n_grams"] == 2 and out[1]["n_novel"] == 1
    assert out[1]["novelty_e6"] == 500_000
    assert 2 not in out                            # < 3 words -> no grams


def test_interval_join_boundaries_and_overlap(spark):
    from commerce_data_pipeline_spark.operators.temporal import interval_join

    facts = spark.createDataFrame(
        [(0,), (999,), (1000,), (1500,), (2999,), (3000,)], "ts long")
    iv = spark.createDataFrame(
        [(1000, 3000, "a"), (2000, 4000, "b")], "start_us long, end_us long, tag string")
    out = interval_join(facts, iv, "ts", bucket_us=500)
    got = sorted((r["ts"], r["tag"]) for r in out.collect())
    # [start, end): 1000 in a; 2999 in a AND b (overlap); 3000 only in b
    assert got == [(1000, "a"), (1500, "a"), (2999, "a"), (2999, "b"), (3000, "b")]


def test_interval_join_oversize_guard(spark):
    import pytest

    from commerce_data_pipeline_spark.operators.temporal import interval_join

    facts = spark.createDataFrame([(0,)], "ts long")
    iv = spark.createDataFrame([(0, 10**12, "huge")],
                               "start_us long, end_us long, tag string")
    with pytest.raises(ValueError):
        interval_join(facts, iv, "ts", bucket_us=1000, max_buckets_per_interval=100)


def test_sequence_violations_counts_disallowed_only(spark):
    from datetime import datetime

    from commerce_data_pipeline_spark.operators.analytics import sequence_violations

    rows = [(1, 0, "view"), (1, 1, "purchase"), (1, 2, "purchase"),  # p->p bad
            (2, 0, "view"), (2, 1, "view"),                          # ok
            (3, 0, "error"), (3, 1, "error")]                        # e->e bad
    df = spark.createDataFrame(
        [Row(user_id=u, ts=datetime(2024, 1, 1, 0, m), event_id=i, event_type=t)
         for i, (u, m, t) in enumerate(rows)])
    allowed = [("view", "view"), ("view", "purchase")]
    out = {(r["prev_type"], r["next_type"]): r["n"]
           for r in sequence_violations(df, allowed, tiebreak_cols=("event_id",)).collect()}
    assert out == {("purchase", "purchase"): 1, ("error", "error"): 1}


def test_top_co_occurrences_k_cut_and_ties(spark):
    from commerce_data_pipeline_spark.operators.graph import top_co_occurrences

    e = spark.createDataFrame(
        [(1, 2, 5), (1, 3, 5), (1, 4, 9), (1, 5, 1), (2, 1, 5)],
        ["src", "dst", "weight"])
    out = [(r["reco"], r["rnk"]) for r in
           top_co_occurrences(e, k=3).filter("item = 1").orderBy("rnk").collect()]
    assert out == [(4, 1), (2, 2), (3, 3)]  # weight desc, then reco asc


def test_value_histogram_bins_and_nulls(spark):
    df = spark.createDataFrame(
        [(0.0,), (24999.0,), (25000.0,), (74999.0,), (None,)], "v double")
    out = {r["bin"]: r for r in
           profiling.value_histogram(df, "v", 25000.0).collect()}
    assert out[0]["n"] == 2 and out[1]["n"] == 1 and out[2]["n"] == 1
    assert out[2]["bin_lo"] == 50000.0
    assert sum(r["n"] for r in out.values()) == 4  # NULL excluded


def test_session_funnel_requires_in_session_order(spark):
    from commerce_data_pipeline_spark.operators.analytics import session_funnel

    # user 1: full ordered funnel in one session; user 2: purchase BEFORE
    # click (order broken); user 3: view, then a purchase 2h later (new
    # session -> no step-1 there, purchase doesn't count)
    rows = [(1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"),
            (2, 0, "view"), (2, 1, "purchase"), (2, 2, "click"),
            (3, 0, "view"), (3, 180, "purchase")]
    df = spark.createDataFrame(
        [Row(user_id=u, ts=datetime(2024, 1, 1, m // 60, m % 60), event_id=i,
             event_type=t) for i, (u, m, t) in enumerate(rows)])
    out = {r["step"]: r["n_sessions"] for r in session_funnel(
        df, ["view", "click", "purchase"], tiebreak_cols=("event_id",)).collect()}
    # 3 sessions contain a view (u3's 2h-later purchase opens a viewless
    # session); u1+u2 click after the view; only u1 purchases after the click
    assert out == {1: 3, 2: 2, 3: 1}


def test_association_rules_confidence_and_lift(spark):
    from commerce_data_pipeline_spark.operators.analytics import association_rules

    # baskets: {1,2} x3, {1,3} x1 -> pair (1,2) w=3, (1,3) w=1
    rows = []
    for b, items in enumerate([(1, 2), (1, 2), (1, 2), (1, 3)]):
        rows += [(b, i) for i in items]
    df = spark.createDataFrame(rows, ["b", "i"])
    out = {(r["antecedent"], r["consequent"]): r for r in
           association_rules(df, "b", "i", min_weight=2).collect()}
    # only (1,2)/(2,1) survive min_weight=2
    assert set(out) == {(1, 2), (2, 1)}
    r12 = out[(1, 2)]
    # n(1)=4 baskets, n(2)=3, B=4: conf(1->2)=3/4, lift=3*4/(4*3)=1.0
    assert r12["conf_e6"] == 750_000 and r12["lift_e6"] == 1_000_000
    r21 = out[(2, 1)]
    assert r21["conf_e6"] == 1_000_000 and r21["lift_e6"] == 1_000_000


def test_snapshot_diff_classifies_and_guards_duplicates(spark):
    import pytest

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "k long, s string, v double")
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", 99.0), (4, "d", 40.0)], "k long, s string, v double")
    out = profiling.snapshot_diff(old, new, ["k"]).collect()[0]
    assert (out["n_added"], out["n_removed"], out["n_changed"],
            out["n_unchanged"]) == (1, 1, 1, 1)
    # r7: the duplicate-key guard is folded into the merge (one scan per
    # side) — it fires at ACTION time via assert_true, no longer as an
    # eager ValueError with its own per-side counting pass
    dup = spark.createDataFrame([(1, "a", 1.0), (1, "a", 2.0)],
                                "k long, s string, v double")
    with pytest.raises(Exception, match="duplicate keys"):
        profiling.snapshot_diff(dup, new, ["k"]).collect()
