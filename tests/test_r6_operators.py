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
