"""Unit tests for the one-pass data-quality profiler
(operators/profiling.py)."""

import datetime

import pytest
from pyspark.sql import Row

from commerce_data_pipeline_spark.operators import profiling


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            Row(i=1, x=1.5, s="aa", t=datetime.datetime(2024, 1, 1), b=True),
            Row(i=2, x=None, s="bbbb", t=datetime.datetime(2024, 1, 2), b=False),
            Row(i=2, x=-3.0, s=None, t=None, b=None),
        ]
    )


def test_profile_stats_per_dtype(spark, frame):
    out = {r["col_name"]: r for r in profiling.table_profile(frame).collect()}
    assert set(out) == {"i", "x", "s", "t", "b"}
    assert all(r["n_rows"] == 3 for r in out.values())
    i = out["i"]
    assert (i["dtype_class"], i["n_null"], i["n_distinct"]) == ("int", 0, 2)
    assert (i["min_num"], i["max_num"]) == (1.0, 2.0)
    assert i["min_len"] is None and i["max_len"] is None
    x = out["x"]
    assert (x["dtype_class"], x["n_null"], x["n_distinct"]) == ("double", 1, 2)
    assert (x["min_num"], x["max_num"]) == (-3.0, 1.5)
    s = out["s"]
    assert (s["dtype_class"], s["n_null"], s["n_distinct"]) == ("string", 1, 2)
    assert (s["min_len"], s["max_len"]) == (2, 4)
    assert s["min_num"] is None
    t = out["t"]
    assert t["dtype_class"] == "timestamp" and t["n_null"] == 1
    assert t["min_num"] == 1704067200000000.0  # 2024-01-01 epoch micros
    b = out["b"]
    assert (b["dtype_class"], b["min_num"], b["max_num"]) == ("bool", 0.0, 1.0)


def test_profile_column_subset_and_approx(spark, frame):
    sub = profiling.table_profile(frame, columns=["i", "s"]).collect()
    assert [r["col_name"] for r in sub] == ["i", "s"]
    # approx path: identical schema, distinct becomes an estimate (>0)
    ap = {r["col_name"]: r for r in
          profiling.table_profile(frame, exact_distinct=False).collect()}
    assert set(ap) == {"i", "x", "s", "t", "b"}
    assert ap["i"]["n_distinct"] > 0
    with pytest.raises(ValueError, match="no columns"):
        profiling.table_profile(frame, columns=["nope"])


def test_group_outliers_hampel_semantics(spark):
    rows = (
        [Row(k=i, g="a", v=10.0) for i in range(5)]
        + [Row(k=10, g="a", v=11.0), Row(k=11, g="a", v=9.0), Row(k=12, g="a", v=100.0)]
        + [Row(k=20, g="b", v=1.0), Row(k=21, g="b", v=2.0), Row(k=22, g="b", v=3.0)]
    )
    df = spark.createDataFrame(rows)
    out = {r["k"]: r for r in
           profiling.group_outliers(df, "v", "g", "k", k=3.0).collect()}
    # group a: 8 rows, lower median = 10.0; devs sorted = [0x5, 1, 1, 90],
    # lower median of devs (rank (8+1)//2 = 4) -> 0.0 MAD: every deviating
    # row flags (documented degenerate case)
    a = {k: r for k, r in out.items() if r["g"] == "a"}
    assert all(r["med"] == 10.0 and r["mad"] == 0.0 for r in a.values())
    assert {k for k, r in a.items() if r["is_outlier"]} == {10, 11, 12}
    # group b: median 2.0, devs [0, 1, 1] -> MAD (rank 2) = 1.0; no dev > 3
    b = {k: r for k, r in out.items() if r["g"] == "b"}
    assert all(r["med"] == 2.0 and r["mad"] == 1.0 for r in b.values())
    assert not any(r["is_outlier"] for r in b.values())


def test_group_outliers_flags_clear_anomaly(spark):
    rows = [Row(k=i, g="x", v=float(100 + (i % 3))) for i in range(20)]
    rows.append(Row(k=99, g="x", v=10000.0))
    df = spark.createDataFrame(rows)
    out = {r["k"]: r["is_outlier"] for r in
           profiling.group_outliers(df, "v", "g", "k").collect()}
    assert out[99] is True
    assert sum(out.values()) == 1


def test_group_outliers_null_group_is_a_real_group(spark):
    # NULL groups must surface like any other group (eqNullSafe joins),
    # not silently vanish from the output
    rows = [Row(k=i, g=None, v=float(10 + (i % 2))) for i in range(9)]
    rows.append(Row(k=99, g=None, v=5000.0))
    rows.append(Row(k=200, g="y", v=1.0))
    rows.append(Row(k=201, g="y", v=2.0))
    rows.append(Row(k=202, g="y", v=3.0))
    df = spark.createDataFrame(rows, schema="k long, g string, v double")
    out = {r["k"]: r for r in profiling.group_outliers(df, "v", "g", "k").collect()}
    assert len(out) == 13  # every input row present, NULL group included
    assert out[99]["is_outlier"] is True
    assert not any(out[k]["is_outlier"] for k in (200, 201, 202))


def test_quantile_sketch_audit_hand(spark):
    from commerce_data_pipeline_spark.operators.profiling import quantile_sketch_audit

    # group 'a': values 1..100 -> target rank 50, tol floor(200/1000)+1 = 1
    # -> bounds are the values at ranks 49 and 51
    rows = [("a", v) for v in range(1, 101)] + [("b", 7), ("b", 9)]
    df = spark.createDataFrame(rows, "g string, v long")
    out = {r["g"]: r for r in quantile_sketch_audit(df, "v", "g").collect()}
    a = out["a"]
    assert (a["n_rows"], a["lo_bound"], a["hi_bound"]) == (100, 49, 51)
    assert a["approx_ok"]  # exact median 50 is inside [49, 51]
    b = out["b"]
    # n=2: target=ceil(1)=1, tol=1 -> lo rank max(0,1)=1? greatest(1-1,1)=1,
    # hi rank least(2,2)=2 -> bounds are the two values themselves
    assert (b["lo_bound"], b["hi_bound"]) == (7, 9)
    assert b["approx_ok"]


def test_quantile_sketch_audit_is_falsifiable(spark):
    """The boolean really depends on the estimate: with a degenerate
    'sketch' the bound window is a single value, so any estimate not
    equal to it would flip approx_ok — verify the window collapses."""
    from commerce_data_pipeline_spark.operators.profiling import quantile_sketch_audit

    df = spark.createDataFrame([("a", 5)] * 9, "g string, v long")
    r = quantile_sketch_audit(df, "v", "g").collect()[0]
    assert r["lo_bound"] == r["hi_bound"] == 5 and r["approx_ok"]


def test_label_agreement_hand_kappa(spark):
    """Textbook 2x2 kappa: po=0.7, pe=0.5, kappa=0.4 — floors to e6."""
    from commerce_data_pipeline_spark.operators.profiling import label_agreement

    rows = (
        [("x", "x")] * 4 + [("x", "y")] * 2 + [("y", "x")] * 1 + [("y", "y")] * 3
    )
    df = spark.createDataFrame(rows, "actual string, pred string")
    r = label_agreement(df, "actual", "pred").collect()[0]
    assert (r["n_rows"], r["n_agree"]) == (10, 7)
    assert r["po_e6"] == 700_000
    # pe = (6/10)(5/10) + (4/10)(5/10) = 0.5
    assert r["pe_e6"] == 500_000
    # kappa = (0.7 - 0.5)/(1 - 0.5) = 0.4 (floor can land at 399999/400000
    # depending on the double; pin the window)
    assert r["kappa_e6"] in (399_999, 400_000)


def test_label_agreement_degenerate_single_label(spark):
    from commerce_data_pipeline_spark.operators.profiling import label_agreement

    df = spark.createDataFrame([("a", "a")] * 5, "actual string, pred string")
    r = label_agreement(df, "actual", "pred").collect()[0]
    assert r["po_e6"] == 1_000_000 and r["pe_e6"] == 1_000_000
    assert r["kappa_e6"] is None  # pe = 1 -> undefined, not perfect


def test_label_agreement_disjoint_labels(spark):
    """Pred never matches actual label space: agreement 0, pe 0 (no
    matching label in the marginal join), kappa 0."""
    from commerce_data_pipeline_spark.operators.profiling import label_agreement

    df = spark.createDataFrame(
        [("a", "b"), ("a", "b"), ("c", "d")], "actual string, pred string"
    )
    r = label_agreement(df, "actual", "pred").collect()[0]
    assert r["n_agree"] == 0 and r["po_e6"] == 0 and r["pe_e6"] == 0
    assert r["kappa_e6"] == 0


def test_ks_drift_exact_and_degenerate(spark):
    """Hand-computable KS: identical snapshots → 0; disjoint supports →
    1e6; the max-gap location is the smallest attaining value; an empty
    side yields NULL."""
    from commerce_data_pipeline_spark.operators.profiling import ks_drift

    a = spark.createDataFrame([(1.0,), (2.0,), (3.0,), (4.0,)], "value double")
    r = ks_drift(a, a, "value").collect()[0]
    assert (r["n_a"], r["n_b"], r["ks_e6"]) == (4, 4, 0)
    assert r["at_value"] == 1.0  # all gaps zero → smallest support value

    b = spark.createDataFrame([(10.0,), (11.0,)], "value double")
    r = ks_drift(a, b, "value").collect()[0]
    # disjoint: after value 4, F_a=1, F_b=0 → D=1
    assert (r["ks_e6"], r["at_value"]) == (1_000_000, 4.0)

    # shifted overlap: a={1,2,3,4}, c={3,4,5,6} → max |F_a-F_c| at v=2
    # (2/4 - 0) = 0.5; also at 3 (3/4-1/4)=0.5, at 4 (1-2/4)=0.5 → smallest=2
    c = spark.createDataFrame([(3.0,), (4.0,), (5.0,), (6.0,)], "value double")
    r = ks_drift(a, c, "value").collect()[0]
    assert (r["ks_e6"], r["at_value"]) == (500_000, 2.0)

    empty = spark.createDataFrame([], "value double")
    r = ks_drift(a, empty, "value").collect()[0]
    assert r["ks_e6"] is None and r["n_b"] == 0


def test_psi_drift_identical_sides_zero(spark):
    from commerce_data_pipeline_spark.operators.profiling import psi_drift

    df = spark.createDataFrame([(float(v),) for v in range(1, 11)], "value double")
    out = psi_drift(df, df, "value", n_bands=10).collect()
    assert [r["band"] for r in out] == list(range(1, 11))
    assert all(r["psi_term_e6"] == 0 for r in out)
    assert all(r["psi_e6"] == 0 for r in out)
    assert all(r["n_ref"] == 1 and r["n_cur"] == 1 for r in out)


def test_psi_drift_hand_shift(spark):
    """ref = 1..10 (one per decile band), cur = ten 10s (all mass in band
    10): replay the Laplace-smoothed floored arithmetic by hand."""
    import math

    from commerce_data_pipeline_spark.operators.profiling import psi_drift

    ref = spark.createDataFrame([(float(v),) for v in range(1, 11)], "value double")
    cur = spark.createDataFrame([(10.0,)] * 10, "value double")
    out = {r["band"]: r for r in psi_drift(ref, cur, "value", n_bands=10).collect()}
    tr = tc = 10
    expected_terms = {}
    for band in range(1, 11):
        n_ref, n_cur = 1, (10 if band == 10 else 0)
        pr = (n_ref + 1) / (tr + 10)
        pc = (n_cur + 1) / (tc + 10)
        ratio = ((n_cur + 1) * (tr + 10)) / ((n_ref + 1) * (tc + 10))
        expected_terms[band] = math.floor((pc - pr) * math.log(ratio) * 1e6)
    total = sum(expected_terms.values())
    for band in range(1, 11):
        r = out[band]
        assert r["n_ref"] == 1
        assert r["n_cur"] == (10 if band == 10 else 0)
        assert r["psi_term_e6"] == expected_terms[band]
        assert r["psi_e6"] == total
    assert total > 0  # a real shift must score positive


def test_psi_drift_excludes_nulls_and_validates(spark):
    import pytest

    from commerce_data_pipeline_spark.operators.profiling import psi_drift

    ref = spark.createDataFrame(
        [(1.0,), (2.0,), (None,)], "value double"
    )
    out = psi_drift(ref, ref, "value", n_bands=2).collect()
    assert sum(r["n_ref"] for r in out) == 2
    with pytest.raises(ValueError, match="n_bands"):
        psi_drift(ref, ref, "value", n_bands=1)
    with pytest.raises(ValueError, match="6 decimal"):
        psi_drift(ref, ref, "value", n_bands=7)


def test_js_drift_identical_sides_zero_and_bounded(spark):
    import math

    from commerce_data_pipeline_spark.operators.profiling import js_drift

    df = spark.createDataFrame([(float(v),) for v in range(1, 11)], "value double")
    out = js_drift(df, df, "value", n_bands=10).collect()
    assert [r["band"] for r in out] == list(range(1, 11))
    assert all(r["js_term_e6"] == 0 and r["js_e6"] == 0 for r in out)
    # disjoint supports: JS maximal but still under the ln 2 cap
    lo = spark.createDataFrame([(float(v),) for v in range(10)], "value double")
    hi = spark.createDataFrame([(float(v),) for v in range(100, 110)], "value double")
    top = js_drift(lo, hi, "value", n_bands=10).collect()
    js = top[0]["js_e6"]
    assert 0 < js <= math.floor(math.log(2) * 1e6)


def test_js_drift_hand_shift(spark):
    """Same geometry as the PSI hand case: ref = 1..10, cur = ten 10s;
    replay the smoothed floored JS arithmetic by hand."""
    import math

    from commerce_data_pipeline_spark.operators.profiling import js_drift

    ref = spark.createDataFrame([(float(v),) for v in range(1, 11)], "value double")
    cur = spark.createDataFrame([(10.0,)] * 10, "value double")
    out = {r["band"]: r for r in js_drift(ref, cur, "value", n_bands=10).collect()}
    expected = {}
    for band in range(1, 11):
        n_ref, n_cur = 1, (10 if band == 10 else 0)
        p = (n_ref + 1) / 20
        q = (n_cur + 1) / 20
        m = (p + q) / 2.0
        expected[band] = math.floor(
            (p * math.log(p / m) + q * math.log(q / m)) * 0.5 * 1e6
        )
    total = sum(expected.values())
    for band in range(1, 11):
        assert out[band]["js_term_e6"] == expected[band], band
        assert out[band]["js_e6"] == total
    assert total > 0


def test_fd_violations_multi_matches_per_fd(spark):
    """r12 VERDICT #6: the one-pass multi-FD shape must be row-identical
    to per-FD fd_violations — including NULL determinants (a class of
    their own) and NULL dependents (ignored by countDistinct), the cases
    the injective string encoding must not collapse."""
    from commerce_data_pipeline_spark.operators.profiling import (
        fd_violations,
        fd_violations_multi,
    )

    rows = [
        (1, "a", "x"), (1, "a", "x"), (2, "b", "y"), (2, "c", "y"),
        (None, "d", "z"), (None, "d", None), (3, None, "x"),
        (4, "", "w"),  # empty string must stay distinct from NULL
    ]
    df = spark.createDataFrame(rows, "k int, v string, g string")
    fds = [(["k"], "v", None), (["v"], "g", None), (["k", "v"], "g", "pair")]
    multi = {
        r["fd"]: tuple(r)[1:]
        for r in fd_violations_multi(df, fds).collect()
    }
    for det, dep, label in fds:
        single = fd_violations(df, det, dep, label).collect()[0]
        assert multi[single["fd"]] == tuple(single)[1:], single["fd"]
    assert len(multi) == 3

    # empty table: the per-FD global agg yields one zero/NULL row per FD —
    # the multi path must not silently drop the audit rows (r13 review)
    empty = df.limit(0)
    m0 = {r["fd"]: tuple(r)[1:] for r in fd_violations_multi(empty, fds).collect()}
    for det, dep, label in fds:
        s0 = fd_violations(empty, det, dep, label).collect()[0]
        assert m0[s0["fd"]] == tuple(s0)[1:] == (0, 0, None, None), s0["fd"]

    # float -0.0 vs 0.0: native grouping/countDistinct normalize them to
    # ONE value; the string encoding must not split the class (r13 review)
    fdf = spark.createDataFrame(
        [(1, 0.0), (1, -0.0), (2, 3.5)], "k int, v double"
    )
    ffds = [(["k"], "v", None), (["v"], "k", None)]
    mf = {r["fd"]: tuple(r)[1:] for r in fd_violations_multi(fdf, ffds).collect()}
    for det, dep, label in ffds:
        sf_ = fd_violations(fdf, det, dep, label).collect()[0]
        assert mf[sf_["fd"]] == tuple(sf_)[1:], sf_["fd"]
    # k=1 has deps {0.0, -0.0} -> ONE distinct dependent: the FD holds
    assert mf["k->v"][1] == 0  # n_violating_classes


def test_fd_violations_multi_encoding_is_injective(spark):
    """r13 ADVICE (medium): the concat_ws determinant encoding collided
    for string values containing the \\x1f separator (('x\\x1f','y') vs
    ('x','\\x1fy')) and for a literal '\\x00' value vs NULL — classes the
    native per-FD groupBy keeps distinct were silently merged,
    understating violation counts. The escape pass must keep every such
    class distinct and stay row-identical to per-FD fd_violations."""
    from commerce_data_pipeline_spark.operators.profiling import (
        fd_violations,
        fd_violations_multi,
    )

    rows = [
        # separator-shift collision pair: same concat without escaping
        ("x\x1f", "y", "d1"), ("x", "\x1fy", "d2"),
        # NULL-sentinel collision: literal "\x00" value vs real NULL
        ("\x00", "a", "d3"), (None, "a", "d4"),
        # escape char itself must round-trip
        ("\x1b", "b", "d5"), ("\x1b\x1b", "b", "d6"),
        # adversarial: value that LOOKS like an escaped sequence
        ("\x1b_", "c", "d7"), ("\x1f", "c", "d8"),
    ]
    df = spark.createDataFrame(rows, "a string, b string, dep string")
    fds = [(["a", "b"], "dep", None), (["a"], "dep", None)]
    multi = {r["fd"]: tuple(r)[1:] for r in fd_violations_multi(df, fds).collect()}
    for det, dep, label in fds:
        single = fd_violations(df, det, dep, label).collect()[0]
        assert multi[single["fd"]] == tuple(single)[1:], single["fd"]
    # every (a, b) pair above is a DISTINCT determinant class of size 1:
    # 8 classes, zero violations — any collision would merge two deps
    # into one class and report a violation
    assert multi["a,b->dep"] == (8, 0, 1, 0)
