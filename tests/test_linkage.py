"""Blocked fuzzy (edit-distance) record linkage — operators/linkage.py."""

import pyspark.sql.functions as F
import pytest

from commerce_data_pipeline_spark.operators import linkage


def _pairs(df, **kw):
    rows = linkage.blocked_edit_pairs(df, "id", "name", **kw).collect()
    return {(r.id_a, r.id_b): r.dist for r in rows}


def test_finds_in_block_matches_with_exact_distance(spark):
    df = spark.createDataFrame(
        [
            (1, "red widget"),
            (2, "red widgat"),   # 1 substitution
            (3, "red gizmo"),    # dist 5 from widget — blocked together, filtered out
            (4, "blue widget"),  # different first token → different block
        ],
        ["id", "name"],
    )
    got = _pairs(df, max_dist=2)
    assert got == {(1, 2): 1}


def test_normalization_case_and_whitespace(spark):
    df = spark.createDataFrame(
        [(1, "Red  Widget"), (2, "red widget"), (3, "  RED widget ")],
        ["id", "name"],
    )
    got = _pairs(df, max_dist=0)
    assert got == {(1, 2): 0, (1, 3): 0, (2, 3): 0}


def test_blocking_misses_first_token_edits(spark):
    """Documented recall contract: an edit in the FIRST token moves the
    record to another block, so the pair is not produced even at dist 1."""
    df = spark.createDataFrame([(1, "red widget"), (2, "rad widget")], ["id", "name"])
    assert _pairs(df, max_dist=3) == {}


def test_blocking_misses_word_count_changes(spark):
    df = spark.createDataFrame(
        [(1, "red widget"), (2, "red widget x")], ["id", "name"]
    )
    assert _pairs(df, max_dist=3) == {}


def test_max_block_truncation_is_deterministic_prefix(spark):
    # 5 identical names in one block, cap 3 → pairs only among the 3
    # lowest ids (ascending (id, name) prefix), C(3,2) = 3 pairs.
    df = spark.createDataFrame([(i, "same name") for i in range(5)], ["id", "name"])
    got = _pairs(df, max_dist=0, max_block=3)
    assert set(got) == {(0, 1), (0, 2), (1, 2)}
    assert _pairs(df, max_dist=0, max_block=None).keys() == {
        (a, b) for a in range(5) for b in range(a + 1, 5)
    }


def test_max_block_validation(spark):
    df = spark.createDataFrame([(1, "x")], ["id", "name"])
    with pytest.raises(ValueError):
        linkage.blocked_edit_pairs(df, "id", "name", max_block=1)


def test_levenshtein_matches_duckdb_reference(spark):
    """Pin Spark↔DuckDB levenshtein agreement on the exact name pairs the
    fuzzy_name_pairs oracle relies on (unit-cost ins/del/sub)."""
    duckdb = pytest.importorskip("duckdb")
    cases = [
        ("red widget", "red widgat"),
        ("small ring", "small rings"),
        ("hot gear", "hot bear"),
        ("blue bolt", "blue bolts"),
    ]
    df = spark.createDataFrame(cases, ["a", "b"]).select(
        F.levenshtein("a", "b").alias("d")
    )
    spark_d = [r.d for r in df.collect()]
    con = duckdb.connect()
    duck_d = [
        con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        for a, b in cases
    ]
    assert spark_d == duck_d


# ---- fuzzy_name_match: canonicalize-first entity resolution --------------

def _matches(spark, names, **kw):
    df = spark.createDataFrame([(n,) for n in names], ["name"])
    rows = linkage.fuzzy_name_match(df, "name", **kw).collect()
    return {(r.name_a, r.name_b): (r.dist, r.n_record_pairs) for r in rows}


def test_fuzzy_match_within_group_pair_arithmetic(spark):
    # 4 identical records → C(4,2) = 6 record pairs at dist 0
    got = _matches(spark, ["red widget"] * 4)
    assert got == {("red widget", "red widget"): (0, 6)}


def test_fuzzy_match_cross_group_multiplicity(spark):
    # 3 × "red widget" and 2 × "red widgat" (dist 1) → 3·2 = 6 cross
    # record pairs, plus C(3,2)=3 and C(2,2)=1 within-group pairs
    got = _matches(spark, ["red widget"] * 3 + ["red widgat"] * 2)
    assert got == {
        ("red widgat", "red widget"): (1, 6),
        ("red widget", "red widget"): (0, 3),
        ("red widgat", "red widgat"): (0, 1),
    }


def test_fuzzy_match_singletons_emit_no_self_rows(spark):
    got = _matches(spark, ["red widget", "blue bolt"])
    assert got == {}  # different blocks, no duplicates


def test_fuzzy_match_distance_filter(spark):
    got = _matches(spark, ["red ring", "red rings", "red gizmo"], max_dist=1)
    assert got == {("red ring", "red rings"): (1, 1)}


def test_fuzzy_match_agrees_with_record_level_histogram(spark):
    """The canonicalize-first histogram must equal the exhaustive
    record-level histogram (blocked_edit_pairs with no truncation) when
    blocks are identical — the arithmetic is a pure refactoring."""
    names = (
        ["red widget"] * 3 + ["red widgat"] * 2 + ["red ring"] * 2
        + ["blue bolt"] * 2 + ["blue bolts"]
    )
    df = spark.createDataFrame(list(enumerate(names)), ["id", "name"])
    rec = (
        linkage.blocked_edit_pairs(df, "id", "name", max_dist=2, max_block=None)
        .groupBy("dist").count()
    )
    rec_hist = {r.dist: r["count"] for r in rec.collect()}
    agg = (
        linkage.fuzzy_name_match(df.select("name"), "name", max_dist=2, max_block=None)
        .groupBy("dist").sum("n_record_pairs")
    )
    name_hist = {r.dist: r["sum(n_record_pairs)"] for r in agg.collect()}
    assert rec_hist == name_hist and rec_hist


def test_snm_catches_first_token_typo_blocking_misses(spark):
    """'zanvas bag' (typo of 'canvas bag') breaks blocked_edit_pairs'
    first-token block key but sorts nearby when the neighborhood reaches
    it — the complementary-recall story of multi-pass matchers."""
    from commerce_data_pipeline_spark.operators.linkage import (
        blocked_edit_pairs, snm_pairs,
    )

    rows = [
        (1, "canvas bag"),
        (2, "zanvas bag"),   # first-char typo
        (3, "velvet coat"),
    ]
    df = spark.createDataFrame(rows, ["rid", "name"])
    blocked = blocked_edit_pairs(df, "rid", "name", max_dist=1)
    assert not [r for r in blocked.collect() if {r["id_a"], r["id_b"]} == {1, 2}]
    snm = snm_pairs(df, "rid", "name", window=3, max_dist=1).collect()
    assert any({r["id_a"], r["id_b"]} == {1, 2} and r["dist"] == 1 for r in snm)


def test_snm_window_bounds_candidates(spark):
    from commerce_data_pipeline_spark.operators.linkage import snm_pairs

    rows = [(i, f"name {chr(97 + i)}") for i in range(6)]
    df = spark.createDataFrame(rows, ["rid", "name"])
    # window=2: only adjacent-in-sort pairs, all dist 1 here
    got = sorted(
        (r["id_a"], r["id_b"]) for r in snm_pairs(df, "rid", "name", window=2).collect()
    )
    assert got == [(i, i + 1) for i in range(5)]


def test_snm_boundary_pairs_complete_across_forced_partition_split(spark):
    """The r7 VERDICT directive: snm_pairs' rank must be range-partitioned,
    and neighbor pairs whose members land in DIFFERENT range slices must
    still be produced. Force many slices over few rows so nearly every
    sort-adjacent pair straddles a slice boundary, and compare against the
    naive single-window reference result computed in Python."""
    from commerce_data_pipeline_spark.operators.linkage import snm_pairs

    rows = [(i, f"item {chr(97 + i)}{chr(97 + (i * 7) % 26)}") for i in range(40)]
    df = spark.createDataFrame(rows, ["rid", "name"]).repartition(5)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "16")  # 16 slices / 40 rows
    try:
        got = sorted(
            (r["id_a"], r["id_b"], r["dist"])
            for r in snm_pairs(df, "rid", "name", window=4, max_dist=3).collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    # reference: sort names in Python, pair each with its 3 successors
    import itertools

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[-1]

    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    want = sorted(
        (min(a[0], b[0]), max(a[0], b[0]), lev(a[1], b[1]))
        for i, a in enumerate(ordered)
        for b in ordered[i + 1 : i + 4]
        if lev(a[1], b[1]) <= 3
    )
    assert got == want and want  # non-empty: boundary pairs included


def test_global_rank_matches_naive_window(spark):
    """relational.global_rank == row_number over the naive global window,
    under a forced multi-slice split and a descending sort key."""
    from pyspark.sql import Window as W

    from commerce_data_pipeline_spark.operators.relational import global_rank

    df = spark.createDataFrame(
        [(i, (i * 13) % 7) for i in range(50)], ["k", "v"]
    ).repartition(7)
    got = global_rank(
        df, [F.desc("v"), F.asc("k")], rank_col="r", num_partitions=11
    )
    want = df.withColumn(
        "r", F.row_number().over(W.orderBy(F.desc("v"), F.asc("k"))).cast("long")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_multi_pass_union_provenance_and_blind_spots(spark):
    """Each pass contributes pairs the other misses, and the union keeps
    per-pass provenance: (1,2) sits in one block AND sort-adjacent (both
    passes), (3,4) has a first-token edit (blocking's documented miss;
    SNM catches it because the typo keeps the names sort-adjacent), and
    (5,6) shares a block but the sort scatters them 4 ranks apart behind
    the filler names (SNM's documented miss at window=4)."""
    df = spark.createDataFrame(
        [
            (1, "red widget"),
            (2, "red widgat"),
            (3, "tan gizmo"),
            (4, "taz gizmo"),
            (5, "blue kat"),
            (6, "blue kit"),
            # sort fillers between "blue kat" and "blue kit", dist 2 from
            # both (filtered at max_dist=1) — they only push kat/kit out
            # of each other's SNM window
            (7, "blue kbqx"),
            (8, "blue kcmy"),
            (9, "blue kdvz"),
        ],
        ["id", "name"],
    )
    rows = linkage.multi_pass_candidates(
        df, "id", "name", max_dist=1, window=4
    ).collect()
    got = {(r.id_a, r.id_b): (r.dist, r.from_block, r.from_snm) for r in rows}
    assert got == {
        (1, 2): (1, True, True),
        (3, 4): (1, False, True),
        (5, 6): (1, True, False),
    }
    assert len(rows) == len(got)  # one row per undirected pair


def test_multi_pass_dedup_collapses_repeat_candidates(spark):
    """A pair generated by both passes AND by SNM at multiple window
    offsets still yields exactly one output row."""
    df = spark.createDataFrame(
        [(1, "zz top"), (2, "zz top"), (3, "zz tap")], ["id", "name"]
    )
    rows = linkage.multi_pass_candidates(
        df, "id", "name", max_dist=1, window=3
    ).collect()
    got = {(r.id_a, r.id_b): (r.dist, r.from_block, r.from_snm) for r in rows}
    # all three records share the (zz, 2) block and sit inside one SNM
    # window of 3 — every pair is found by both passes, exactly once
    assert got == {
        (1, 2): (0, True, True),
        (1, 3): (1, True, True),
        (2, 3): (1, True, True),
    }
    assert len(rows) == 3


def test_best_match_keeps_only_mutual_best(spark):
    """Chain a—b (dist 1) — c (dist 2): a and b pick each other, c's
    best is b but b's best is a, so (b, c) is filtered out — the
    one-to-one precision property."""
    cand = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 2)], "id_a long, id_b long, dist int"
    )
    rows = linkage.best_match_pairs(cand).collect()
    assert {(r.id_a, r.id_b) for r in rows} == {(1, 2)}


def test_best_match_tie_breaks_toward_smaller_partner(spark):
    """a has two dist-1 candidates (b=2, c=3): the tie resolves to the
    smaller partner id, deterministically, so (a, c) dies even though
    its distance equals the survivor's."""
    cand = spark.createDataFrame(
        [(1, 2, 1), (1, 3, 1)], "id_a long, id_b long, dist int"
    )
    rows = linkage.best_match_pairs(cand).collect()
    assert {(r.id_a, r.id_b) for r in rows} == {(1, 2)}


def test_best_match_passes_extra_columns_through(spark):
    """best_match_pairs is a FILTER: surviving rows keep every input
    column (here the multi-pass provenance booleans) unchanged."""
    df = spark.createDataFrame(
        [
            (1, "red widget"),
            (2, "red widgat"),
            (3, "tan gizmo"),
            (4, "taz gizmo"),
        ],
        ["id", "name"],
    )
    cand = linkage.multi_pass_candidates(df, "id", "name", max_dist=1, window=4)
    surv = linkage.best_match_pairs(cand)
    assert set(surv.columns) == {"id_a", "id_b", "dist", "from_block", "from_snm"}
    got = {(r.id_a, r.id_b): (r.from_block, r.from_snm) for r in surv.collect()}
    # both pairs are mutual best (disjoint); provenance survives intact
    assert got == {(1, 2): (True, True), (3, 4): (False, True)}


def test_multipass_cache_bit_parity(spark):
    """House rule for shared persisted builds: the `.cache/` parquet
    roundtrip of the multi-pass candidates must be bit-identical to the
    inline build (int/boolean columns roundtrip parquet exactly), so the
    two consuming registry queries and their oracles are unaffected by
    the caching."""
    from commerce_data_pipeline_spark import queries as Q
    from commerce_data_pipeline_spark.catalog import load_table

    sf = "/root/testdata/sf0.001"
    part = load_table(spark, sf, "part")
    inline = linkage.multi_pass_candidates(
        part, "p_partkey", "p_name", max_dist=2, window=4, max_block=256
    )
    cached = Q._ensure_multipass_cand(spark, sf)
    assert sorted(inline.columns) == sorted(cached.columns)
    cols = sorted(inline.columns)
    a = sorted(map(tuple, inline.select(*cols).collect()))
    b = sorted(map(tuple, cached.select(*cols).collect()))
    assert a == b
