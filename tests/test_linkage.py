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
