"""Round-7 operator tests: degree-oriented triangle census, the r6
ADVICE fixes (pagerank/LPA directed-input node sets, guarded_join `how`
validation, winsorize_summary scale-derived column name), and the
one-pass snapshot_diff guard."""

import pytest
from pyspark.sql import functions as F

from commerce_data_pipeline_spark.operators import graph, profiling, skew


def _edges(spark, rows):
    return spark.createDataFrame(rows, ["src", "dst", "weight"])


# --- triangle_stats: degree orientation --------------------------------


def _hub_graph():
    """A power-law-ish graph: hub 0 connected to 1..9, plus closures
    forming known triangles (0,1,2), (0,3,4), (1,2,3) and a hub-free
    triangle (20,21,22). 15 triangles would be wrong; count by hand:
    edges 0-i for i in 1..9; 1-2, 3-4, 2-3, 1-3; 20-21, 21-22, 20-22.
    Triangles: (0,1,2), (0,3,4), (0,2,3), (0,1,3), (1,2,3), (20,21,22)."""
    und = [(0, i) for i in range(1, 10)]
    und += [(1, 2), (3, 4), (2, 3), (1, 3), (20, 21), (21, 22), (20, 22)]
    return [(a, b, 1) for a, b in und] + [(b, a, 1) for a, b in und]


def test_triangle_stats_degree_and_id_orientation_identical(spark):
    e = _edges(spark, _hub_graph())
    by_deg = graph.triangle_stats(e).collect()[0]
    by_id = graph.triangle_stats(e, orient="id").collect()[0]
    assert by_deg == by_id
    assert by_deg["n_triangles"] == 6
    # hub 0 has degree 9 -> 36 wedges; deg(1)=deg(2)=3 -> 3 each,
    # deg(3)=4 -> 6, deg(4)=2 -> 1, deg(5..9)=1 -> 0, deg(20..22)=2 -> 1 each
    assert by_deg["n_wedges"] == 36 + 3 + 3 + 6 + 1 + 3
    assert by_deg["n_edges"] == 16


def test_triangle_stats_k4_and_path_under_degree_orientation(spark):
    k4 = [(a, b, 1) for a in range(4) for b in range(4) if a != b]
    out = graph.triangle_stats(_edges(spark, k4)).collect()[0]
    assert (out["n_triangles"], out["n_wedges"], out["global_cc_e6"]) == (
        4, 12, 1_000_000)
    out2 = graph.triangle_stats(
        _edges(spark, [(0, 1, 1), (1, 2, 1)])).collect()[0]
    assert (out2["n_triangles"], out2["n_wedges"]) == (0, 1)


def test_triangle_stats_rejects_unknown_orientation(spark):
    with pytest.raises(ValueError, match="orient"):
        graph.triangle_stats(_edges(spark, [(0, 1, 1)]), orient="rank")


# --- pagerank: dst-superset directed graphs (r6 ADVICE) ----------------


def test_pagerank_distributed_excludes_dst_only_nodes(spark):
    # A→B, B→A, B→C: C has no out-edges. The old needs_reseed=False
    # branch emitted C (superset of the node set); the per-round left
    # join on `nodes` — and the driver fast path, which refuses such
    # graphs — both exclude it.
    e = _edges(spark, [(1, 2, 1), (2, 1, 1), (2, 3, 1)])
    out = graph.pagerank(e, iterations=2, driver_budget_edges=0).collect()
    assert {r["node"] for r in out} == {1, 2}


def test_pagerank_symmetrized_still_skips_reseed_and_agrees(spark):
    rows = [(1, 2, 3), (2, 1, 3), (2, 3, 1), (3, 2, 1), (1, 3, 2), (3, 1, 2)]
    e = _edges(spark, rows)
    fast = {r["node"]: r["rank"] for r in graph.pagerank(e, iterations=3).collect()}
    dist = {r["node"]: r["rank"]
            for r in graph.pagerank(e, iterations=3, driver_budget_edges=0).collect()}
    assert fast == dist and set(fast) == {1, 2, 3}


# --- label propagation: voteless nodes on directed inputs (r6 ADVICE) --


def test_lpa_distributed_keeps_voteless_nodes(spark):
    # 1→99 only: 99 carries no label (no out-edges), so node 1 gets zero
    # votes in round 1. The driver path keeps 1 with its own label; the
    # distributed loop must too (it used to drop it via the inner argmax).
    e = _edges(spark, [(1, 99, 5)])
    fast = {r["node"]: r["label"] for r in graph.label_propagation(e, rounds=2).collect()}
    dist = {r["node"]: r["label"]
            for r in graph.label_propagation(e, rounds=2, driver_budget_edges=0).collect()}
    assert fast == dist == {1: 1}


def test_lpa_directed_mixed_votes_paths_agree(spark):
    # node 4 votes from labeled dst 1; node 5's only dst (77) is voteless
    e = _edges(spark, [(4, 1, 2), (1, 4, 2), (5, 77, 9)])
    fast = {r["node"]: r["label"] for r in graph.label_propagation(e, rounds=3).collect()}
    dist = {r["node"]: r["label"]
            for r in graph.label_propagation(e, rounds=3, driver_budget_edges=0).collect()}
    assert fast == dist
    assert fast[5] == 5  # retained with its own label, not dropped


# --- guarded_join `how` validation (r6 ADVICE) -------------------------


def test_guarded_join_rejects_unmodeled_how(spark):
    l = spark.createDataFrame([(1, "x")], "k long, a string")
    r = spark.createDataFrame([(1, "y")], "k long, b string")
    for bad in ("right", "full", "full_outer", "left_anti"):
        with pytest.raises(ValueError, match="guarded_join"):
            skew.guarded_join(l, r, "k", max_rows=10, how=bad)


def test_guarded_join_left_outer_normalizes_and_salts(spark):
    # left_outer used to crash inside salted_join when the salt threshold
    # tripped; now it normalizes to 'left' up front
    l = spark.createDataFrame(
        [(1, i) for i in range(40)] + [(2, 99)], "k long, v long")
    r = spark.createDataFrame([(1, "hot")], "k long, tag string")
    out = skew.guarded_join(l, r, "k", max_rows=100, how="left_outer",
                            salt_threshold=5).collect()
    assert len(out) == 41
    assert sum(1 for row in out if row["tag"] is None) == 1


# --- winsorize_summary: scale-derived column name (r6 ADVICE) ----------


def test_winsorize_summary_column_name_tracks_scale(spark):
    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 21)], "g string, v double")
    out3 = profiling.winsorize_summary(df, "v", "g", scale=1000)
    assert "winsorized_sum_e3" in out3.columns
    row = out3.collect()[0]
    assert row["winsorized_sum_e3"] == (sum(range(1, 20)) + 19) * 1000
    with pytest.raises(ValueError, match="power of 10"):
        profiling.winsorize_summary(df, "v", "g", scale=7)


# --- snapshot_diff: one scan per side ----------------------------------


def test_snapshot_diff_single_scan_per_side(spark, tmp_path):
    spark.createDataFrame([(i, f"s{i}") for i in range(10)],
                          "k long, s string").write.parquet(str(tmp_path / "old"))
    spark.createDataFrame([(i, f"s{i + (i % 3 == 0)}") for i in range(2, 12)],
                          "k long, s string").write.parquet(str(tmp_path / "new"))
    old = spark.read.parquet(str(tmp_path / "old"))
    new = spark.read.parquet(str(tmp_path / "new"))
    df = profiling.snapshot_diff(old, new, ["k"])
    # lazy — no eager guard jobs ran to build it, and the plan holds ONE
    # parquet scan of each side (the old guard added a second
    # count-action scan per side)
    from commerce_data_pipeline_spark import plans

    plan = plans.formatted_plan(df)
    # formatted mode prints each node twice (tree + details): 2 scans = 4
    assert plan.count("Scan parquet") == 4
    out = df.collect()[0]
    # old 0..9, new 2..11 with s shifted where k%3==0 -> changed {3,6,9}
    assert (out["n_added"], out["n_removed"]) == (2, 2)
    assert (out["n_changed"], out["n_unchanged"]) == (3, 5)
