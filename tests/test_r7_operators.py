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


# --- kcore: fixed-rounds peeling + until_stable -------------------------


def _k4_with_tail(spark):
    """K4 on {0,1,2,3} plus the pendant chain 3-4, 4-5."""
    und = [(a, b) for a in range(4) for b in range(a + 1, 4)] + [(3, 4), (4, 5)]
    return spark.createDataFrame([(a, b, 1) for a, b in und], ["a", "b", "w"])


def test_kcore_peels_chain_and_keeps_clique(spark):
    pairs = _k4_with_tail(spark)
    out = {r["node"]: r["degree"]
           for r in graph.kcore(pairs, k=2, rounds=3, src="a", dst="b").collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_kcore_round_count_is_visible_in_degrees(spark):
    # after ONE peel pass only node 5 is gone: edge 3-4 survives, so
    # deg(3)=4; a second pass removes the now-degree-1 node 4
    pairs = _k4_with_tail(spark)
    out = {r["node"]: r["degree"]
           for r in graph.kcore(pairs, k=2, rounds=1, src="a", dst="b").collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 4}


def test_kcore_until_stable_matches_fixed_rounds_here(spark):
    pairs = _k4_with_tail(spark)
    stable = {(r["node"], r["degree"]) for r in graph.kcore(
        pairs, k=2, until_stable=True, src="a", dst="b").collect()}
    fixed = {(r["node"], r["degree"]) for r in graph.kcore(
        pairs, k=2, rounds=3, src="a", dst="b").collect()}
    assert stable == fixed


def test_kcore_empties_when_k_exceeds_max_degree(spark):
    pairs = _k4_with_tail(spark)
    assert graph.kcore(pairs, k=4, until_stable=True, src="a", dst="b").count() == 0


# --- neighbor_jaccard ----------------------------------------------------


def test_neighbor_jaccard_hand_counts(spark):
    # N(1)={10,11}, N(2)={10,11,12}, N(3)={12}
    pairs = spark.createDataFrame(
        [(1, 10), (2, 10), (1, 11), (2, 11), (2, 12), (3, 12)], ["a", "b"])
    rows = {(r["item_x"], r["item_y"]): r
            for r in graph.neighbor_jaccard(pairs, min_common=2).collect()}
    assert set(rows) == {(1, 2), (10, 11)}
    r12 = rows[(1, 2)]
    assert (r12["common"], r12["degree_x"], r12["degree_y"]) == (2, 2, 3)
    assert r12["jaccard_e6"] == 666666  # floor(2e6 / 3)
    r1011 = rows[(10, 11)]
    assert (r1011["common"], r1011["jaccard_e6"]) == (2, 1_000_000)


def test_neighbor_jaccard_center_degree_cap(spark):
    pairs = spark.createDataFrame(
        [(1, 10), (2, 10), (1, 11), (2, 11), (2, 12), (3, 12)], ["a", "b"])
    # capping every center to 1 neighbor leaves no wedges at all
    assert graph.neighbor_jaccard(pairs, min_common=1, max_center_degree=1).count() == 0


# --- benford_profile ------------------------------------------------------


def test_benford_profile_hand_digits(spark):
    df = spark.createDataFrame(
        [(1.0,), (1.5,), (2.0,), (9.99,), (0.0,), (-3.0,)], ["v"])
    rows = {r["digit"]: r for r in profiling.benford_profile(df, "v").collect()}
    # 0 and negative values carry no Benford digit
    assert {d: rows[d]["n"] for d in rows} == {1: 2, 2: 1, 9: 1}
    assert rows[1]["observed_ppm"] == 500_000
    assert rows[1]["expected_ppm"] == 301_029
    assert rows[1]["abs_dev_ppm"] == 198_971
    assert rows[9]["observed_ppm"] == 250_000
    assert rows[9]["abs_dev_ppm"] == 250_000 - 45_757


# --- pearson_moments ------------------------------------------------------


def test_pearson_moments_matches_exact_formula(spark):
    import math

    data = [(1.0, 2.5), (2.0, 1.5), (3.0, 4.0), (4.0, 3.25), (5.0, 6.0)]
    df = spark.createDataFrame(data, ["x", "y"])
    out = profiling.pearson_moments(df, [("x", "y")]).collect()[0]
    xs = [math.floor(x * 100.0) for x, _ in data]
    ys = [math.floor(y * 100.0) for _, y in data]
    n = float(len(data))
    sx, sy = float(sum(xs)), float(sum(ys))
    sxx = float(sum(v * v for v in xs))
    syy = float(sum(v * v for v in ys))
    sxy = float(sum(a * b for a, b in zip(xs, ys)))
    corr = (n * sxy - sx * sy) / (
        math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert out["n"] == 5
    assert out["corr_e6"] == math.floor(corr * 1_000_000)


def test_pearson_moments_null_on_zero_variance(spark):
    df = spark.createDataFrame([(1.0, 7.0), (2.0, 7.0)], ["x", "y"])
    out = profiling.pearson_moments(df, [("x", "y")]).collect()[0]
    assert out["corr_e6"] is None
    assert out["n"] == 2


def test_pearson_moments_one_row_per_pair_single_scan(spark):
    df = spark.createDataFrame([(1.0, 2.0, 3.0)], ["x", "y", "z"])
    out = profiling.pearson_moments(df, [("x", "y"), ("y", "z"), ("x", "z")])
    assert [(r["col_x"], r["col_y"]) for r in out.collect()] == [
        ("x", "y"), ("y", "z"), ("x", "z")]


# --- kmeans_step ----------------------------------------------------------


def _toy_embeddings(spark):
    from commerce_data_pipeline_spark.operators import similarity  # noqa: F401

    return spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.9, 0.1]),
         (3, [0.1, 0.9]), (4, [0.5, 0.5])],
        "vec_id long, embedding array<float>")


def test_kmeans_step_assignment_and_update_stats(spark):
    from commerce_data_pipeline_spark.operators.similarity import kmeans_step

    out = {(r["cluster_id"], r["dim"]): r
           for r in kmeans_step(_toy_embeddings(spark), k=2).collect()}
    # v2 joins seed 0, v3 joins seed 1, the equidistant v4 ties to the
    # SMALLER centroid id (integer scores tie exactly, no float fuzz)
    assert out[(0, 0)]["n_members"] == 3
    assert out[(1, 0)]["n_members"] == 2
    # float32 0.9 widens to 0.899999..., so floor(x*1e6) = 899999
    assert out[(0, 0)]["sum_e6"] == 1_000_000 + 899_999 + 500_000
    assert out[(0, 0)]["centroid_e6"] == (1_000_000 + 899_999 + 500_000) // 3
    assert out[(1, 1)]["sum_e6"] == 1_000_000 + 899_999


def test_kmeans_step_requires_contiguous_seed_ids(spark):
    from commerce_data_pipeline_spark.operators.similarity import kmeans_step

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (5, [0.0, 1.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="seed ids"):
        kmeans_step(emb, k=2)


# --- chi_square_drift -----------------------------------------------------


def test_chi_square_drift_hand_case(spark):
    a = spark.createDataFrame([("x",)] * 30 + [("y",)] * 10, ["c"])
    b = spark.createDataFrame([("x",)] * 10 + [("y",)] * 30, ["c"])
    rows = {r["category"]: r
            for r in profiling.chi_square_drift(a, b, "c").collect()}
    # totals 40/40, row totals 40 each -> e = 20 everywhere,
    # chi2 per category = (30-20)^2/20 + (10-20)^2/20 = 10.0
    assert rows["x"]["n_a"] == 30 and rows["x"]["n_b"] == 10
    assert rows["x"]["chi2_e6"] == 10_000_000
    assert rows["y"]["chi2_e6"] == 10_000_000


def test_chi_square_drift_vanishing_category(spark):
    a = spark.createDataFrame([("x",), ("x",), ("gone",), ("gone",)], ["c"])
    b = spark.createDataFrame([("x",), ("x",), ("x",), ("x",)], ["c"])
    rows = {r["category"]: r
            for r in profiling.chi_square_drift(a, b, "c").collect()}
    # a category present on one side only still gets a row (count 0)
    assert rows["gone"]["n_a"] == 2 and rows["gone"]["n_b"] == 0
    assert rows["gone"]["chi2_e6"] > 0


# --- kmeans_train ----------------------------------------------------------


def test_kmeans_train_one_round_equals_step(spark):
    from commerce_data_pipeline_spark.operators.similarity import (
        kmeans_step,
        kmeans_train,
    )

    emb = _toy_embeddings(spark)
    step = sorted(map(tuple, kmeans_step(emb, k=2).collect()))
    train = sorted(map(tuple, kmeans_train(emb, k=2, rounds=1).collect()))
    assert step == train


def test_kmeans_train_second_round_moves_centroids(spark):
    from commerce_data_pipeline_spark.operators.similarity import kmeans_train

    emb = _toy_embeddings(spark)
    r1 = {(r["cluster_id"], r["dim"]): r["centroid_e6"]
          for r in kmeans_train(emb, k=2, rounds=1).collect()}
    r2 = kmeans_train(emb, k=2, rounds=2)
    rows = {(r["cluster_id"], r["dim"]): r for r in r2.collect()}
    # same membership at the fixed point of this toy set: round 2 assigns
    # against the round-1 means and reproduces the same update stats
    assert rows[(0, 0)]["n_members"] == 3
    assert rows[(0, 0)]["centroid_e6"] == r1[(0, 0)]
    # validation still applies through the loop
    import pytest as _pytest

    with _pytest.raises(ValueError, match="rounds"):
        kmeans_train(emb, k=2, rounds=0)


def test_kmeans_train_codebook_budget(spark):
    from commerce_data_pipeline_spark.operators.similarity import kmeans_train

    emb = _toy_embeddings(spark)
    with pytest.raises(ValueError, match="codebook"):
        kmeans_train(emb, k=2, rounds=1, max_codebook=3)


# --- fk_orphans -----------------------------------------------------------


def test_fk_orphans_counts_orphans_and_exempts_nulls(spark):
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (7,), (7,), (7,), (None,)], "k long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "p long")
    out = profiling.fk_orphans([("c->p", child, "k", parent, "p")]).collect()
    assert len(out) == 1
    r = out[0]
    assert r["relationship"] == "c->p"
    assert r["n_child_rows"] == 7
    assert r["n_null_rows"] == 1          # NULL FK is exempt, not an orphan
    assert r["n_orphan_rows"] == 3        # the three k=7 rows
    assert r["n_orphan_keys"] == 1


def test_fk_orphans_clean_relationship_is_all_zero(spark):
    child = spark.createDataFrame([(1,), (2,)], "k long")
    parent = spark.createDataFrame([(1,), (2,)], "p long")
    r = profiling.fk_orphans([("ok", child, "k", parent, "p")]).collect()[0]
    assert (r["n_orphan_rows"], r["n_orphan_keys"], r["n_null_rows"]) == (0, 0, 0)


def test_fk_orphans_multiple_relationships_one_row_each(spark):
    a = spark.createDataFrame([(1,)], "k long")
    p = spark.createDataFrame([(9,)], "p long")
    out = profiling.fk_orphans(
        [("r1", a, "k", p, "p"), ("r2", p, "p", a, "k")]).collect()
    assert [r["relationship"] for r in out] == ["r1", "r2"]
    assert out[0]["n_orphan_keys"] == 1 and out[1]["n_orphan_keys"] == 1


def test_kcore_canonical_matches_normalized(spark):
    # canonical=True (input already distinct a<b) must equal the
    # normalizing path given such input — it only skips the shuffle
    pairs = _k4_with_tail(spark)
    a = sorted(map(tuple, graph.kcore(
        pairs, k=2, rounds=2, src="a", dst="b").collect()))
    b = sorted(map(tuple, graph.kcore(
        pairs, k=2, rounds=2, src="a", dst="b", canonical=True).collect()))
    assert a == b


# --- deterministic_walks --------------------------------------------------


def test_deterministic_walks_replays_md5_choices(spark):
    import hashlib

    # path graph 1-2-3: adjacency of 2 is [1,3]; 1 and 3 have one
    # neighbor each, so their walks are forced
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["a", "b"])
    out = {(r["start_node"], r["walk_id"], r["step"]): r["node"]
           for r in graph.deterministic_walks(pairs, walk_len=2,
                                              walks_per_node=1).collect()}
    adj = {1: [2], 2: [1, 3], 3: [2]}

    def h(cur, t, start, wid):
        s = f"{cur}:{t}:{start}:{wid}"
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    for start in (1, 2, 3):
        cur = start
        assert out[(start, 0, 0)] == start
        for t in (1, 2):
            nxt = adj[cur][h(cur, t, start, 0) % len(adj[cur])]
            assert out[(start, 0, t)] == nxt, (start, t)
            cur = nxt


def test_deterministic_walks_row_count_and_determinism(spark):
    pairs = spark.createDataFrame(
        [(a, b) for a in range(5) for b in range(a + 1, 5)], ["a", "b"])  # K5
    w1 = sorted(map(tuple, graph.deterministic_walks(
        pairs, walk_len=3, walks_per_node=2).collect()))
    w2 = sorted(map(tuple, graph.deterministic_walks(
        pairs, walk_len=3, walks_per_node=2).collect()))
    assert w1 == w2
    assert len(w1) == 5 * 2 * 4


def test_pearson_moments_rejects_empty_pairs(spark):
    df = spark.createDataFrame([(1.0,)], ["x"])
    with pytest.raises(ValueError, match="column pair"):
        profiling.pearson_moments(df, [])


def test_chi_square_drift_empty_side_yields_null_not_crash(spark):
    a = spark.createDataFrame([("x",), ("y",)], "c string")
    b = spark.createDataFrame([], "c string")
    rows = profiling.chi_square_drift(a, b, "c").collect()
    # out-of-contract input (empty snapshot): rows surface with NULL
    # chi2 instead of crashing — the audit stays actionable
    assert {r["category"] for r in rows} == {"x", "y"}
    assert all(r["n_b"] == 0 for r in rows)
