"""Unit tests for graph analytics (operators/graph.py): integer-exact
PageRank and co-occurrence edge building."""

from pyspark.sql import Row, functions as F

from commerce_data_pipeline_spark.operators import graph


def _edges(spark, rows):
    return spark.createDataFrame(rows, ["src", "dst", "weight"])


def test_pagerank_matches_hand_computation(spark):
    # 1→2, 2→{1,3}, 3→1 at weight 1; r0 = 1e9, teleport = 150e6.
    # iter1 by hand: r(1) = 150e6 + 850e6 + 425e6 = 1_425_000_000,
    # r(2) = 150e6 + 850e6 = 1_000_000_000, r(3) = 150e6 + 425e6 = 575_000_000
    e = _edges(spark, [(1, 2, 1), (2, 3, 1), (3, 1, 1), (2, 1, 1)])
    r1 = {r["node"]: r["rank"] for r in graph.pagerank(e, iterations=1).collect()}
    assert r1 == {1: 1_425_000_000, 2: 1_000_000_000, 3: 575_000_000}
    # 3 iterations: pinned against the DuckDB recursive-CTE replay
    r3 = {r["node"]: r["rank"] for r in graph.pagerank(e, iterations=3).collect()}
    assert r3 == {1: 1_217_281_250, 2: 1_054_187_500, 3: 728_531_250}


def test_pagerank_mass_conserved_and_weighted(spark):
    # weighted edges: contributions split by weight share, total mass is
    # conserved up to the deterministic per-edge floors
    e = _edges(spark, [(1, 2, 3), (1, 3, 1), (2, 1, 1), (3, 1, 1)])
    rows = graph.pagerank(e, iterations=5).collect()
    total = sum(r["rank"] for r in rows)
    assert 3 * 10**9 - len(rows) * 5 * 10 <= total <= 3 * 10**9
    r = {x["node"]: x["rank"] for x in rows}
    assert r[2] > r[3]  # node 2 receives 3x node 3's share of node 1's mass


def test_pagerank_no_in_edges_keeps_teleport(spark):
    # 9→1 only: node 9 has no in-edges; it must survive every round at
    # exactly the teleport mass, not vanish from the frame
    e = _edges(spark, [(9, 1, 1), (1, 9, 0)])  # weight-0 back edge: no mass
    e = e.filter(F.col("weight") > 0).unionByName(
        _edges(spark, [(1, 1, 1)])  # self-loop keeps node 1 an out-node
    )
    r = {x["node"]: x["rank"] for x in graph.pagerank(e, iterations=2).collect()}
    assert r[9] == 150_000_000


def test_pagerank_driver_and_distributed_paths_agree(spark):
    # the driver fast path (numpy, default budget) and the distributed
    # loop (budget=0 forces it) must replay the identical integer
    # trajectory — same floors, same sums, bit-for-bit
    e = _edges(
        spark,
        [(1, 2, 3), (1, 3, 1), (2, 1, 1), (3, 1, 2), (2, 3, 5), (3, 2, 1)],
    )
    fast = {r["node"]: r["rank"] for r in graph.pagerank(e, iterations=4).collect()}
    dist = {
        r["node"]: r["rank"]
        for r in graph.pagerank(e, iterations=4, driver_budget_edges=0).collect()
    }
    assert fast == dist


def test_pagerank_pairs_computed_input_checkpoints_first(spark):
    """r8 ADVICE: a COMPUTED undirected-pair frame (aggregate upstream —
    here a groupBy-derived pair list) must route through the
    checkpoint-first budget admission (graph._count_is_metadata_only
    returns False), paying ONE materialization instead of a count job +
    a toPandas recompute — and the ranks must be bit-identical to the
    same pairs passed as a literal frame."""
    raw = spark.createDataFrame(
        [(1, 2), (1, 2), (1, 3), (2, 3), (2, 3), (2, 3)], "a long, b long"
    )
    computed = raw.groupBy("a", "b").agg(F.count(F.lit(1)).alias("weight"))
    assert not graph._count_is_metadata_only(computed)
    literal = spark.createDataFrame(
        [(1, 2, 2), (1, 3, 1), (2, 3, 3)], "a long, b long, weight long"
    )
    as_map = lambda df: {r["node"]: r["rank"] for r in df.collect()}  # noqa: E731
    got = as_map(graph.pagerank(None, iterations=4, undirected_pairs=computed))
    want = as_map(graph.pagerank(None, iterations=4, undirected_pairs=literal))
    assert got == want


def test_pagerank_distributed_no_in_edges_keeps_teleport(spark):
    # the reseed branch of the distributed loop (skipped on symmetrized
    # graphs) still re-seeds in-degree-0 nodes with the teleport mass
    e = _edges(spark, [(9, 1, 1), (1, 1, 1)])
    r = {
        x["node"]: x["rank"]
        for x in graph.pagerank(e, iterations=2, driver_budget_edges=0).collect()
    }
    assert r[9] == 150_000_000


def test_pagerank_drops_nonpositive_weights(spark):
    # weight-0 edges are dropped up front (they would divide by zero and
    # silently vanish mass); both paths must agree on the filtered graph
    e = _edges(spark, [(1, 2, 1), (2, 1, 1), (1, 3, 0), (3, 1, 1), (3, 2, -4)])
    fast = graph.pagerank(e, iterations=2).collect()
    dist = graph.pagerank(e, iterations=2, driver_budget_edges=0).collect()
    assert {(r["node"], r["rank"]) for r in fast} == {
        (r["node"], r["rank"]) for r in dist
    }
    r = {x["node"]: x["rank"] for x in fast}
    assert 3 in r  # node 3 keeps its positive-weight out-edge


def test_co_occurrence_edges_symmetry_and_cap(spark):
    facts = spark.createDataFrame(
        [Row(b=1, i=10), Row(b=1, i=20), Row(b=1, i=30), Row(b=1, i=10),
         Row(b=2, i=10), Row(b=2, i=20), Row(b=3, i=99)]
    )
    out = graph.co_occurrence_edges(facts, "b", "i").collect()
    ed = {(r["src"], r["dst"]): r["weight"] for r in out}
    # both directions, dup fact rows collapse, singleton basket 3 drops out
    assert ed[(10, 20)] == ed[(20, 10)] == 2
    assert ed[(10, 30)] == ed[(30, 10)] == 1
    assert not any(99 in k for k in ed)
    # cap: a 5-item basket capped at 3 keeps only the 3 smallest items
    big = spark.createDataFrame([Row(b=1, i=v) for v in (5, 4, 3, 2, 1)])
    capped = graph.co_occurrence_edges(big, "b", "i", max_basket=3).collect()
    nodes = {r["src"] for r in capped}
    assert nodes == {1, 2, 3}


def test_label_propagation_two_cliques(spark):
    # two triangles bridged by one weak edge: LPA labels each clique by
    # its min member; the weak bridge (weight 1 vs in-clique 10) never
    # flips a label
    tri1 = [(a, b, 10) for a in (1, 2, 3) for b in (1, 2, 3) if a != b]
    tri2 = [(a, b, 10) for a in (7, 8, 9) for b in (7, 8, 9) if a != b]
    bridge = [(3, 7, 1), (7, 3, 1)]
    e = _edges(spark, tri1 + tri2 + bridge)
    out = {r["node"]: r["label"] for r in graph.label_propagation(e, rounds=3).collect()}
    assert out[1] == out[2] == out[3] == 1
    assert out[7] == out[8] == out[9] == 7


def test_label_propagation_tie_breaks_to_min_label(spark):
    # node 5 sees equal weight from labels 1 and 2 -> adopts 1
    e = _edges(spark, [(5, 1, 3), (5, 2, 3), (1, 5, 3), (2, 5, 3)])
    out = {r["node"]: r["label"] for r in graph.label_propagation(e, rounds=1).collect()}
    assert out[5] == 1


def test_triangle_stats_counts_known_graph(spark):
    # K4 has 4 triangles, 12 wedges (4 nodes of degree 3), cc = 1.0
    k4 = [(a, b, 1) for a in range(4) for b in range(4) if a != b]
    out = graph.triangle_stats(_edges(spark, k4)).collect()[0]
    assert out["n_nodes"] == 4 and out["n_edges"] == 6
    assert out["n_triangles"] == 4 and out["n_wedges"] == 12
    assert out["global_cc_e6"] == 1_000_000
    # a path graph has wedges but no triangles
    path = [(0, 1, 1), (1, 0, 1), (1, 2, 1), (2, 1, 1)]
    out2 = graph.triangle_stats(_edges(spark, path)).collect()[0]
    assert out2["n_triangles"] == 0 and out2["n_wedges"] == 1
    assert out2["global_cc_e6"] == 0


def test_label_propagation_driver_and_distributed_agree(spark):
    import random

    rng = random.Random(11)
    rows = [(rng.randrange(12), rng.randrange(12), rng.randrange(1, 6))
            for _ in range(60)]
    rows = [(a, b, w) for a, b, w in rows if a != b]
    e = _edges(spark, rows + [(b, a, w) for a, b, w in rows])
    fast = {r["node"]: r["label"]
            for r in graph.label_propagation(e, rounds=3).collect()}
    dist = {r["node"]: r["label"]
            for r in graph.label_propagation(e, rounds=3, driver_budget_edges=0).collect()}
    assert fast == dist


def test_pairs_native_paths_match_symmetrized(spark):
    pairs = spark.createDataFrame(
        [(1, 2, 3), (1, 3, 1), (2, 3, 5), (3, 4, 2)], ["a", "b", "weight"])
    sym = graph.symmetrize_pairs(pairs)
    pr_a = {r["node"]: r["rank"] for r in graph.pagerank(sym, iterations=4).collect()}
    pr_b = {r["node"]: r["rank"] for r in
            graph.pagerank(None, iterations=4, undirected_pairs=pairs).collect()}
    assert pr_a == pr_b
    lp_a = {r["node"]: r["label"] for r in
            graph.label_propagation(sym, rounds=3).collect()}
    lp_b = {r["node"]: r["label"] for r in
            graph.label_propagation(None, rounds=3, undirected_pairs=pairs).collect()}
    assert lp_a == lp_b


def test_degree_histogram_hand(spark):
    from commerce_data_pipeline_spark.operators.graph import degree_histogram

    # star: hub 0 with 5 leaves -> hub deg 5 (bucket 2), leaves deg 1 (bucket 0)
    pairs = spark.createDataFrame(
        [(0, i, 1) for i in range(1, 6)], "a long, b long, weight long"
    )
    out = {r["deg_bucket"]: r for r in degree_histogram(pairs).collect()}
    assert out[0]["n_nodes"] == 5 and out[0]["min_deg"] == out[0]["max_deg"] == 1
    assert out[2]["n_nodes"] == 1 and out[2]["max_deg"] == 5
    assert set(out) == {0, 2}


def test_degree_histogram_bucket_is_msb_exact(spark):
    """Exact power-of-two degrees land in their own bucket — the case a
    floating floor(log2) can get wrong (log(8)/log(2) < 3 in doubles)."""
    from commerce_data_pipeline_spark.operators.graph import degree_histogram

    # node 0 paired with 1..8 -> degree exactly 8 -> bucket 3
    pairs = spark.createDataFrame(
        [(0, i, 1) for i in range(1, 9)], "a long, b long, weight long"
    )
    out = {r["deg_bucket"]: r for r in degree_histogram(pairs).collect()}
    assert out[3]["n_nodes"] == 1 and out[3]["min_deg"] == 8


def test_personalized_pagerank_python_replay(spark):
    """3 rounds on a small weighted graph must equal a plain-Python replay
    of the integer recurrence (same div truncation, same teleport)."""
    from collections import defaultdict

    from commerce_data_pipeline_spark.operators.graph import personalized_pagerank

    pair_rows = [(1, 2, 3), (2, 3, 1), (1, 3, 2), (3, 4, 5)]
    pairs = spark.createDataFrame(pair_rows, "a long, b long, weight long")
    seeds = spark.createDataFrame([(1,), (99,)], "node long")  # 99 not in graph
    got = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(pairs, seeds, rounds=3).collect()
    }

    edges = []
    for a, b, w in pair_rows:
        edges += [(a, b, w), (b, a, w)]
    ow = defaultdict(int)
    for s, _d, w in edges:
        ow[s] += w
    S = {1}  # 99 is intersected away
    scale, tel = 10**9, 15 * 10**9 // 100
    r = {n: scale for n in S}
    for _ in range(3):
        nxt = defaultdict(int)
        for s, d, w in edges:
            if s in r:
                nxt[d] += (85 * r[s] * w) // (100 * ow[s])
        for n in S:
            nxt[n] += tel
        r = dict(nxt)
    assert got == r
    # mass never teleports to the non-graph seed
    assert 99 not in got


def test_personalized_pagerank_localized(spark):
    """Disconnected component never receives rank — PPR stays in the
    seed's component (the sparsity that makes it cheap at scale)."""
    from commerce_data_pipeline_spark.operators.graph import personalized_pagerank

    pairs = spark.createDataFrame(
        [(1, 2, 1), (10, 11, 1)], "a long, b long, weight long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r["node"] for r in personalized_pagerank(pairs, seeds, rounds=4).collect()}
    assert got <= {1, 2}
    assert 10 not in got and 11 not in got


def test_personalized_pagerank_guard_forces_shuffle_fallback(spark):
    """r7 VERDICT #4: the broadcast decision is the guard's, not the
    caller's. A dense toy graph whose node count exceeds a tiny
    max_broadcast_nodes must (a) drop the broadcast hint from the plan
    and (b) produce ranks identical to the forced-broadcast run."""
    import pytest

    from commerce_data_pipeline_spark.operators.graph import personalized_pagerank

    # K6 complete graph: 15 pairs, 6 nodes
    pair_rows = [(a, b, 1) for a in range(6) for b in range(a + 1, 6)]
    pairs = spark.createDataFrame(pair_rows, "a long, b long, weight long")
    seeds = spark.createDataFrame([(0,), (1,)], "node long")

    guarded = personalized_pagerank(
        pairs, seeds, rounds=2, max_broadcast_nodes=3
    )
    forced = personalized_pagerank(pairs, seeds, rounds=2, broadcast_frontier=True)
    # r8 ADVICE: the old post-plan BroadcastHashJoin-absence assert only
    # covered the STATIC plan — AQE is free to (and on this toy graph
    # does) convert the sort-merge join to broadcast at runtime, which
    # is fine: that's AQE's sized decision, not the operator's. The
    # property the guard owns is the HINT: over budget, the operator
    # must not force a broadcast. Assert hint absence/presence on the
    # optimized logical plans of both twins so the test stays a real
    # tripwire in both directions.
    guarded_opt = guarded._jdf.queryExecution().optimizedPlan().toString()
    forced_opt = forced._jdf.queryExecution().optimizedPlan().toString()
    assert "broadcast" not in guarded_opt.lower()
    assert "broadcast" in forced_opt.lower()
    as_map = lambda df: {r["node"]: r["rank"] for r in df.collect()}  # noqa: E731
    assert as_map(guarded) == as_map(forced)


def test_personalized_pagerank_int64_guard_raises(spark):
    """r7 ADVICE: damp_num*|S|*scale*w_max >= 2^63 must refuse up front
    (Spark would wrap silently, an ANSI oracle would error)."""
    import pytest

    from commerce_data_pipeline_spark.operators.graph import personalized_pagerank

    pairs = spark.createDataFrame([(1, 2, 10**6)], "a long, b long, weight long")
    seeds = spark.createDataFrame([(1,)], "node long")
    with pytest.raises(ValueError, match="2\\^63"):
        personalized_pagerank(pairs, seeds, rounds=1, scale=10**15)


def test_part_components_delta_query_matches_oracle(spark):
    """Pre-registration differential for a later-round window candidate:
    incremental connected components — previous labels compressed to
    star edges, re-converged with only the delta batch. The oracle is
    the from-scratch recursive-CTE closure over the FULL edge set, so a
    hash match proves the incremental path loses nothing; the audit
    numbers (previous components, star/delta edge counts) replay too."""
    import duckdb

    from commerce_data_pipeline_spark.queries.profiling_ml import (
        _O_PART_COMPONENTS_DELTA,
        _q_part_components_delta,
    )

    sf_dir = "/root/testdata/sf0.001"
    sdf = _q_part_components_delta(spark, sf_dir)
    scols = sdf.columns
    srows = sorted(tuple(r) for r in sdf.collect())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf_dir}/lineitem.parquet')"
    )
    rel = con.sql(_O_PART_COMPONENTS_DELTA)
    ocols = rel.columns
    orows = sorted(tuple(r) for r in rel.fetchall())
    assert sorted(scols) == sorted(ocols)
    perm = [scols.index(c) for c in ocols]
    assert [tuple(r[i] for i in perm) for r in srows] == orows
    # live-data sanity: the delta batch is non-trivial and the previous
    # run really had components to compress
    row = {c: v for c, v in zip(scols, srows[0])}
    assert row["n_prev_components"] > 0
    assert row["n_star_edges"] > 0
    assert row["n_delta_edges"] > 0
    assert len(srows) > 0
