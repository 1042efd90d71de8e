"""Graph analytics over relationship edges (SURVEY.md §2d extension).

The reference repo computes no graph metrics; this module adds the one
every large-scale data pipeline eventually needs — PageRank — expressed
as iterated DataFrame joins/aggregations (the connected-components family
in operators/dedup.py is the other resident graph algorithm).

Integer-exact contract (cross-engine oracle): ranks are BIGINTs at a
fixed scale. With r_0(u) = scale and out-weight ow(u) = Σ_v w(u,v),

    r_{t+1}(v) = floor(15·scale/100)
               + Σ_{u→v} (85 · r_t(u) · w(u,v)) div (100 · ow(u))

— every operation is integer multiply/floor-divide/sum, so Spark, the
driver, and a DuckDB recursive CTE replay the identical trajectory
bit-for-bit (no float mass to diverge). The per-edge floor loses < 1
rank unit per edge per iteration — deterministic rounding, not error
drift. scale=1e9 keeps the worst-case product 85·r·w far from BIGINT
overflow for realistic degree/weight distributions.

Plan shape for 100 TB:
- Each iteration is ONE equi-join (ranks ⋈ edges on src) + ONE keyed
  aggregation (groupBy dst) — both shuffles on node keys, map-side
  partial sums on the aggregate. Nothing corpus-sized is collected.
- The edge list (+ out-weights) is partitioned by src ONCE and
  localCheckpoint-ed: every iteration reuses the same co-partitioning,
  so the rank side alone shuffles per round (the dedup.py
  connected-components pattern, dedup.py:305-356).
- Rank frames are localCheckpoint-ed each round to truncate lineage —
  iterated lazy self-reference otherwise re-executes the whole prefix
  per action.
- Dangling nodes cannot occur on a symmetrized (undirected) edge list;
  `pagerank` asserts nothing about them and documents directed-graph
  callers must pre-drop or self-loop them (their mass would otherwise
  leak to the teleport term only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["pagerank", "co_occurrence_edges"]


def co_occurrence_edges(
    facts: DataFrame,
    basket_col: str,
    item_col: str,
    min_weight: int = 1,
    max_basket: int = 64,
) -> DataFrame:
    """Undirected co-occurrence edge list: (src, dst, weight) with BOTH
    directions emitted per pair, weight = number of baskets containing
    both items. Baskets come from one groupBy (collect_set, capped at
    `max_basket` items — oversize baskets are near-degenerate for
    co-occurrence and quadratic in pair fan-out; the cap keeps per-row
    expansion bounded, deterministic via sort_array truncation). The
    in-basket pair expansion is scan-side HOFs (the basket_pairs /
    LSH-bucket trick) — the fact table is scanned once, never
    self-joined."""
    baskets = (
        facts.select(F.col(basket_col).alias("_b"), F.col(item_col).alias("_i"))
        .distinct()
        .groupBy("_b")
        .agg(F.slice(F.sort_array(F.collect_set("_i")), 1, max_basket).alias("_items"))
        .filter(F.size("_items") >= 2)
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("_items"),
            lambda a, i: F.transform(
                F.slice(F.col("_items"), i + 2, F.size(F.col("_items"))),
                lambda b: F.struct(a.alias("a"), b.alias("b")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_structs).alias("_p"))
        .groupBy(F.col("_p.a").alias("a"), F.col("_p.b").alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("weight"))
        .filter(F.col("weight") >= min_weight)
    )
    fwd = pairs.select(F.col("a").alias("src"), F.col("b").alias("dst"), "weight")
    rev = pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"), "weight")
    return fwd.unionByName(rev)


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    scale: int = 10**9,
    damp_num: int = 85,
    damp_den: int = 100,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
) -> DataFrame:
    """Weighted PageRank, `iterations` fixed power-iteration rounds on
    the integer-exact contract in the module docstring. Returns
    (node, rank) — rank at `scale` (initial mass = scale per node);
    total mass is conserved up to the deterministic per-edge floors.

    Every node must have out-edges (guaranteed for symmetrized edge
    lists from `co_occurrence_edges`); nodes with no IN-edges would
    drop out of the aggregation, so the teleport term re-seeds them via
    the left join on the node set each round.
    """
    sp = edges.sparkSession
    n_shuffle = int(sp.conf.get("spark.sql.shuffle.partitions", "32"))
    e = edges.select(
        F.col(src).alias("_src"),
        F.col(dst).alias("_dst"),
        F.col(weight).cast("long").alias("_w"),
    ).repartition(n_shuffle, "_src")
    # out-weights join ONCE, outside the loop: the (edge, ow) frame is
    # loop-invariant, so re-joining it per round would redo the same
    # co-partitioned merge `iterations` times
    ew = (
        e.join(e.groupBy("_src").agg(F.sum("_w").alias("_ow")), "_src")
        .localCheckpoint()
    )
    nodes = ew.select(F.col("_src").alias("node")).distinct().localCheckpoint()
    teleport = 15 * scale // 100
    ranks = nodes.select("node", F.lit(int(scale)).cast("long").alias("rank"))
    contrib_expr = F.expr(f"({damp_num} * rank * _w) div ({damp_den} * _ow)")
    for i in range(iterations):
        contribs = (
            ew.join(ranks, ew["_src"] == ranks["node"])
            .select(F.col("_dst").alias("node"), contrib_expr.alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").alias("_in"))
        )
        # left join on the full node set: nodes with no in-edges keep
        # receiving the teleport mass instead of silently vanishing
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (F.lit(int(teleport)) + F.coalesce(F.col("_in"), F.lit(0)))
            .cast("long")
            .alias("rank"),
        )
        # truncate lineage every SECOND round: a 2-round plan is still
        # shallow, and halving the eager materializations halves the
        # per-round job overhead that dominates at modest graph sizes
        if i % 2 == 1 or i == iterations - 1:
            ranks = ranks.localCheckpoint()
    return ranks
