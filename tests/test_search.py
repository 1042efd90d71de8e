"""BM25 search (operators/search.py).

Pins ranking semantics on a hand corpus: term-frequency saturation, idf
(rare terms outweigh common ones), length normalization, and the
deterministic (score_e6 desc, doc_id asc) cut; plus plan shape (top-k
lowers to TakeOrderedAndProject, per-term stats broadcast).
"""

import pytest

from commerce_data_pipeline_spark.operators import search


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def corpus(spark):
    return _docs(
        spark,
        [
            (1, "rare common filler filler"),
            (2, "rare rare common filler"),
            (3, "common filler filler filler"),
            (4, "rare common filler filler filler filler filler filler"),
            (5, "filler only text here"),
        ],
    )


def test_scores_and_matching(spark, corpus):
    out = {
        r["doc_id"]: r
        for r in search.bm25_scores(corpus, ["rare", "common"]).collect()
    }
    # doc 5 matches nothing → absent
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["n_terms"] == 2 and out[3]["n_terms"] == 1
    # tf: doc2 has 'rare' twice vs doc1 once, same dl → strictly higher
    assert out[2]["score_e6"] > out[1]["score_e6"]
    # length normalization: doc4 = doc1's terms in a 2x longer doc → lower
    assert out[4]["score_e6"] < out[1]["score_e6"]
    # idf: 'rare' (df=3) must contribute more than 'common' (df=4) at tf=1:
    # doc1 (rare+common) > doc3 (common only) by more than 2x
    assert out[1]["score_e6"] > 2 * out[3]["score_e6"]


def test_topk_cut_is_deterministic(spark, corpus):
    top2 = search.bm25_topk(corpus, ["rare", "common"], k=2).collect()
    assert [r["doc_id"] for r in top2] == sorted(
        [r["doc_id"] for r in top2],
        key=lambda d: next(-r["score_e6"] for r in top2 if r["doc_id"] == d),
    )
    full = search.bm25_scores(corpus, ["rare", "common"]).collect()
    best = sorted(full, key=lambda r: (-r["score_e6"], r["doc_id"]))[:2]
    assert [r["doc_id"] for r in top2] == [r["doc_id"] for r in best]


def test_empty_query_raises(spark, corpus):
    with pytest.raises(ValueError, match="non-empty"):
        search.bm25_scores(corpus, [])


def test_topk_plan_shape(spark, corpus):
    plan = (
        search.bm25_topk(corpus, ["rare"], k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # distributed top-k, not a global sort
    assert "TakeOrderedAndProject" in plan
    # df + corpus scalars join back as broadcasts, never shuffled joins
    assert "SortMergeJoin" not in plan


@pytest.fixture(scope="module")
def emb5(spark):
    # vec 0 = query; 1-2 near the query, 3 orthogonal, 4 zero-norm, 9 has
    # no document twin (tests the full-outer side)
    from pyspark.sql import Row

    vecs = {0: [1.0, 0.0], 1: [0.9, 0.1], 2: [0.8, 0.2], 3: [0.0, 1.0],
            4: [0.0, 0.0], 9: [1.0, 0.1]}
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=v) for i, v in vecs.items()]
    )


def test_hybrid_rrf_fuses_both_lists(spark, corpus, emb5):
    out = {r["doc_id"]: r for r in search.hybrid_rrf(
        corpus, emb5, ["rare", "common"], query_id=0, pool=3, k=10
    ).collect()}
    # doc 9: semantic-only (no keyword match) — kw side NULL, contributes 0
    assert out[9]["kw_rank"] is None and out[9]["sem_rank"] is not None
    assert out[9]["rrf_score"] == 1000000000 // (60 + out[9]["sem_rank"])
    # doc 5 matches neither list; doc 3 is outside both pool-3 cuts;
    # the query vec 0 never appears; zero-norm vec 4 is excluded from
    # the semantic list (doc 4 enters on keywords alone)
    assert 5 not in out and 3 not in out and 0 not in out
    assert out[4]["kw_rank"] == 3 and out[4]["sem_rank"] is None
    # a doc in both lists sums both reciprocal contributions
    both = [r for r in out.values() if r["kw_rank"] and r["sem_rank"]]
    assert both
    for r in both:
        assert r["rrf_score"] == (
            1000000000 // (60 + r["kw_rank"]) + 1000000000 // (60 + r["sem_rank"])
        )


def test_hybrid_rrf_rank_order_and_determinism(spark, corpus, emb5):
    rows = search.hybrid_rrf(corpus, emb5, ["rare"], query_id=0, pool=5, k=10)
    a = [tuple(r) for r in rows.collect()]
    b = [tuple(r) for r in rows.collect()]
    assert a == b
    scores = [r[-1] for r in a]
    assert scores == sorted(scores, reverse=True)


def test_persisted_text_index_matches_inline(spark, tmp_path):
    from commerce_data_pipeline_spark.operators.search import (
        bm25_query_index, bm25_topk, build_text_index,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["spark dedup engine", "vector search spark", "dup dup dup",
             "nothing relevant here", "spark spark vector dup"])],
        ["doc_id", "text"],
    )
    terms = ["dup", "vector", "spark"]
    inline = bm25_topk(docs, terms, k=5).collect()
    path = f"file://{tmp_path}/tidx"
    build_text_index(docs, path)
    indexed = bm25_query_index(spark, path, terms, k=5).collect()
    key = lambda r: r["doc_id"]
    assert sorted(map(tuple, inline), key=lambda t: t[0]) == sorted(
        map(tuple, indexed), key=lambda t: t[0]
    )
    # the postings layout is one directory per term bucket
    import os

    names = os.listdir(tmp_path / "tidx" / "postings")
    assert any(n.startswith("term_bucket=") for n in names)


def test_ndcg_hand_computed(spark):
    """4-doc corpus, one 2-term query: replicate the whole NDCG@k pipeline
    by hand — BM25 pool order, graded relevance, literal discount weights."""
    import math

    from commerce_data_pipeline_spark.operators.search import ndcg_at_k, ndcg_weights

    docs = spark.createDataFrame(
        [
            (0, "alpha beta alpha"),   # matches both terms, tf(alpha)=2
            (1, "alpha gamma gamma"),  # matches alpha only
            (2, "beta beta beta"),     # matches beta only
            (3, "gamma gamma gamma"),  # matches nothing -> not retrieved
        ],
        ["doc_id", "text"],
    )
    out = ndcg_at_k(docs, [(7, ["alpha", "beta"])], k=2, pool=3).collect()
    assert len(out) == 1
    row = out[0]
    assert row["query_id"] == 7 and row["n_pool"] == 3
    # doc 0 matches 2 distinct terms and has the highest score -> rank 1,
    # and is also ideal rank 1; docs 1/2 have rel=1. DCG@2 uses ranks 1-2.
    w = ndcg_weights(2)
    # pool order = (score desc, id asc); doc0 first. Ideal = (rel desc, id asc)
    # -> same first element, so ndcg < 1e6 only if pool rank 2 != ideal rank 2
    # rel values at ranks 1,2 of both orders are (2, 1) regardless of which
    # of docs 1/2 is second (both rel=1), so NDCG == 1.0 exactly.
    assert row["ndcg_e6"] == 1_000_000
    dcg = 2 * w[0] + 1 * w[1]
    assert row["dcg_e6"] == math.floor(
        (__import__("decimal").Decimal(2 * w[0]).quantize(__import__("decimal").Decimal("1e-12"))
         + __import__("decimal").Decimal(1 * w[1]).quantize(__import__("decimal").Decimal("1e-12")))
        * 10**6
    )
    assert abs(row["dcg_e6"] - math.floor(dcg * 1e6)) <= 1


def test_ndcg_detects_imperfect_ranking(spark):
    """A doc with many repeats of one term can out-score a two-term doc
    (tf saturation notwithstanding) — then pool order != ideal order and
    NDCG@k drops strictly below 1."""
    from commerce_data_pipeline_spark.operators.search import ndcg_at_k

    docs = spark.createDataFrame(
        [
            (0, "rare rare rare rare rare rare rare rare"),  # huge tf, rel=1
            (1, "rare common pad pad pad pad pad pad"),      # rel=2
            (2, "common pad pad pad pad pad pad pad"),       # rel=1
            (3, "pad pad"),
            (4, "common common pad pad pad pad pad pad"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["query_id"]: r for r in ndcg_at_k(
        docs, [(1, ["rare", "common"])], k=3, pool=4
    ).collect()}
    r = rows[1]
    # 'rare' is rarer (df=2 vs df=3) so doc 0's 8x tf gives it rank 1 with
    # rel=1 while the ideal ranking puts rel=2 doc 1 first -> NDCG < 1
    assert r["n_pool"] == 4
    assert 0 < r["ndcg_e6"] < 1_000_000


def test_ndcg_validates_args(spark):
    from commerce_data_pipeline_spark.operators.search import ndcg_at_k

    docs = spark.createDataFrame([(0, "a")], ["doc_id", "text"])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ndcg_at_k(docs, [])
    with _pytest.raises(ValueError):
        ndcg_at_k(docs, [(1, ["a"])], k=10, pool=5)
