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
