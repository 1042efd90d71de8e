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
