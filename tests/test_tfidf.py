"""Unit tests for TF-IDF keyword extraction (operators/search.py)."""

import math

from pyspark.sql import Row

from commerce_data_pipeline_spark.operators import search as S


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, source=s, text=t) for i, (s, t) in enumerate(rows)])


def test_tfidf_ranks_group_specific_terms_first(spark):
    df = _docs(
        spark,
        [
            ("a", "common shark shark shark"),
            ("a", "common shark"),
            ("b", "common whale whale"),
            ("b", "common whale whale whale"),
        ],
    )
    out = S.tfidf_keywords(df, group_col="source", k=2).collect()
    top = {r["source"]: r["term"] for r in out if r["rank"] == 1}
    # the group-exclusive term beats the shared one despite equal tf
    assert top == {"a": "shark", "b": "whale"}


def test_tfidf_score_formula(spark):
    df = _docs(spark, [("a", "x x y"), ("b", "y z")])
    out = {(r["source"], r["term"]): r for r in S.tfidf_keywords(df, k=5).collect()}
    # N=2 groups; x: tf=2 df=1; y appears in both: df=2
    r = out[("a", "x")]
    assert r["tf"] == 2 and r["df"] == 1
    assert r["score_e6"] == math.floor(2.0 * (math.log((1.0 + 2.0) / (1.0 + 1.0)) + 1.0) * 1e6)
    assert out[("a", "y")]["df"] == 2


def test_tfidf_k_cut_and_rank_order(spark):
    df = _docs(spark, [("a", "p q r s t u v w")])
    out = S.tfidf_keywords(df, k=3).collect()
    assert len(out) == 3
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2, 3]
    # equal scores tie-break on term asc
    terms = [r["term"] for r in sorted(out, key=lambda r: r["rank"])]
    assert terms == sorted(terms)
