"""Keyword relevance search — BM25 scoring and top-k retrieval over the
document corpus.

The training-data use case: given a benchmark/query term set, rank corpus
documents by lexical relevance (targeted decontamination review, seed-set
expansion, retrieval-based data selection à la DSIR). The reference repo
has no search surface; this extends §2d alongside the dedup/similarity
families.

Plan shape for 100 TB:
- Document length (dl) is computed SCAN-SIDE (array size of the normalized
  split) — no aggregation pass over the corpus for lengths.
- Tokens are exploded and immediately filtered to the |Q| query terms
  map-side, so the only corpus-sized shuffle carries (doc_id, term) pairs
  for matching docs only — at most |Q| thin rows per matching document,
  never the text, never the full token stream.
- Per-term document frequencies come from the already-tiny (doc, term)
  aggregate (≤ |Q| groups) and broadcast back.
- Corpus-level scalars (N, total token count) are a single 1-row aggregate
  composed into the plan via broadcast crossJoin — no driver round-trip.
- Top-k lowers to TakeOrderedAndProject (per-partition heaps + driver
  merge of k rows), not a global sort.

Determinism contract (oracle hash-equality): per-(doc, term) scores are
computed in IEEE doubles with a FIXED expression tree — identical
association in the Spark build and the SQL oracle — then floored to e6
integers BEFORE the per-doc sum, so the document score is an
order-independent BIGINT sum (`score_e6 = Σ_t floor(1e6·idf_t·tf_sat_t)`).
The one transcendental (ln in idf) is computed on identical double operands
in both engines; a last-ulp divergence would have to land within 1e-9 of a
1e-6 floor boundary to flip an output — measure-zero in practice, and the
integer tf/df/dl columns emitted alongside pin the inputs exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import words

__all__ = ["bm25_topk", "bm25_scores", "tfidf_keywords"]


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document BM25 score against `query_terms` (docs matching at
    least one term). Columns: id, n_terms (distinct query terms matched),
    dl (token count), score_e6 (BIGINT, Σ per-term floor(1e6·score)).

    BM25 with the classic parameters: idf = ln(1 + (N - df + 0.5)/(df + 0.5))
    (Robertson-Sparck Jones, always positive), tf saturation
    tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    ws = words(text_col)
    base = docs.select(
        F.col(id_col), F.size(ws).cast("long").alias("dl"), ws.alias("_ws")
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("_n_docs"),
        F.sum("dl").cast("double").alias("_total_tokens"),
    )
    tok = base.select(
        F.col(id_col), "dl", F.explode("_ws").alias("term")
    ).filter(F.col("term").isin(list(query_terms)))
    tf = tok.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf"), F.max("dl").alias("dl")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))

    scored = (
        tf.join(F.broadcast(dfreq), on="term")
        .crossJoin(F.broadcast(stats))
        .withColumn("_avgdl", F.col("_total_tokens") / F.col("_n_docs"))
        .withColumn(
            "_idf",
            F.log(
                F.lit(1.0)
                + (F.col("_n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "_tfs",
            (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * (F.col("dl").cast("double") / F.col("_avgdl"))
                )
            ),
        )
        .withColumn(
            "term_score_e6",
            F.floor(F.col("_idf") * F.col("_tfs") * F.lit(1000000.0)).cast("long"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.max("dl").cast("long").alias("dl"),
        F.sum("term_score_e6").cast("long").alias("score_e6"),
    )


def tfidf_keywords(
    docs: DataFrame,
    group_col: str = "source",
    k: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Per-group TF-IDF keyword extraction: the k most characteristic
    terms of each document group (source/domain profiling — "what is
    this slice of the corpus about" — the standard corpus-audit view).

    tf = term occurrences within the group; df = number of groups
    containing the term; idf = ln((1+N)/(1+df)) + 1 (sklearn's smooth
    idf, always positive); score_e6 = floor(1e6·tf·idf) BIGINT.

    Plan shape for 100 TB: the ONLY corpus-sized shuffle is the
    (group, term) count aggregation, which combines map-side; df/N
    derive from that already-aggregated frame (≤ groups·terms rows) via
    a term-keyed agg broadcast back, N composes as a broadcast 1-row
    aggregate; the per-group top-k window runs over aggregated rows
    only. Total order inside each group: (score_e6 desc, term asc).

    Columns: group, term, tf, df, score_e6, rank (1..k).
    """
    from pyspark.sql import Window

    tok = docs.select(
        F.col(group_col).alias("grp"), F.explode(words(text_col)).alias("term")
    )
    tf = tok.groupBy("grp", "term").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n_groups = tf.select("grp").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("_n_groups")
    )
    scored = (
        tf.join(F.broadcast(dfreq), on="term")
        .crossJoin(F.broadcast(n_groups))
        .withColumn(
            "score_e6",
            F.floor(
                F.col("tf").cast("double")
                * (
                    F.log(
                        (F.lit(1.0) + F.col("_n_groups"))
                        / (F.lit(1.0) + F.col("df").cast("double"))
                    )
                    + F.lit(1.0)
                )
                * F.lit(1000000.0)
            ).cast("long"),
        )
    )
    w = Window.partitionBy("grp").orderBy(F.desc("score_e6"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("grp").alias(group_col), "term", "tf", "df", "score_e6", "rank")
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 25,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by BM25 score; total order (score_e6 desc, id asc)
    so the cut is deterministic. orderBy+limit lowers to the distributed
    TakeOrderedAndProject — no global sort materializes."""
    scores = bm25_scores(docs, query_terms, k1=k1, b=b, id_col=id_col, text_col=text_col)
    return (
        scores.orderBy(F.desc("score_e6"), F.asc(id_col))
        .limit(k)
        .select(
            F.col(id_col),
            "n_terms",
            "dl",
            "score_e6",
        )
    )
