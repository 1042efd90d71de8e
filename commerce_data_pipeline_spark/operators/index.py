"""Persisted ANN indexes (SURVEY.md §2d X3 — the production shape).

`ivf_topk` rebuilds its centroid sample and inverted file on every call;
that is the right shape for one-off queries, but a 100 TB corpus is
indexed ONCE and probed millions of times. This module splits the two
phases at a storage boundary:

- `build_ivf_index(corpus, path)` materializes the inverted file as
  parquet PARTITIONED BY centroid_id, plus the (tiny) centroid table.
  Partitioning by list id means a probe of `n_probe` centroids reads
  exactly those directories — partition pruning does the inverted-file
  "seek", no full-index scan.
- `ivf_query(spark, path, queries)` loads the index and runs the same
  probe/score plan as the inline operator (`similarity.ivf_probe_score`
  — literally the same code), so results are bit-identical to
  `ivf_topk` on the same corpus.

The index is storage-format-stable: unit vectors are float64 arrays, so
a parquet roundtrip is exact and index-vs-inline equality is testable
bit-for-bit (pinned in tests/test_similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from commerce_data_pipeline_spark.operators.similarity import (
    ivf_centroids,
    ivf_invert,
    ivf_probe_score,
    require_centroids,
    with_unit_vector,
)
from commerce_data_pipeline_spark.sources.hadoopfs import HadoopFS, join_path


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    corpus_count: int | None = None,
    quantize: bool = False,
) -> None:
    """Materialize the IVF index under `path` (any Hadoop-FS scheme):
    `inverted/` (partitioned by centroid_id) + `centroids/`.

    `quantize=True` stores the inverted lists as int8 codes + per-vector
    scale instead of float64 unit vectors — 8× fewer list bytes, which at
    100 TB is the difference between an index that fits hot storage and
    one that doesn't. Probes reconstruct x ≈ q·scale on read (scan-side
    transform); results become approximate within quantization error
    (recall pinned in tests), while the centroid table — tiny — always
    stays exact."""
    u = with_unit_vector(corpus, vec_col, "unit")
    total = corpus_count if corpus_count is not None else corpus.count()
    step = max(1, total // n_centroids)
    centroids = require_centroids(ivf_centroids(u, step, n_centroids, id_col), id_col)
    inverted = ivf_invert(u, centroids, id_col)
    if quantize:
        v = F.col("c_unit")
        raw = F.array_max(F.transform(v, F.abs)) / F.lit(127.0)
        sc = F.when(raw == 0.0, F.lit(1.0)).otherwise(raw)
        inverted = inverted.select(
            "neighbor_id",
            "centroid_id",
            sc.alias("scale"),
            F.transform(v, lambda x: F.floor(x / sc + F.lit(0.5)).cast("int")).alias("qvec"),
        )
    (
        inverted.repartition("centroid_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(join_path(path, "inverted"))
    )
    centroids.write.mode("overwrite").parquet(join_path(path, "centroids"))


def append_to_ivf_index(
    corpus_new: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incrementally index NEW vectors against the EXISTING centroids:
    assign each to its nearest centroid (broadcast argmax, the same
    `ivf_invert` code as the build) and append to the partitioned
    inverted file — only the touched centroid_id partitions gain files,
    nothing is rewritten. This is how a live corpus grows its ANN index
    between periodic rebuilds; recall degrades only as the data
    distribution drifts from the centroid sample, so rebuild cadence is
    a drift question, not a correctness one. Queries need no change:
    `ivf_query` reads whatever the partitions contain."""
    spark = corpus_new.sparkSession
    centroids = spark.read.parquet(join_path(path, "centroids"))
    u = with_unit_vector(corpus_new, vec_col, "unit")
    inverted_new = ivf_invert(u, centroids, id_col)
    (
        inverted_new.repartition("centroid_id")
        .write.mode("append")
        .partitionBy("centroid_id")
        .parquet(join_path(path, "inverted"))
    )


def index_exists(spark: SparkSession, path: str) -> bool:
    """Complete-index probe: the centroid table's _SUCCESS marker (written
    last) plus at least one inverted-list partition directory. A dynamic
    partition overwrite commits per-partition and leaves no root-level
    _SUCCESS under inverted/, so that marker can't be the check there."""
    fs = HadoopFS(spark, path)
    if not fs.exists(join_path(path, "centroids", "_SUCCESS")):
        return False
    return any(
        n.startswith("centroid_id=") for n in fs.listdir(join_path(path, "inverted"))
    )


def ivf_query(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
) -> DataFrame:
    """Probe a persisted IVF index. The centroid_id equi-join against the
    partitioned inverted file prunes to the probed lists' directories —
    check `.explain` for the partition filter on centroid_id."""
    inverted = spark.read.parquet(join_path(path, "inverted"))
    if "qvec" in inverted.columns:  # quantized lists: reconstruct on read
        inverted = inverted.select(
            "neighbor_id",
            "centroid_id",
            F.transform(F.col("qvec"), lambda q: q.cast("double") * F.col("scale"))
            .alias("c_unit"),
        )
    centroids = spark.read.parquet(join_path(path, "centroids"))
    return ivf_probe_score(inverted, centroids, queries, k, n_probe, vec_col, query_id_col)
