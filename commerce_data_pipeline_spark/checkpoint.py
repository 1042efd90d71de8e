"""Durability-selectable lineage truncation (r12 VERDICT #4).

Every iterative operator in this package (connected-components rounds in
`operators/dedup.py`, PageRank/LPA/k-core/walk loops in
`operators/graph.py`, the BPE training loop in `operators/text.py`, the
multi-consumer staging frames elsewhere) truncates lineage between
rounds so plans stay bounded. On local runs — and on any fleet with
stable executors — executor-local checkpoint blocks
(`DataFrame.localCheckpoint`) are the right trade: no distributed-FS
write, blocks live exactly as long as the job.

On a preemptible/spot fleet that trade inverts: a lost executor
invalidates a locally-checkpointed RDD with NO recomputation path (the
lineage was truncated), failing the job mid-iteration. There the job
must pay the distributed-FS write and use reliable checkpoints
(`DataFrame.checkpoint` + `sc.setCheckpointDir`).

CLUSTER.md used to tell that operator to *edit the source* — 66 call
sites. This module makes it one session conf, honored by every
checkpoint site in the package:

    spark.commerce.checkpoint.mode = local (default) | reliable
    spark.commerce.checkpoint.dir  = <fs path>   (reliable mode only;
        applied via sc.setCheckpointDir on first use if none is set)

Reliable-mode CLEANUP (r13 ADVICE): every iteration of an iterative
operator (PageRank/LPA/k-core rounds, CC alternation, BPE merges) writes
one reliable checkpoint, and Spark never deletes them unless
`spark.cleaner.referenceTracking.cleanCheckpoints=true` — without it a
long job on the preemptible fleet this mode targets accumulates one full
copy of intermediate state per round in the checkpoint dir. Set that
cleaner conf alongside the mode conf (and still expect to sweep the dir
after abnormal exits: the cleaner only fires when the RDD is GC'd on the
driver). CLUSTER.md "Checkpoint durability" carries the deployment note.

Call sites use the chained form ``df.transform(checkpoint)`` /
``df.transform(checkpoint, eager=False)`` — identical semantics to the
``df.localCheckpoint(...)`` they replace when the mode conf is unset.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

MODE_CONF = "spark.commerce.checkpoint.mode"
DIR_CONF = "spark.commerce.checkpoint.dir"


def checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate `df`'s lineage with the session-selected durability.

    local (default): executor-local blocks — fast, not preemption-safe.
    reliable: writes to the sc checkpoint dir — survives executor loss.
    """
    spark = df.sparkSession
    try:
        mode = spark.conf.get(MODE_CONF, "local") or "local"
    except Exception:  # pragma: no cover - defensive: conf layer unavailable
        mode = "local"
    if mode == "local":
        return df.localCheckpoint(eager=eager)
    if mode != "reliable":
        raise ValueError(
            f"{MODE_CONF} must be 'local' or 'reliable', got {mode!r}"
        )
    sc = spark.sparkContext
    if sc.getCheckpointDir() is None:
        ckpt_dir = spark.conf.get(DIR_CONF, None)
        if not ckpt_dir:
            raise ValueError(
                f"{MODE_CONF}=reliable requires sc.setCheckpointDir(...) "
                f"or {DIR_CONF} to be set"
            )
        sc.setCheckpointDir(ckpt_dir)
    return df.checkpoint(eager=eager)
