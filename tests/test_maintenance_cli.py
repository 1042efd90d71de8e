"""Maintenance CLI (r13): the offline index/ledger passes as an
operational entrypoint — each subcommand drives the REAL operator on a
tmp layout and prints one JSON object."""
from __future__ import annotations

import json

from pyspark.sql import functions as F

from commerce_data_pipeline_spark import maintenance
from commerce_data_pipeline_spark.operators import index as I


def _vecs(spark, n=60, dim=8):
    rows = [
        (i, [float((i * 7 + j * 3) % 11 - 5) or 1.0 for j in range(dim)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _run(argv, capsys) -> tuple[int, dict]:
    rc = maintenance.main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


def test_index_compact_cmd(spark, tmp_path, capsys):
    emb = _vecs(spark)
    path = f"file://{tmp_path}/ivf"
    I.build_ivf_index(emb, path, n_centroids=4)
    I.delete_from_ivf_index(emb.filter(F.col("vec_id") % 5 == 0), path)
    rc, out = _run(["index-compact", "--path", path], capsys)
    assert rc == 0 and out["ok"]
    assert I._read_tombstones(spark, path) is None


def test_index_rebalance_with_recall_gate(spark, tmp_path, capsys):
    # audit corpus layout: <dir>/embeddings.parquet with vec_id/embedding
    emb = _vecs(spark, n=60)
    sf = tmp_path / "sf"
    sf.mkdir()
    emb.write.parquet(f"file://{sf}/embeddings.parquet")
    path = f"file://{tmp_path}/ivf"
    I.build_ivf_index(emb, path, n_centroids=2)
    rc, out = _run(
        ["index-rebalance", "--path", path, "--max-list-size", "20",
         "--audit-sf-dir", str(sf), "--n-probe", "2",
         "--max-recall-drop-e6", "1000000"],
        capsys,
    )
    assert out["split_centroids"] == [0, 1]
    assert out["recall_pre"]["n_queries"] > 0
    assert out["recall_post"]["n_probe"] == 2
    # routing doubled (2 -> 4): the CLI reports the scaled serving n_probe
    assert out["recommended_n_probe"] == 4
    assert rc == 0 and out["ok"]  # generous gate: cannot trip

    # a zero-tolerance gate trips iff recall actually dropped; either
    # way the report carries both sides of the delta
    path2 = f"file://{tmp_path}/ivf2"
    I.build_ivf_index(emb, path2, n_centroids=2)
    rc2, out2 = _run(
        ["index-rebalance", "--path", path2, "--max-list-size", "20",
         "--audit-sf-dir", str(sf), "--n-probe", "1",
         "--max-recall-drop-e6", "0"],
        capsys,
    )
    dropped = (
        out2["recall_pre"]["mean_recall_e6"]
        > out2["recall_post"]["mean_recall_e6"]
    )
    assert rc2 == (1 if dropped else 0)
    assert out2["ok"] == (not dropped)
    if dropped:
        # the library gate's message (the CLI delegates to
        # rebalance_with_gate — one gate implementation, r14 review);
        # the veto ROLLS BACK (r15): the CLI reports it and the index
        # still serves the pre-split 2-centroid routing
        assert "ROLLED BACK" in out2["recall_gate"]
        assert out2["rolled_back"] is True
        assert out2["split_centroids"] == [0, 1]
        assert spark.read.parquet(f"{path2}/centroids").count() == 2
    else:
        # admitted: the deferred cleanup committed (no rename-aside left)
        from commerce_data_pipeline_spark.sources.hadoopfs import HadoopFS

        assert not HadoopFS(spark, path2).exists(
            f"{path2}/centroids._rebal_old"
        )


def test_ledger_compact_cmds(spark, tmp_path, capsys):
    from commerce_data_pipeline_spark.sources.ledger import (
        BandLedger,
        FingerprintLedger,
    )

    docs = spark.createDataFrame(
        [(i, f"doc number {i} body") for i in range(20)],
        "doc_id long, text string",
    )
    fp = str(tmp_path / "fp")
    FingerprintLedger(spark, fp).ingest(docs)
    rc, out = _run(["ledger-compact", "--path", fp, "--kind", "fingerprint"], capsys)
    assert rc == 0 and out["ok"]
    assert FingerprintLedger(spark, fp).known().count() == 20

    band = str(tmp_path / "band")
    BandLedger(spark, band, shingle_n=2).commit(docs)
    BandLedger(spark, band, shingle_n=2).commit(docs)  # replayed run
    rc, out = _run(
        ["ledger-compact", "--path", band, "--kind", "band",
         "--max-ids-per-key", "3"],
        capsys,
    )
    assert rc == 0 and out["ok"]
    k = BandLedger(spark, band, shingle_n=2).known()
    assert k.count() == k.distinct().count()


def test_gate_ledger_compact_cmd(spark, tmp_path, capsys):
    from commerce_data_pipeline_spark.sources.ledger import QualityGateLedger

    gate = str(tmp_path / "gate")
    led = QualityGateLedger(spark, gate, n_bins=10)
    df = spark.createDataFrame(
        [(i, i % 2, (i * 131) % 1_000_001) for i in range(100)],
        "id long, label int, conf long",
    )
    led.ingest(df, "label", "conf")
    led.ingest(df, "label", "conf")
    before = led.report().collect()[0].asDict()
    rc, out = _run(
        ["ledger-compact", "--path", gate, "--kind", "gate", "--n-bins", "10"],
        capsys,
    )
    assert rc == 0 and out["ok"]
    assert led.report().collect()[0].asDict() == before


def test_index_recover_cmd(spark, tmp_path, capsys):
    """r16: the executable form of check_no_pending_swap's guidance.
    Covers all three detected states — clean (sweep-only no-op),
    deferred-window rollback (bit-identical pre-split serving),
    deferred-window commit (retired lists swept), mid-swap rollback,
    and the one refusal (commit with no promoted routing)."""
    from commerce_data_pipeline_spark.sources.hadoopfs import HadoopFS

    emb = _vecs(spark, n=60)

    # clean state: nothing pending, sweep finds nothing
    path0 = f"file://{tmp_path}/ivf0"
    I.build_ivf_index(emb, path0, n_centroids=2)
    rc, out = _run(["index-recover", "--path", path0, "--action", "rollback"], capsys)
    assert rc == 0 and out["ok"]
    assert out["state"] == "clean" and out["action"] == "none"
    assert out["swept"] == []

    # deferred-window crash -> rollback: pre-split serving restored
    path1 = f"file://{tmp_path}/ivf1"
    I.build_ivf_index(emb, path1, n_centroids=2)
    q = emb.filter(F.col("vec_id") % 10 == 0)
    pre = sorted(
        tuple(r) for r in I.ivf_query(spark, path1, q, k=5, n_probe=2).collect()
    )
    retired = I.rebalance_ivf_index(
        spark, path1, max_list_size=20, _defer_cleanup=True
    )
    rc, out = _run(["index-recover", "--path", path1, "--action", "rollback"], capsys)
    assert rc == 0 and out["ok"] and out["state"] == "deferred_window"
    assert out["swept"]  # the demoted sub-lists
    assert all(s not in retired for s in out["swept"])
    post = sorted(
        tuple(r) for r in I.ivf_query(spark, path1, q, k=5, n_probe=2).collect()
    )
    assert post == pre
    assert spark.read.parquet(f"{path1}/centroids").count() == 2

    # deferred-window crash -> commit: retired lists swept, split serves
    path2 = f"file://{tmp_path}/ivf2"
    I.build_ivf_index(emb, path2, n_centroids=2)
    retired2 = I.rebalance_ivf_index(
        spark, path2, max_list_size=20, _defer_cleanup=True
    )
    rc, out = _run(["index-recover", "--path", path2, "--action", "commit"], capsys)
    assert rc == 0 and out["ok"] and out["state"] == "deferred_window"
    assert out["swept"] == retired2
    fs2 = HadoopFS(spark, path2)
    assert not fs2.exists(f"{path2}/centroids._rebal_old")
    assert spark.read.parquet(f"{path2}/centroids").count() == 4
    # recovered index is not wedged: a routine pass runs clean
    assert I.rebalance_ivf_index(spark, path2, max_list_size=10_000) == []

    # mid-swap crash (no live table): commit refused, rollback restores
    path3 = f"file://{tmp_path}/ivf3"
    I.build_ivf_index(emb, path3, n_centroids=2)
    fs3 = HadoopFS(spark, path3)
    assert fs3.rename(f"{path3}/centroids", f"{path3}/centroids._rebal_old")
    rc, out = _run(["index-recover", "--path", path3, "--action", "commit"], capsys)
    assert rc == 1 and not out["ok"]
    assert "rollback" in out["error"]
    rc, out = _run(["index-recover", "--path", path3, "--action", "rollback"], capsys)
    assert rc == 0 and out["ok"] and out["state"] == "mid_swap"
    assert spark.read.parquet(f"{path3}/centroids").count() == 2
