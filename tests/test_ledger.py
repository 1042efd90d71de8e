"""Cross-run incremental dedup ledger tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from commerce_data_pipeline_spark.sources.ledger import FingerprintLedger


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_first_batch_admits_all_unique(spark, tmp_path):
    led = FingerprintLedger(spark, str(tmp_path / "ledger"))
    assert not led.exists()
    batch = _docs(spark, [(0, "alpha"), (1, "beta"), (2, "alpha")])  # 2 intra-dup
    admitted = led.ingest(batch)
    assert sorted(r["doc_id"] for r in admitted.collect()) == [0, 1]  # min id wins
    assert led.exists()
    assert led.known().count() == 2


def test_second_batch_admits_only_unseen(spark, tmp_path):
    led = FingerprintLedger(spark, str(tmp_path / "ledger"))
    led.ingest(_docs(spark, [(0, "alpha"), (1, "beta")]))
    admitted = led.ingest(_docs(spark, [(10, "beta"), (11, "gamma"), (12, "GAMMA ")]))
    # beta known; gamma and "GAMMA " normalize to the same content → one row
    assert [r["doc_id"] for r in admitted.collect()] == [11]
    assert led.known().count() == 3


def test_reingest_is_idempotent(spark, tmp_path):
    led = FingerprintLedger(spark, str(tmp_path / "ledger"))
    batch = _docs(spark, [(0, "alpha"), (1, "beta")])
    led.ingest(batch)
    again = led.ingest(batch)
    assert again.count() == 0
    assert led.known().count() == 2


def test_ledger_prefix_partitioned_digest_only(spark, tmp_path):
    led = FingerprintLedger(spark, str(tmp_path / "ledger"))
    led.ingest(_docs(spark, [(i, f"text number {i}") for i in range(20)]))
    stored = spark.read.parquet(str(tmp_path / "ledger"))
    # only the digest (+ partition column) persists — never text
    assert set(stored.columns) == {"fp", "fp_prefix"}
    names = {p.name for p in (tmp_path / "ledger").iterdir() if p.is_dir()}
    assert names and all(n.startswith("fp_prefix=") for n in names)
    # prefix really is the fp prefix
    r = stored.limit(1).collect()[0]
    assert r["fp"].startswith(r["fp_prefix"])


def test_band_ledger_cross_run_near_dup(spark, tmp_path):
    from commerce_data_pipeline_spark.sources.ledger import BandLedger

    led = BandLedger(spark, str(tmp_path / "bands"), num_hashes=16, bands=4, shingle_n=2)
    run1 = _docs(spark, [
        (0, "the quick brown fox jumps over the lazy dog by the river"),
        (1, "an entirely different document about spark physical plans"),
    ])
    admitted1 = led.ingest(run1)
    assert {r["doc_id"] for r in admitted1.collect()} == {0, 1}

    run2 = _docs(spark, [
        (10, "the quick brown fox jumps over the lazy dog by the river"),  # dup of 0
        (11, "fresh unseen content about winnowing and fingerprints today"),
    ])
    matches = led.match_history(run2).collect()
    assert {(r["new_id"], r["old_id"]) for r in matches} == {(10, 0)}
    admitted2 = led.ingest(run2)
    assert {r["doc_id"] for r in admitted2.collect()} == {11}
    # history now carries band rows for 0, 1, 11 (bands x 3 docs)
    assert led.known().count() == 4 * 3


def test_band_ledger_stores_no_text(spark, tmp_path):
    from commerce_data_pipeline_spark.sources.ledger import BandLedger

    led = BandLedger(spark, str(tmp_path / "bands"))
    led.ingest(_docs(spark, [(0, "some document body here with words")]))
    stored = spark.read.parquet(str(tmp_path / "bands"))
    assert set(stored.columns) == {"doc_id", "band", "bkey", "bkey_prefix"}


def test_band_ledger_history_10x_one_join_no_reminhash(spark, tmp_path):
    """Scale contract: with ledger history 10x a batch, the next run's
    match is ONE equi-join against a digest-only parquet scan — history
    is never re-minhashed (it can't be: the ledger stores no text), and
    the plan reads exactly one history scan with only (band, bkey,
    doc_id)."""
    from commerce_data_pipeline_spark.sources.ledger import BandLedger

    path = str(tmp_path / "bands")
    led = BandLedger(spark, path, num_hashes=16, bands=4, shingle_n=2)
    history = _docs(
        spark,
        [(i, f"historical document number {i} with distinct content body") for i in range(100)],
    )
    led.ingest(history)
    assert led.known().count() == 4 * 100

    batch = _docs(
        spark,
        [(1000 + j, f"historical document number {j} with distinct content body") for j in range(5)]
        + [(2000 + j, f"brand new never seen content item {j} for this run") for j in range(5)],
    )
    # history rows = 400, batch band rows = 40 → 10x
    matched = led.match_history(batch)
    # inspect the physical plan TREE (pre-AQE sparkPlan: real children, no
    # query-stage wrappers), not its rendered string — node classes and
    # scan root paths are stable across Spark versions, whereas substring
    # checks break on renderer changes and can match incidental tmp-path
    # contents (e.g. any path containing "bands").
    nodes = []
    stack = [matched._jdf.queryExecution().sparkPlan()]
    while stack:
        n = stack.pop()
        nodes.append(n)
        children = n.children()
        for i in range(children.size()):
            stack.append(children.apply(i))

    def _is_scan(n):
        return n.getClass().getSimpleName() == "FileSourceScanExec"

    def _root_paths(n):
        rp = n.relation().location().rootPaths()
        return [rp.apply(i).toString() for i in range(rp.size())]

    # exactly one scan of the ledger path (history read once, one equi-join)
    ledger_scans = [
        n for n in nodes if _is_scan(n) and any(path in p for p in _root_paths(n))
    ]
    assert len(ledger_scans) == 1, [n.nodeName() for n in nodes]
    # the history scan reads digests only — no text column exists to re-minhash
    read_cols = list(ledger_scans[0].schema().fieldNames())
    assert "text" not in read_cols, read_cols
    # one join in the whole plan
    joins = [
        n for n in nodes
        if n.getClass().getSimpleName()
        in ("SortMergeJoinExec", "ShuffledHashJoinExec", "BroadcastHashJoinExec")
    ]
    assert len(joins) == 1, [n.nodeName() for n in nodes]
    # and the answer is right: every exact-copy doc matches its original
    # (near-identical history texts legitimately add more candidates — the
    # 1000-range docs differ from most of history by one token, which word
    # 2-shingle minhash treats as near-dup; the contract here is recall of
    # the true copies and zero matches for genuinely fresh content)
    got = {(r["new_id"], r["old_id"]) for r in matched.collect()}
    assert got >= {(1000 + j, j) for j in range(5)}
    assert all(new_id < 2000 for new_id, _ in got)

    admitted = led.filter_unmatched(batch)
    assert {r["doc_id"] for r in admitted.collect()} == {2000 + j for j in range(5)}


def _qrows(seed, k=60):
    return [(((i * seed) % 7) < 3, ((i * 131071 + seed) % 1_000_001)) for i in range(k)]


def test_quality_gate_ledger_merge_parity(spark, tmp_path):
    """The mergeability contract: ingesting two batches separately and
    reporting over the merged bins is BIT-IDENTICAL to one ledger fed
    the concatenated batch — bin aggregates are sums of sums."""
    from commerce_data_pipeline_spark.sources.ledger import QualityGateLedger

    a, b = _qrows(3), _qrows(11)
    two = QualityGateLedger(spark, str(tmp_path / "two"), n_bins=20)
    two.ingest(spark.createDataFrame(a, ["label", "conf"]), "label", "conf")
    two.ingest(spark.createDataFrame(b, ["label", "conf"]), "label", "conf")
    one = QualityGateLedger(spark, str(tmp_path / "one"), n_bins=20)
    one.ingest(spark.createDataFrame(a + b, ["label", "conf"]), "label", "conf")
    assert two.report().collect() == one.report().collect()


def test_quality_gate_report_bound_contains_exact_auc(spark, tmp_path):
    """The gate's error interval must contain the exact Mann-Whitney AUC
    of the full ingested history — the ranking_auc_banded contract
    carried across batch boundaries."""
    from commerce_data_pipeline_spark.operators import selection as S
    from commerce_data_pipeline_spark.sources.ledger import QualityGateLedger

    a, b = _qrows(5), _qrows(13)
    led = QualityGateLedger(spark, str(tmp_path / "gate"), n_bins=25)
    led.ingest(spark.createDataFrame(a, ["label", "conf"]), "label", "conf")
    led.ingest(spark.createDataFrame(b, ["label", "conf"]), "label", "conf")
    r = led.report().collect()[0]
    full = spark.createDataFrame(a + b, ["label", "conf"])
    exact = S.ranking_auc(full, "label", "conf").collect()[0]["auc_e6"]
    assert abs(r["auc_banded_e6"] - exact) <= r["max_err_e6"]
    # and the ECE equals the one-pass batch operator over the history
    e = S.expected_calibration_error(full, "label", "conf", n_bins=25).collect()[0]
    assert (r["n"], r["ece_e6"]) == (e["n"], e["ece_e6"])


def test_quality_gate_ledger_stores_only_bin_aggregates(spark, tmp_path):
    """State contract: the parquet history holds ≤ n_bins rows per
    ingest with only (bin, n, n_pos, sum_conf) — never raw rows."""
    from commerce_data_pipeline_spark.sources.ledger import QualityGateLedger

    led = QualityGateLedger(spark, str(tmp_path / "gate"), n_bins=10)
    led.ingest(
        spark.createDataFrame(_qrows(7, 500), ["label", "conf"]), "label", "conf"
    )
    stored = spark.read.parquet(str(tmp_path / "gate"))
    assert set(stored.columns) == {
        "bin", "n", "n_pos", "sum_conf", "n_bins", "conf_scale"
    }
    assert stored.count() <= 10


def test_quality_gate_refuses_mismatched_bin_config(spark, tmp_path):
    """r9 review: rows carry their (n_bins, conf_scale); reopening the
    same path with a different config must REFUSE rather than silently
    merge histograms binned under different widths (which would void
    the AUC containment bound with no error)."""
    import pytest

    from commerce_data_pipeline_spark.sources.ledger import QualityGateLedger

    a = QualityGateLedger(spark, str(tmp_path / "gate"), n_bins=20)
    a.ingest(spark.createDataFrame(_qrows(3), ["label", "conf"]), "label", "conf")
    b = QualityGateLedger(spark, str(tmp_path / "gate"), n_bins=100)
    with pytest.raises(ValueError, match="bin"):
        b.report().collect()


def test_quality_gate_empty_ledger_reports_zero(spark, tmp_path):
    from commerce_data_pipeline_spark.sources.ledger import QualityGateLedger

    led = QualityGateLedger(spark, str(tmp_path / "never"))
    r = led.report().collect()[0]
    assert r["n"] == 0 and r["auc_banded_e6"] is None and r["ece_e6"] is None


def test_quality_gate_ledger_foreachbatch_stream(spark, tmp_path):
    """The docstring's composition claim executed for real: a
    multi-micro-batch stream ingests through foreachBatch into one
    QualityGateLedger; the cross-run report over the streamed history is
    BIT-IDENTICAL to the one-pass batch operators over all rows — the
    mergeable-bin contract surviving actual micro-batch execution (not
    just two hand-called ingests)."""
    from pyspark.sql import functions as F

    from commerce_data_pipeline_spark.operators import selection as S
    from commerce_data_pipeline_spark.sources.ledger import QualityGateLedger

    rows = _qrows(9, 120)
    src_dir = str(tmp_path / "in_gate")
    df = spark.createDataFrame(rows, ["label", "conf"])
    # 3 files → 3 micro-batches at maxFilesPerTrigger=1
    df.repartition(3).write.parquet(src_dir)

    led = QualityGateLedger(spark, str(tmp_path / "gate"), n_bins=15)
    q = (
        spark.readStream.schema("label boolean, conf long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
        .writeStream.foreachBatch(
            lambda bdf, _bid: led.ingest(bdf, "label", "conf")
        )
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt_gate"))
        .start()
    )
    q.awaitTermination(120)
    # at least two real micro-batches appended (3 files, 1 per trigger)
    n_ingests = (
        spark.read.parquet(str(tmp_path / "gate"))
        .groupBy("bin").count().agg(F.max("count")).collect()[0][0]
    )
    assert n_ingests >= 2

    r = led.report().collect()[0]
    e = S.expected_calibration_error(df, "label", "conf", n_bins=15).collect()[0]
    assert (r["n"], r["ece_e6"]) == (e["n"], e["ece_e6"])
    exact = S.ranking_auc(df, "label", "conf").collect()[0]["auc_e6"]
    assert abs(r["auc_banded_e6"] - exact) <= r["max_err_e6"]


# --- r13: retention/compaction contract (r12 VERDICT #5) -------------------


def test_fingerprint_compact_bit_identical_and_idempotent(spark, tmp_path):
    led = FingerprintLedger(spark, str(tmp_path / "ledger"))
    led.ingest(_docs(spark, [(i, f"doc {i}") for i in range(30)]))
    led.ingest(_docs(spark, [(i + 100, f"doc {i + 100}") for i in range(30)]))
    # a replayed commit writes duplicate digests the anti-join tolerates
    led.commit(led.with_fingerprint(_docs(spark, [(0, "doc 0"), (1, "doc 1")])))
    probe = _docs(
        spark, [(500, "doc 5"), (501, "doc 105"), (502, "never seen before")]
    )
    before = sorted(r["doc_id"] for r in led.filter_new(probe).collect())
    n_files_before = len(
        [p for p in (tmp_path / "ledger").rglob("*.parquet") if p.is_file()]
    )
    led.compact()
    after = sorted(r["doc_id"] for r in led.filter_new(probe).collect())
    assert before == after == [502]
    # duplicates folded, membership unchanged
    assert led.known().count() == led.known().distinct().count() == 60
    n_files_after = len(
        [p for p in (tmp_path / "ledger").rglob("*.parquet") if p.is_file()]
    )
    assert n_files_after < n_files_before
    # re-compaction is a no-op
    led.compact()
    assert sorted(r["doc_id"] for r in led.filter_new(probe).collect()) == after
    assert led.known().count() == 60
    # no rename-aside debris
    assert not (tmp_path / "ledger._compact_tmp").exists()
    assert not (tmp_path / "ledger._compact_old").exists()


def test_band_compact_match_history_bit_identical(spark, tmp_path):
    from commerce_data_pipeline_spark.sources.ledger import BandLedger

    led = BandLedger(spark, str(tmp_path / "bands"), num_hashes=16, bands=4,
                     shingle_n=2)
    led.ingest(_docs(spark, [
        (0, "the quick brown fox jumps over the lazy dog by the river"),
        (1, "an entirely different document about spark physical plans"),
    ]))
    led.ingest(_docs(spark, [
        (2, "completely novel third run content about parquet footers"),
    ]))
    # replayed commit → duplicate band rows
    led.commit(_docs(spark, [
        (1, "an entirely different document about spark physical plans"),
    ]))
    batch = _docs(spark, [
        (10, "the quick brown fox jumps over the lazy dog by the river"),
        (11, "an entirely different document about spark physical plans"),
        (12, "nothing like anything admitted before at all whatsoever"),
    ])
    before = sorted(map(tuple, led.match_history(batch).collect()))
    led.compact()
    after = sorted(map(tuple, led.match_history(batch).collect()))
    assert before == after and (10, 0) in after and (11, 1) in after
    # duplicate rows folded
    k = led.known()
    assert k.count() == k.distinct().count()
    led.compact()
    assert sorted(map(tuple, led.match_history(batch).collect())) == after


def test_band_compact_retention_cap_preserves_admit_gate(spark, tmp_path):
    from commerce_data_pipeline_spark.sources.ledger import BandLedger

    led = BandLedger(spark, str(tmp_path / "bands"), num_hashes=16, bands=4,
                     shingle_n=2)
    # five near-identical admitted docs pile onto the same band keys
    led.commit(_docs(spark, [
        (i, "the quick brown fox jumps over the lazy dog by the river")
        for i in range(5)
    ]))
    batch = _docs(spark, [
        (10, "the quick brown fox jumps over the lazy dog by the river"),
        (11, "fresh unseen content about winnowing and fingerprints today"),
    ])
    assert led.match_history(batch).count() == 5  # one old_id per admitted dup
    blocked_before = sorted(
        r["doc_id"] for r in led.filter_unmatched(batch).collect()
    )
    led.compact(max_ids_per_key=2)
    # pair fan-out bounded; admit decisions identical
    matches = led.match_history(batch)
    assert matches.count() == 2
    assert {r["old_id"] for r in matches.collect()} == {0, 1}  # min ids kept
    assert sorted(
        r["doc_id"] for r in led.filter_unmatched(batch).collect()
    ) == blocked_before == [11]


def test_quality_gate_compact_report_bit_identical(spark, tmp_path):
    from commerce_data_pipeline_spark.sources.ledger import QualityGateLedger

    led = QualityGateLedger(spark, str(tmp_path / "gate"), n_bins=10)
    rows = [(i, i % 2, (i * 97) % 1_000_001) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, label int, conf long")
    led.ingest(df.filter("id < 100"), "label", "conf")
    led.ingest(df.filter("id >= 100"), "label", "conf")
    before = led.report().collect()[0].asDict()
    led.compact()
    after = led.report().collect()[0].asDict()
    assert before == after
    # history is now <= n_bins rows in one file
    stored = spark.read.parquet(str(tmp_path / "gate"))
    assert stored.count() <= 10
    files = [p for p in (tmp_path / "gate").rglob("*.parquet") if p.is_file()]
    assert len(files) == 1
    # config check still enforced post-compaction
    import pytest as _pytest

    with _pytest.raises(ValueError):
        QualityGateLedger(spark, str(tmp_path / "gate"), n_bins=7).merged()


def test_ledger_fp_new_query_matches_oracle(spark, tmp_path):
    """Pre-registration differential for a later-round window candidate
    (the never-attested-in-window protocol): the FingerprintLedger
    cross-run lifecycle row — filter_new of a new batch against a
    compacted two-run history that absorbed a replayed commit. The
    oracle replays fingerprint → intra-batch min-id collapse → history
    anti-join declaratively over `documents`."""
    import duckdb

    from commerce_data_pipeline_spark.queries import _shared
    from commerce_data_pipeline_spark.queries.dedup_text import (
        _O_LEDGER_FP_NEW,
        _q_ledger_fp_new,
    )

    sf_dir = "/root/testdata/sf0.001"
    orig = _shared.CACHE_TAG
    _shared.CACHE_TAG = f"fp{tmp_path.name[-8:]}"
    try:
        sdf = _q_ledger_fp_new(spark, sf_dir)
        scols = sdf.columns
        srows = sorted(tuple(r) for r in sdf.collect())
    finally:
        _shared.CACHE_TAG = orig
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    rel = con.sql(_O_LEDGER_FP_NEW)
    ocols = rel.columns
    orows = sorted(tuple(r) for r in rel.fetchall())
    assert sorted(scols) == sorted(ocols)
    perm = [scols.index(c) for c in ocols]
    assert [tuple(r[i] for i in perm) for r in srows] == orows
    # live-data sanity: both suppression paths fired — the injected
    # re-crawls (+1e6 ids, content already admitted) were all rejected
    # by the history anti-join, the injected intra-batch refetches
    # (+2e6 ids) all collapsed to their min-id originals, and the
    # genuinely new pages all survived
    assert len(srows) > 0
    out_ids = {r[scols.index("doc_id")] for r in srows}
    assert not any(i >= 1_000_000 for i in out_ids)
    n_recrawl, n_refetch = con.sql(
        "SELECT "
        "  (SELECT COUNT(*) FROM documents WHERE doc_id % 3 = 1 AND doc_id % 30 = 1), "
        "  (SELECT COUNT(*) FROM documents WHERE doc_id % 3 = 0 AND doc_id % 30 = 0)"
    ).fetchone()
    assert n_recrawl > 0 and n_refetch > 0
