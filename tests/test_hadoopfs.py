"""Hadoop-FS abstraction boundary (SURVEY.md §2b P12).

The reference's storage client is boto3 against S3/LocalStack
(s3_loader.py:49-57; scripts/setup_localstack.py). Here the equivalent
boundary is Hadoop's FileSystem API: these tests drive the bronze sink
and compaction through scheme-QUALIFIED `file://...` URIs — the same
resolution path an `s3a://` URI takes (scheme → FileSystem impl →
endpoint from Hadoop conf), with only the scheme's jar differing. If any
sink-side code secretly used `os.*`, the `file://` prefix would break it.
"""

import json

from pyspark.sql import functions as F

from commerce_data_pipeline_spark.sources.bronze import BronzePipeline, BronzeWriter
from commerce_data_pipeline_spark.sources.bucketed import compact_parquet_dir
from commerce_data_pipeline_spark.sources.hadoopfs import HadoopFS, join_path

from tests.test_bronze import _source


def _uri_pipeline(spark, tmp_path):
    writer = BronzeWriter(root=f"file://{tmp_path}", data_type="events")
    return BronzePipeline(spark=spark, source=_source(spark), writer=writer, date_col="ts")


def test_bronze_roundtrip_via_file_scheme(spark, tmp_path):
    p = _uri_pipeline(spark, tmp_path)
    res = p.run_daily("2024-01-01")
    assert res["success"] and res["records"] == 2
    assert p.writer.exists("2024-01-01")
    assert not p.writer.exists("2024-01-03")
    assert p.writer.list_available_dates() == ["2024-01-01"]
    back = spark.read.parquet(p.writer.partition_path("2024-01-01"))
    assert back.count() == 2


def test_metadata_sidecar_via_file_scheme(spark, tmp_path):
    p = _uri_pipeline(spark, tmp_path)
    p.run_daily("2024-01-02")
    meta = p.writer.read_metadata("2024-01-02")
    assert meta["record_count"] == 1
    assert "ts" in meta["columns"]
    # the sidecar really landed inside the partition dir, not a local-path twin
    local = tmp_path / "events" / "year=2024" / "month=01" / "day=02" / "_meta.json"
    assert json.loads(local.read_text())["record_count"] == 1


def test_dynamic_overwrite_is_writer_local_not_session_conf(spark, tmp_path):
    """A daily run must only replace its own partitions even on a session
    whose global partitionOverwriteMode is the (default) static — the
    writer sets the option itself (ADVICE r1: relying on session config
    means any vanilla session deletes the whole table)."""
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "static")
    try:
        p = _uri_pipeline(spark, tmp_path)
        p.run_daily("2024-01-01")
        p.run_daily("2024-01-02")
        p.run_daily("2024-01-02", skip_existing=False)  # rewrite one day
        assert p.writer.exists("2024-01-01")  # day 1 survived
        assert spark.read.parquet(p.writer.table_root).count() == 3
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_hadoopfs_bytes_roundtrip_and_listing(spark, tmp_path):
    fs = HadoopFS(spark, f"file://{tmp_path}")
    base = f"file://{tmp_path}/sub"
    fs.mkdirs(base)
    fs.write_bytes(join_path(base, "x.json"), b'{"a": 1}')
    assert fs.read_bytes(join_path(base, "x.json")) == b'{"a": 1}'
    assert fs.listdir(base) == ["x.json"]
    assert fs.is_dir(base) and not fs.is_dir(join_path(base, "x.json"))
    assert fs.listdir(join_path(base, "nope")) == []
    assert fs.rename(join_path(base, "x.json"), join_path(base, "y.json"))
    assert fs.listdir(base) == ["y.json"]
    assert fs.delete(base)
    assert not fs.exists(base)


def test_compact_parquet_dir_via_file_scheme(spark, tmp_path):
    path = f"file://{tmp_path}/t"
    spark.range(1000).withColumn("v", F.col("id") * 2).repartition(16).write.parquet(path)
    n = compact_parquet_dir(spark, path, target_files=2, sort_col="id")
    assert n == 2
    df = spark.read.parquet(path)
    assert df.count() == 1000
    fs = HadoopFS(spark, path)
    assert not fs.exists(path + "._compact_tmp")
    assert not fs.exists(path + "._compact_old")


def test_compact_refuses_to_clobber_crash_leftovers(spark, tmp_path):
    import pytest

    path = f"file://{tmp_path}/t"
    spark.range(100).write.parquet(path)
    fs = HadoopFS(spark, path)
    fs.mkdirs(path + "._compact_old")  # simulate a crashed prior compaction
    with pytest.raises(RuntimeError, match="_compact_old"):
        compact_parquet_dir(spark, path, target_files=1)
    assert spark.read.parquet(path).count() == 100  # live data untouched


def test_swap_dir_keep_old_and_rollback(spark, tmp_path):
    """r15 gate plumbing: `swap_dir(keep_old=True)` defers the rename-aside
    delete so `rollback_swap` can restore the pre-swap state; while the
    copy exists, `begin_swap` refuses re-entry; rollback with no copy is
    an explicit error, not a silent no-op."""
    import pytest

    from commerce_data_pipeline_spark.sources.hadoopfs import (
        begin_swap,
        rollback_swap,
        swap_dir,
    )

    live = f"file://{tmp_path}/t"
    tmp = live + "._tmp"
    old = live + "._old"
    spark.range(10).write.parquet(live)
    fs = HadoopFS(spark, live)

    # keep_old leaves the aside copy; live serves the promoted data
    begin_swap(spark, live, tmp, old)
    spark.range(20).write.parquet(tmp)
    swap_dir(spark, live, tmp, old, keep_old=True)
    assert spark.read.parquet(live).count() == 20
    assert fs.exists(old)
    # the pending copy blocks a new swap until the caller decides
    with pytest.raises(RuntimeError, match="rename-aside"):
        begin_swap(spark, live, tmp, old)
    # rollback restores the pre-swap data and consumes the copy
    rollback_swap(spark, live, old)
    assert spark.read.parquet(live).count() == 10
    assert not fs.exists(old)
    # rollback without a copy must fail loudly
    with pytest.raises(RuntimeError, match="does not exist"):
        rollback_swap(spark, live, old)

    # default swap still deletes the aside copy (committed immediately)
    begin_swap(spark, live, tmp, old)
    spark.range(30).write.parquet(tmp)
    swap_dir(spark, live, tmp, old)
    assert spark.read.parquet(live).count() == 30
    assert not fs.exists(old)


def test_swap_dir_raises_when_aside_delete_fails(spark, tmp_path):
    """r16: swap_dir's final aside-copy delete is VERIFIED — a surviving
    copy raises instead of returning success, because callers reclaim
    retired data right after a completed swap, and doing that while a
    stale routing copy exists makes the copy's documented rename-back
    recovery silently wrong. The raise leaves the deferred-window state
    (promoted data live, copy intact)."""
    import pytest

    from commerce_data_pipeline_spark.sources.hadoopfs import begin_swap, swap_dir

    live = f"file://{tmp_path}/t"
    tmp = live + "._tmp"
    old = live + "._old"
    spark.range(10).write.parquet(live)
    begin_swap(spark, live, tmp, old)
    spark.range(20).write.parquet(tmp)

    orig_delete = HadoopFS.delete

    def refusing_delete(self, p, recursive=True):
        if str(p).endswith("._old"):
            return False  # simulate a partially-failed object-store delete
        return orig_delete(self, p, recursive)

    HadoopFS.delete = refusing_delete
    try:
        with pytest.raises(RuntimeError, match="could not remove"):
            swap_dir(spark, live, tmp, old)
    finally:
        HadoopFS.delete = orig_delete
    # the failure leaves the recoverable deferred-window state
    fs = HadoopFS(spark, live)
    assert spark.read.parquet(live).count() == 20
    assert fs.exists(old)
