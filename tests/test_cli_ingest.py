"""CLI driver (P11) and ingest readers (§2e sources) tests."""

import json

import pytest
from pyspark.sql import types as T

from commerce_data_pipeline_spark import cli
from commerce_data_pipeline_spark.sources import ingest

SF_DIR = "/root/testdata/sf0.001"


def test_cli_test_probe(tmp_path, capsys):
    rc = cli.main(["--test", "--source-dir", SF_DIR, "--bronze-root", str(tmp_path / "b")])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0 and out["ok"] and out["source"] and out["sink"]


def test_cli_daily_then_skip_then_force(tmp_path, capsys):
    root = str(tmp_path / "bronze")
    # the synthetic events table covers 2024-01; pick a date inside it
    rc = cli.main(["--date", "2024-01-05", "--source-dir", SF_DIR, "--bronze-root", root])
    first = json.loads(capsys.readouterr().out)
    assert rc == 0 and first["success"] and first["records"] > 0

    rc = cli.main(["--date", "2024-01-05", "--source-dir", SF_DIR, "--bronze-root", root])
    second = json.loads(capsys.readouterr().out)
    assert rc == 0 and second.get("skipped") is True

    rc = cli.main(
        ["--date", "2024-01-05", "--force", "--source-dir", SF_DIR, "--bronze-root", root]
    )
    third = json.loads(capsys.readouterr().out)
    assert rc == 0 and third["success"] and third.get("skipped") is False
    assert third["records"] == first["records"]


def test_cli_missing_data_date(tmp_path, capsys):
    rc = cli.main(["--date", "1999-12-31", "--source-dir", SF_DIR,
                   "--bronze-root", str(tmp_path / "b")])
    out = json.loads(capsys.readouterr().out)
    assert rc == 1 and out["error"] == "No data found"


def test_cli_backfill_and_status(tmp_path, capsys):
    root = str(tmp_path / "bronze")
    rc = cli.main([
        "--backfill-start", "2024-01-02", "--backfill-end", "2024-01-04",
        "--source-dir", SF_DIR, "--bronze-root", root,
    ])
    summary = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert summary["successful_days"] == 3 and summary["failed_days"] == 0

    rc = cli.main(["--status", "--days-back", "0", "--source-dir", SF_DIR, "--bronze-root", root])
    status = json.loads(capsys.readouterr().out)
    assert rc == 0
    assert "2024-01-03" in status["sink_dates"]
    assert "2024-01-05" in status["missing_dates"]  # not yet backfilled
    assert not status["is_healthy"]


def test_cli_backfill_range_validation(tmp_path):
    with pytest.raises(ValueError):
        cli.main([
            "--backfill-start", "2024-01-04", "--backfill-end", "2024-01-02",
            "--source-dir", SF_DIR, "--bronze-root", str(tmp_path / "b"),
        ])


def test_read_csv_explicit_schema(spark, tmp_path):
    p = tmp_path / "x.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    df = ingest.read_csv(spark, str(p), schema=schema)
    assert df.schema == schema
    assert {(r["a"], r["b"]) for r in df.collect()} == {(1, "x"), (2, "y")}


def test_read_csv_no_schema_is_all_strings(spark, tmp_path):
    p = tmp_path / "x.csv"
    p.write_text("a,b\n1,x\n")
    df = ingest.read_csv(spark, str(p))
    assert all(f.dataType == T.StringType() for f in df.schema)


def test_read_csv_inference(spark, tmp_path):
    p = tmp_path / "x.csv"
    p.write_text("a,b\n1,x\n2,y\n")
    df = ingest.read_csv(spark, str(p), infer_schema=True)
    assert dict((f.name, f.dataType) for f in df.schema)["a"] == T.IntegerType()


def test_read_json_lines(spark, tmp_path):
    p = tmp_path / "x.jsonl"
    p.write_text('{"a": 1, "b": "x"}\n{"a": 2, "b": "y"}\n')
    df = ingest.read_json(spark, str(p))
    assert {(r["a"], r["b"]) for r in df.collect()} == {(1, "x"), (2, "y")}


def test_read_json_explicit_schema_permissive(spark, tmp_path):
    p = tmp_path / "x.jsonl"
    p.write_text('{"a": 1}\n{"a": "not-a-number"}\n')
    schema = T.StructType([T.StructField("a", T.LongType())])
    df = ingest.read_json(spark, str(p), schema=schema)
    vals = [r["a"] for r in df.collect()]
    assert 1 in vals and None in vals  # bad row nulled, not fatal (PERMISSIVE)
