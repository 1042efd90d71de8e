"""CLI driver (SURVEY.md §2b P11): the engine's equivalent of the
reference's `scripts/run_pipeline.py` argparse front-end
(/root/reference/scripts/run_pipeline.py:34-137), flag-for-flag:

    --date YYYY-MM-DD        run one day (default: yesterday)
    --backfill-start / --backfill-end
    --status                 source/sink reconciliation
    --test                   connection / readability probes (P9)
    --force                  disable skip-if-exists

The pipeline here runs events → partitioned bronze Parquet on any
Hadoop-FS path instead of BigQuery → S3; orchestration semantics (default
date, skip-if-exists, per-day accounting, exit codes) mirror the
reference.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import functions as F

from commerce_data_pipeline_spark.catalog import DEFAULT_SF_DIR, load_table
from commerce_data_pipeline_spark.session import get_spark
from commerce_data_pipeline_spark.sources.bronze import BronzePipeline, BronzeWriter


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="commerce-data-pipeline-spark",
        description="PySpark-native daily event pipeline (bronze layer)",
    )
    p.add_argument("--date", help="process one date (YYYY-MM-DD); default yesterday")
    p.add_argument("--backfill-start", help="backfill range start (YYYY-MM-DD)")
    p.add_argument("--backfill-end", help="backfill range end (YYYY-MM-DD)")
    p.add_argument("--status", action="store_true", help="show pipeline status")
    p.add_argument("--test", action="store_true", help="probe source/sink readability")
    p.add_argument("--force", action="store_true", help="reprocess even if partition exists")
    p.add_argument("--source-dir", default=DEFAULT_SF_DIR, help="source table directory")
    p.add_argument("--bronze-root", default="/tmp/bronze", help="bronze output root")
    p.add_argument("--loop", action="store_true",
                   help="backfill day-by-day (per-day fault isolation) instead of one set-based job")
    p.add_argument("--days-back", type=int, default=30,
                   help="status lookback window in days (0 = full history)")
    return p


def _pipeline(args) -> BronzePipeline:
    spark = get_spark("cli")
    writer = BronzeWriter(root=args.bronze_root, data_type="events")
    return BronzePipeline(
        spark=spark,
        source=lambda: load_table(spark, args.source_dir, "events"),
        writer=writer,
        date_col="ts",
        sort_col="ts",
    )


def _test_connections(pipe: BronzePipeline) -> dict:
    """P9 — readability probes replacing the reference's BigQuery/S3
    `test_connection` calls (bigquery_extractor.py:165-175,
    s3_loader.py:218-249)."""
    out = {"source": False, "sink": False}
    try:
        pipe.source().select(F.lit(1)).limit(1).collect()
        out["source"] = True
    except Exception as e:
        out["source_error"] = str(e)
    try:
        import os

        os.makedirs(pipe.writer.table_root, exist_ok=True)
        out["sink"] = os.access(pipe.writer.table_root, os.W_OK)
    except Exception as e:
        out["sink_error"] = str(e)
    out["ok"] = out["source"] and out["sink"]
    return out


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    pipe = _pipeline(args)

    if args.test:
        result = _test_connections(pipe)
        print(json.dumps(result, indent=2))
        return 0 if result["ok"] else 1

    if args.status:
        days_back = args.days_back if args.days_back > 0 else None
        print(json.dumps(pipe.status(days_back), indent=2))
        return 0

    if args.backfill_start or args.backfill_end:
        if not (args.backfill_start and args.backfill_end):
            print("both --backfill-start and --backfill-end are required", file=sys.stderr)
            return 2
        summary = pipe.backfill(
            args.backfill_start,
            args.backfill_end,
            skip_existing=not args.force,
            set_based=not args.loop,
        )
        print(json.dumps(summary, indent=2))
        return 0 if summary["failed_days"] == 0 else 1

    result = pipe.run_daily(args.date, skip_existing=not args.force)
    print(json.dumps(result, indent=2))
    return 0 if result["success"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
