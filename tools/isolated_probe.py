"""Isolated per-query timing probe (r11 VERDICT #1).

Runs ONE registry query in a fresh SparkSession, min-of-N (default 3)
full materializations with cache/persisted-RDD hygiene between passes —
the measurement the suite bench cannot give a single row (suite runs
share a JVM and inherit late-suite memory pressure and box contention).

    python tools/isolated_probe.py semantic_only_dups [more ...] \
        [--sf-dir /root/testdata/sf0.1] [--reps 3]

Prints one JSON line: {"probe": {name: min_sec}, "reps": N, "sf_dir": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from commerce_data_pipeline_spark.queries import REGISTRY
from commerce_data_pipeline_spark.session import get_spark


def _unpersist_all_rdds(spark) -> None:
    try:
        for jrdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            try:
                jrdd.unpersist(False)
            except Exception:
                pass
    except Exception:
        pass


def main() -> int:
    argv = list(sys.argv[1:])
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    names: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--sf-dir":
            sf_dir = argv[i + 1]
            i += 2
        elif argv[i] == "--reps":
            reps = int(argv[i + 1])
            i += 2
        else:
            names.append(argv[i])
            i += 1
    if not names:
        print("usage: isolated_probe.py <query> [...] [--sf-dir D] [--reps N]",
              file=sys.stderr)
        return 2
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    spark = get_spark("isolated-probe")
    from pyspark.sql import functions as F

    # same warm-up as bench.py so pass 1 measures the query, not the JVM
    spark.range(1000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    warm.join(warm.select(F.col("r_regionkey")), on="r_regionkey").groupBy(
        "r_name"
    ).count().count()
    spark.range(100).mapInPandas(lambda it: it, "id long").count()

    out: dict[str, float] = {}
    for name in names:
        spec = REGISTRY[name]
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
            _unpersist_all_rdds(spark)
        out[name] = round(best, 3)
    print(json.dumps({"probe": out, "reps": reps, "sf_dir": sf_dir}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
