"""Unit tests for the one-pass data-quality profiler
(operators/profiling.py)."""

import datetime

import pytest
from pyspark.sql import Row

from commerce_data_pipeline_spark.operators import profiling


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        [
            Row(i=1, x=1.5, s="aa", t=datetime.datetime(2024, 1, 1), b=True),
            Row(i=2, x=None, s="bbbb", t=datetime.datetime(2024, 1, 2), b=False),
            Row(i=2, x=-3.0, s=None, t=None, b=None),
        ]
    )


def test_profile_stats_per_dtype(spark, frame):
    out = {r["col_name"]: r for r in profiling.table_profile(frame).collect()}
    assert set(out) == {"i", "x", "s", "t", "b"}
    assert all(r["n_rows"] == 3 for r in out.values())
    i = out["i"]
    assert (i["dtype_class"], i["n_null"], i["n_distinct"]) == ("int", 0, 2)
    assert (i["min_num"], i["max_num"]) == (1.0, 2.0)
    assert i["min_len"] is None and i["max_len"] is None
    x = out["x"]
    assert (x["dtype_class"], x["n_null"], x["n_distinct"]) == ("double", 1, 2)
    assert (x["min_num"], x["max_num"]) == (-3.0, 1.5)
    s = out["s"]
    assert (s["dtype_class"], s["n_null"], s["n_distinct"]) == ("string", 1, 2)
    assert (s["min_len"], s["max_len"]) == (2, 4)
    assert s["min_num"] is None
    t = out["t"]
    assert t["dtype_class"] == "timestamp" and t["n_null"] == 1
    assert t["min_num"] == 1704067200000000.0  # 2024-01-01 epoch micros
    b = out["b"]
    assert (b["dtype_class"], b["min_num"], b["max_num"]) == ("bool", 0.0, 1.0)


def test_profile_column_subset_and_approx(spark, frame):
    sub = profiling.table_profile(frame, columns=["i", "s"]).collect()
    assert [r["col_name"] for r in sub] == ["i", "s"]
    # approx path: identical schema, distinct becomes an estimate (>0)
    ap = {r["col_name"]: r for r in
          profiling.table_profile(frame, exact_distinct=False).collect()}
    assert set(ap) == {"i", "x", "s", "t", "b"}
    assert ap["i"]["n_distinct"] > 0
    with pytest.raises(ValueError, match="no columns"):
        profiling.table_profile(frame, columns=["nope"])
