"""Bucketed co-located joins (shuffle-free) and small-file compaction."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from commerce_data_pipeline_spark import plans
from commerce_data_pipeline_spark.catalog import load_table
from commerce_data_pipeline_spark.sources import bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # warehouse dir is set (to a tmp location) at session build in conftest
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice")
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    bucketed.write_bucketed(li, "li_b", "l_orderkey", num_buckets=8)
    bucketed.write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"), "o_b", "l_orderkey", num_buckets=8
    )
    yield "li_b", "o_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")


def test_colocated_join_has_no_shuffle(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    j = bucketed.colocated_join(spark, li_t, o_t, on="l_orderkey")
    assert plans.num_shuffles(j) == 0, plans.formatted_plan(j)


def test_colocated_join_matches_plain_join(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    j = bucketed.colocated_join(spark, li_t, o_t, on="l_orderkey")
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    plain = li.join(o, li.l_orderkey == o.o_orderkey)
    assert j.count() == plain.count()


def test_bucketed_agg_avoids_shuffle(spark, bucketed_tables):
    li_t, _ = bucketed_tables
    agg = spark.table(li_t).groupBy("l_orderkey").agg(F.sum("l_quantity"))
    assert plans.num_shuffles(agg) == 0


def test_compact_parquet_dir(spark, tmp_path):
    p = str(tmp_path / "frag")
    # fragmented write: one file per partition × many partitions
    load_table(spark, SF, "orders").repartition(16).write.parquet(p)
    assert len(glob.glob(os.path.join(p, "*.parquet"))) == 16
    before = spark.read.parquet(p).count()
    n = bucketed.compact_parquet_dir(spark, p, target_files=2, sort_col="o_orderdate")
    assert n == 2
    assert spark.read.parquet(p).count() == before
