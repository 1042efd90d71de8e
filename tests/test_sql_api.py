"""spark.sql parity: registered views answer raw SQL identically to the
DataFrame API (the engine's second public query surface)."""

from pyspark.sql import functions as F

from commerce_data_pipeline_spark.catalog import load_table, register_views

SF = "/root/testdata/sf0.001"


def test_register_views_and_sql_query(spark):
    register_views(spark, SF)
    got = spark.sql(
        """
        SELECT l_returnflag, COUNT(*) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY l_returnflag
        """
    ).collect()
    df = (
        load_table(spark, SF, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double").alias("sum_qty"),
        )
        .collect()
    )
    key = lambda rows: sorted((r["l_returnflag"], r["n"], r["sum_qty"]) for r in rows)
    assert key(got) == key(df)


def test_sql_join_over_views(spark):
    register_views(spark, SF)
    n = spark.sql(
        "SELECT COUNT(*) AS n FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
    ).collect()[0]["n"]
    assert n == load_table(spark, SF, "orders").count()  # FK always resolves


def test_sql_events_view_timestamp_conversion(spark):
    """The catalog's ns→µs events conversion must hold through the view."""
    register_views(spark, SF)
    r = spark.sql("SELECT MIN(ts) AS t FROM events").collect()[0]
    assert r["t"].year == 2024
