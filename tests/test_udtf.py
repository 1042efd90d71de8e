"""Python UDTF surface: token-span extraction."""

from pyspark.sql.functions import lit

from commerce_data_pipeline_spark.functions.udtfs import TokenSpans, register_udtfs


def test_token_spans_offsets(spark):
    out = TokenSpans(lit("the  quick fox")).collect()
    got = [(r["token"], r["start"], r["end"], r["token_index"]) for r in out]
    assert got == [("the", 0, 3, 0), ("quick", 5, 10, 1), ("fox", 11, 14, 2)]
    # offsets must index the original string (double space preserved)
    s = "the  quick fox"
    for tok, a, b, _ in got:
        assert s[a:b] == tok


def test_token_spans_repeated_tokens(spark):
    out = TokenSpans(lit("a b a")).collect()
    assert [(r["token"], r["start"]) for r in out] == [("a", 0), ("b", 2), ("a", 4)]


def test_token_spans_sql_lateral_join(spark):
    register_udtfs(spark)
    spark.createDataFrame([(1, "hi there"), (2, None)], "id long, text string") \
        .createOrReplaceTempView("docs_udtf")
    rows = spark.sql(
        "SELECT id, t.token, t.start FROM docs_udtf, LATERAL token_spans(text) t"
    ).collect()
    got = {(r["id"], r["token"], r["start"]) for r in rows}
    assert got == {(1, "hi", 0), (1, "there", 3)}  # null text → no rows
