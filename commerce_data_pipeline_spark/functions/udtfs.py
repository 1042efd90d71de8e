"""Python UDTF surface (SURVEY.md §2e "UDF/UDAF/UDTF").

Engine policy: built-in expressions first (whole-stage codegen), Arrow
batches (`mapInPandas` / `pandas_udf`) when Python is unavoidable,
row-at-a-time UDFs never. UDTFs sit between: one input row → many output
rows with imperative per-row logic. Use them only where the expansion
logic doesn't decompose into explode+HOFs — offset tracking, stateful
scanning, irregular parsing.

`TokenSpans` is the worked example: tokens WITH character offsets. The
token list alone is `split()`; the offsets need a running cursor over the
original string (repeated-token positions make `instr` wrong), which is
exactly the imperative per-row scan a UDTF expresses cleanly.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="token: string, start: int, end: int, token_index: int")
class TokenSpans:
    """One row per whitespace token: (token, [start, end) char offsets,
    ordinal). Deterministic; offsets index the ORIGINAL string."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        i = 0
        n = len(text)
        idx = 0
        while i < n:
            while i < n and text[i].isspace():
                i += 1
            if i >= n:
                break
            start = i
            while i < n and not text[i].isspace():
                i += 1
            yield text[start:i], start, i, idx
            idx += 1


def register_udtfs(spark) -> None:
    """Make the UDTFs callable from SQL: `SELECT * FROM token_spans(...)`."""
    spark.udtf.register("token_spans", TokenSpans)
