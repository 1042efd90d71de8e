"""Corpus-construction operators for LLM training-data pipelines.

The reference pipeline (ashwin2912/commerce-data-pipeline) stops at
warehouse analytics; a 100 TB training-data pipeline additionally needs
corpus shaping: reproducible sampling, benchmark-contamination checks,
quality-quota mixing, sequence packing, and PII redaction. Everything
here follows the same design rules as the rest of the engine:

- Deterministic and engine-portable: randomness is md5-hash-derived
  (`hash_bucket`) so a DuckDB oracle reproduces every row bit-for-bit
  and a re-run on different cluster sizes selects the same sample.
- Scale-first: map-only where possible (sampling, redaction), broadcast
  where one side is small (contamination benchmark), group-partitioned
  windows / applyInPandas where per-group sequential state is inherent
  (packing) — never a global sort or a driver-side collect.

Operators
---------
- stratified_sample      : per-stratum deterministic hash sampling
- benchmark_contamination: n-gram overlap vs an eval/benchmark set
- quota_topk             : top-k rows per group (corpus mixing quota)
- chunk_pack             : GPT-style concat-then-chunk packing (window)
- greedy_pack            : whole-doc greedy bin packing (applyInPandas)
- redact_pii             : email/phone redaction + match counts
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F

from commerce_data_pipeline_spark.operators.dedup import word_shingles

# Redaction patterns restricted to syntax with identical semantics in
# Java regex (Spark) and RE2 (DuckDB): character classes, bounded
# repetition, \b word boundaries. No backrefs, no lookaround.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\b[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}\b"


def hash_bucket(col: Column, n_buckets: int = 10_000) -> Column:
    """Deterministic bucket in [0, n_buckets): md5 of the stringified
    value, top-15 hex chars as a 60-bit int, mod n_buckets. md5 (not
    xxhash64) so DuckDB computes the identical bucket:
    `CAST(('0x' || substr(md5(CAST(x AS VARCHAR)), 1, 15)) AS BIGINT) % n`.

    This is how a 100 TB pipeline samples reproducibly: the bucket is a
    pure function of the row key, so the sample is stable across runs,
    cluster sizes, and partitionings — no RNG state to coordinate.
    """
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long")
        % n_buckets
    )


def stratified_sample(
    df: DataFrame,
    rates: Mapping[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    n_buckets: int = 10_000,
) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff its hash bucket
    falls below rate(stratum) * n_buckets. Map-only — zero shuffles, the
    rate lookup is a literal map, and the filter pipelines with the scan.
    Strata absent from `rates` get `default_rate`.

    This is the training-mix primitive: 'keep 50% of en, 10% of zh' as a
    pure filter, reproducible row-for-row on any cluster.
    """
    mapping = F.create_map(
        *[F.lit(x) for k, v in sorted(rates.items()) for x in (k, float(v))]
    )
    rate = F.coalesce(mapping[F.col(stratum_col)], F.lit(float(default_rate)))
    return df.filter(
        hash_bucket(F.col(id_col), n_buckets)
        < F.floor(rate * F.lit(float(n_buckets))).cast("long")
    )


def fixed_size_sample(
    df: DataFrame,
    k: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample: the k rows with the
    SMALLEST hash bucket per stratum (ties broken by id). The bottom-k-
    of-a-hash trick is the distributed, reproducible replacement for
    reservoir sampling: no RNG state, identical result on any cluster,
    and growing the corpus only ever swaps items whose hash displaces a
    kept one. Window partitions by stratum — per-group sort only.
    """
    w = Window.partitionBy(stratum_col).orderBy(
        hash_bucket(F.col(id_col), 1 << 30).asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("_sr", F.row_number().over(w))
        .filter(F.col("_sr") <= k)
        .drop("_sr")
    )


def train_val_test_split(
    df: DataFrame,
    id_col: str = "doc_id",
    val_pct: float = 0.1,
    test_pct: float = 0.1,
    n_buckets: int = 10_000,
) -> DataFrame:
    """Deterministic train/val/test assignment from the id hash: the same
    document lands in the same split on every run, every cluster, every
    re-shard — the property that keeps eval sets uncontaminated as the
    corpus is rebuilt. Map-only (adds a `split` column)."""
    b = hash_bucket(F.col(id_col), n_buckets)
    val_cut = int(val_pct * n_buckets)
    test_cut = val_cut + int(test_pct * n_buckets)
    return df.withColumn(
        "split",
        F.when(b < val_cut, F.lit("val"))
        .when(b < test_cut, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def benchmark_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    shingle_n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-contamination check: for every training document, the
    fraction of its distinct word n-grams that also appear anywhere in
    the benchmark/eval set. Docs at or above `threshold` are flagged.

    Plan shape for 100 TB training vs ~MB-GB benchmark: the benchmark's
    distinct shingle set is SMALL — it broadcasts, so the per-doc overlap
    is a broadcast semi-join on the exploded doc shingles followed by one
    groupBy(doc) count. The corpus shuffles only (doc_id, n_hits) pairs,
    never text. `overlap_e6 = floor(ratio * 1e6)` (floor, not round —
    half-even vs half-away rounding differs across engines).
    """
    sh = word_shingles(text_col, shingle_n)
    bench_sh = benchmark.select(F.explode(sh).alias("_sh")).distinct()
    # ONE corpus pass (r18): the former shape scanned the training corpus
    # twice — once exploded for the overlap semi-join, once for the
    # per-doc shingle totals. explode_outer carries the total alongside
    # every shingle row (a shingle-less doc keeps its one NULL-shingle
    # row), the broadcast membership flag replaces the semi-join, and one
    # groupBy(doc) recovers both counts — identical n_hits/n_shingles
    # (bench_sh is distinct, so the left join never multiplies rows).
    ex = docs.select(
        F.col(id_col),
        F.size(sh).cast("long").alias("n_shingles"),
        F.explode_outer(sh).alias("_sh"),
    )
    per_doc = (
        ex.join(
            F.broadcast(bench_sh.withColumn("_hit", F.lit(True))),
            on="_sh",
            how="left",
        )
        .groupBy(id_col)
        .agg(
            F.first("n_shingles").alias("n_shingles"),
            F.sum(F.when(F.col("_hit"), 1).otherwise(0))
            .cast("long")
            .alias("n_hits"),
        )
    )
    ratio = F.col("n_hits") / F.greatest(F.col("n_shingles"), F.lit(1)).cast("double")
    return per_doc.select(
        F.col(id_col),
        "n_shingles",
        F.col("n_hits").cast("long").alias("n_hits"),
        F.floor(ratio * 1_000_000).cast("long").alias("overlap_e6"),
        (ratio >= threshold).alias("contaminated"),
    )


def quota_topk(
    df: DataFrame,
    group_cols: Iterable[str],
    order_cols: Iterable[Column],
    k: int,
    rank_name: str = "rank",
) -> DataFrame:
    """Top-k rows per group — the corpus-mixing quota: 'at most k docs per
    (lang, source), best quality first'. The window partitions by the
    group, so each task ranks one group's rows — no global order anywhere.
    Callers must make `order_cols` a total order for determinism.
    """
    w = Window.partitionBy(*list(group_cols)).orderBy(*list(order_cols))
    return (
        df.withColumn(rank_name, F.row_number().over(w))
        .filter(F.col(rank_name) <= k)
    )


def token_budget_select(
    df: DataFrame,
    budget: int,
    group_cols: Iterable[str] = ("lang",),
    order_cols: Iterable[Column] | None = None,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Token-BUDGET corpus selection — the 'sample N tokens per domain' mix
    rule (quota_topk caps document COUNTS; training mixes are specified in
    tokens): within each group, walk documents in priority order and keep
    every document that still fits the remaining budget, greedily by
    running total. A document straddling the boundary is kept iff its
    cumulative total stays within `budget` (whole-document semantics — no
    mid-document truncation here; chunking is a separate op).

    One group-partitioned window (running token sum in priority order) —
    each task scans only its group's rows, no global sort. `order_cols`
    defaults to id order; pass e.g. (quality desc, doc_id) for
    best-first mixes, and ALWAYS make it a total order for determinism.
    A running sum is inherently sequential PER GROUP, so one huge group
    funnels through one task; at 100 TB add a hash shard to `group_cols`
    and give each shard `budget / n_shards` — the mix stays within budget
    and each shard's window parallelizes independently (the same shard
    trick `chunk_pack` documents).

    Returns the kept rows + `cum_tokens` (running total including the row)
    so downstream writers can audit how full each group's budget is.
    """
    gcols = list(group_cols)
    ocols = list(order_cols) if order_cols is not None else [F.col(id_col)]
    w = Window.partitionBy(*gcols).orderBy(*ocols)
    return (
        df.withColumn("cum_tokens", F.sum(token_col).over(w).cast("long"))
        .filter(F.col("cum_tokens") <= budget)
    )


def overlap_chunks(
    df: DataFrame,
    size: int,
    stride: int,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Sliding-window chunk spans with overlap — the retrieval/context-prep
    shape (`stride < size` ⇒ consecutive chunks share `size - stride`
    tokens). Emits one row per (doc, chunk): chunk index, token start, and
    span length (the final chunk is truncated to the document end; a
    document shorter than `size` yields exactly one chunk).

    Pure built-ins (sequence + posexplode) — chunk *selection* is
    relational; actual token slicing happens wherever the tokens live.
    Map-side only: the blow-up factor is ≈ n_tokens/stride per doc, chosen
    by the caller, and nothing shuffles.
    """
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    n = F.col(token_col)
    # chunk starts: 0, stride, 2·stride, …, where the LAST start is the
    # smallest stride multiple ≥ n - size (ceil), so the final chunk always
    # reaches the document end — no uncovered tail tokens.
    last_start = F.greatest(n - size, F.lit(0))
    n_chunks = F.floor((last_start + (stride - 1)) / stride).cast("int") + 1
    starts = F.sequence(F.lit(0), (n_chunks - 1) * stride, F.lit(stride))
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        F.posexplode(starts).alias("chunk_index", "start_tok"),
    ).select(
        F.col(id_col),
        "n_tokens",
        F.col("chunk_index").cast("int").alias("chunk_index"),
        F.col("start_tok").cast("long").alias("start_tok"),
        F.least(F.lit(size).cast("long"), F.col("n_tokens") - F.col("start_tok"))
        .alias("span_len"),
    )


def chunk_pack(
    df: DataFrame,
    budget: int,
    group_cols: Iterable[str] = ("lang",),
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """GPT-style concat-then-chunk packing: documents are concatenated in
    id order within each group and the token stream is cut into fixed
    `budget`-token context windows; a document may span several chunks.
    Output per doc: its start offset in the group's token stream and the
    [first_chunk, last_chunk] window range it lands in.

    One running-sum window partitioned by the group — each group sorts
    locally in its own tasks. At 100 TB the group key includes a shard
    (e.g. `hash_bucket(id) % n_shards`) so no single group's stream is
    forced through one task; chunk ids are then shard-local, which is
    exactly what a sharded training-data writer wants.
    """
    gcols = list(group_cols)
    w = Window.partitionBy(*gcols).orderBy(id_col)
    end = F.sum(token_col).over(w)  # running total INCLUDING this doc
    start = (end - F.col(token_col)).alias("start_offset")
    return df.select(
        *gcols,
        F.col(id_col),
        F.col(token_col).cast("long").alias("n_tokens"),
        start.cast("long"),
        F.floor((end - F.col(token_col)) / budget).cast("long").alias("first_chunk"),
        F.floor((end - 1) / budget).cast("long").alias("last_chunk"),
    )


def greedy_pack(
    df: DataFrame,
    budget: int,
    group_cols: Iterable[str] = ("lang",),
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
) -> DataFrame:
    """Whole-document greedy bin packing: within each group, walk docs in
    id order and open a new bin whenever adding the next doc would exceed
    `budget`; documents are never split (an oversized doc occupies — and
    overflows — its own bin). The packing for a group is inherently
    sequential state, so it runs as one Arrow batch per group via
    applyInPandas; parallelism = number of groups, which at 100 TB is
    (lang × shard) with a hash shard in `group_cols` — thousands of
    independent packing tasks, none of them global.

    Output: (group_cols..., doc_id, n_tokens, bin_id, bin_fill) where
    bin_fill is the bin's running total after this doc. Deterministic —
    oracle-checkable via a recursive CTE stepping the same recurrence.
    """
    gcols = list(group_cols)
    dtypes = dict(df.dtypes)  # carry real group-col types (e.g. an int shard)
    fields = ", ".join(f"{c} {dtypes[c]}" for c in gcols)
    schema = f"{fields}, {id_col} long, n_tokens long, bin_id long, bin_fill long"

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bin_ids, fills = [], []
        bin_id, fill = 0, 0
        for t in pdf[token_col].astype("int64"):
            if fill > 0 and fill + t > budget:
                bin_id += 1
                fill = 0
            fill += int(t)
            bin_ids.append(bin_id)
            fills.append(fill)
        out = pdf[gcols + [id_col]].copy()
        out["n_tokens"] = pdf[token_col].astype("int64")
        out["bin_id"] = pd.Series(bin_ids, dtype="int64")
        out["bin_fill"] = pd.Series(fills, dtype="int64")
        return out

    return df.select(*gcols, id_col, token_col).groupBy(*gcols).applyInPandas(
        pack, schema
    )


def redact_pii(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Email/phone redaction with audit counts — the minimum-viable PII
    scrub before corpus release. Map-only regexp work (codegen'd JVM
    regex, no UDF); patterns are restricted to the Java-regex ∩ RE2
    subset so the DuckDB oracle replays them exactly.

    Returns (id, n_emails, n_phones, redacted_text) with matches replaced
    by fixed tags, emails first then phones (order matters only if a
    phone could appear inside an email; these patterns can't overlap, but
    the order is still pinned for determinism).
    """
    t = F.col(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(t, EMAIL_PATTERN, "<EMAIL>"), PHONE_PATTERN, "<PHONE>"
    )
    return df.select(
        F.col(id_col),
        F.regexp_count(t, F.lit(EMAIL_PATTERN)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_PATTERN)).cast("long").alias("n_phones"),
        redacted.alias("redacted_text"),
    )


def epoch_shuffle(
    df: DataFrame,
    epoch: int,
    n_buckets: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic epoch-wise GLOBAL shuffle — the data-ordering step of
    an LLM training run: every epoch must present the corpus in a fresh
    pseudo-random order, reproducibly (same epoch → same order on any
    cluster size, resumable mid-epoch).

    Shuffle key = md5(epoch ":" id); global order = (bucket, key, id)
    where bucket = (first 32 key bits) mod `n_buckets` — 32 bits, not one
    byte, so any practical bucket count stays uniform (residual bias ≤
    n_buckets/2^32) and n_buckets beyond 256 actually populate; the
    count is validated to [1, 2^20]. The scale story is the
    point: a naive `ORDER BY rand(seed)` funnels the corpus through one
    task's sort and isn't reproducible across partitionings, whereas here
    the total order is realized as a hash-partitioned bucket column + a
    per-bucket window — each bucket sorts independently (one shuffle, no
    global sort), and writers emit bucket-numbered files whose
    concatenation IS the epoch order. Every value is md5-derived, so the
    SQL oracle replays positions exactly.

    Returns (id, bucket, pos_in_bucket) — the (file, offset) layout of
    the shuffled epoch.
    """
    if not 1 <= n_buckets <= 1 << 20:
        raise ValueError(f"n_buckets must be in [1, 2^20], got {n_buckets}")
    key = F.md5(
        F.concat_ws(":", F.lit(epoch).cast("string"), F.col(id_col).cast("string"))
    )
    keyed = df.select(
        F.col(id_col),
        key.alias("_skey"),
        (F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % n_buckets)
        .cast("int")
        .alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy("_skey", id_col)
    return keyed.withColumn(
        "pos_in_bucket", F.row_number().over(w).cast("long")
    ).select(id_col, "bucket", "pos_in_bucket")


def temperature_mix(
    docs: DataFrame,
    alpha: float = 0.5,
    target: int = 300,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based source mixing (the T5 / Pile sampling rule):
    sample each source s at a rate ∝ n_s^alpha / n_s, so low-resource
    sources are up-weighted relative to proportional sampling (alpha=1 ≡
    proportional, alpha=0 ≡ uniform across sources). `target` is the
    expected total sample size.

    Determinism contract: per-source weights are e6-floored integers
    (w_e6 = floor(1e6·n_s^alpha)); the per-source keep-threshold is pure
    BIGINT arithmetic — thr_e4 = min(10000, (target·w_e6·10000) div
    (Σw_e6·n_s)) — and membership is the repo-wide md5 hash_bucket of the
    doc id. No float sums anywhere, so an ANSI-SQL oracle lands on the
    identical row set. alpha=0.5 computes n^alpha via sqrt (correctly
    rounded IEEE in both engines); other alphas use pow and are
    documented ±1ulp (harmless behind the e6 floor except adversarially).

    Scale shape: source counts are one tiny groupBy (|sources| rows); the
    thresholds broadcast-join back; the sample itself is a map-side
    filter. The corpus never shuffles. BIGINT headroom: target·w_e6·1e4
    overflows int64 only past n_s ≈ 1.7e9 docs per source at target 1e6 —
    cast the numerator to DECIMAL(38,0) if a deployment exceeds that.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError("alpha must be in [0, 1]")
    if target < 1:
        raise ValueError("target must be >= 1")
    n = F.col("_n").cast("double")
    n_alpha = F.sqrt(n) if alpha == 0.5 else F.pow(n, F.lit(alpha))
    w = (
        docs.groupBy(source_col)
        .agg(F.count(F.lit(1)).cast("long").alias("_n"))
        .withColumn("_w_e6", F.floor(n_alpha * F.lit(1000000.0)).cast("long"))
    )
    tot = w.agg(F.sum("_w_e6").alias("_totw"))
    thr = (
        w.crossJoin(F.broadcast(tot))
        .select(
            source_col,
            F.least(
                F.lit(10000).cast("long"),
                F.expr(f"({target} * _w_e6 * 10000) div (_totw * _n)"),
            ).alias("thr_e4"),
        )
    )
    return (
        docs.join(F.broadcast(thr), on=source_col)
        .filter(hash_bucket(F.col(id_col), 10_000) < F.col("thr_e4"))
        .select(F.col(id_col), F.col(source_col), F.col("thr_e4"))
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via exponential keys
    (Efraimidis & Spirakis 2006, the A-ES scheme): every row draws
    key = u^(1/w) and the k largest keys win — equivalently the k
    SMALLEST r = −ln(u)/w, which is what this computes (inclusion
    probability ∝ weight, one pass, no sequential reservoir). The
    standard "sample documents proportional to quality/length" stage of
    corpus construction.

    Determinism (oracle-exact): u derives from the row's md5 — a 32-bit
    integer v mapped to u = (v+1)/(2³²+1) ∈ (0,1) — so both engines
    compute −ln on IDENTICAL double operands (the bm25 ln precedent),
    floor to r_e9 BIGINT, and tie-break on id. Non-positive weights are
    excluded (undefined inclusion probability).

    Scale shape: the key is a scan-side expression; the cut lowers to
    TakeOrderedAndProject (per-partition heaps, k rows to the driver) —
    no global sort, no shuffle of the corpus.

    Output: (id_col, weight_col, key_e9), the k winners by key asc.
    """
    v = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    u = (v + F.lit(1)).cast("double") / F.lit(4294967297.0)
    w = F.col(weight_col).cast("double")
    r = F.floor(F.lit(1000000000.0) * (-F.log(u)) / w).cast("long")
    return (
        df.filter(w > 0)
        .select(F.col(id_col), F.col(weight_col), r.alias("key_e9"))
        .orderBy(F.asc("key_e9"), F.asc(id_col))
        .limit(k)
    )


def split_leakage(
    df: DataFrame,
    entity_col: str,
    split_col: str = "split",
) -> DataFrame:
    """Train/test split LEAKAGE audit: given a row-level split assignment,
    count entities whose rows straddle more than one split — the
    membership-leakage bug (eval rows correlated with training rows through
    a shared customer/user/document) that silently inflates every offline
    metric downstream. The audit is assignment-agnostic: feed it any
    split column (hash split, date split, a column from upstream) and it
    reports the violation mass instead of trusting the splitter.

    Plan: ONE entity-keyed aggregation (map-side partial: per entity the
    distinct-split count and row count), then a 1-row summary — the
    dbt-style audit shape, nothing fact-sized shuffles twice. Returns one
    row: (n_entities, n_rows, n_leaked_entities, n_leaked_rows).
    """
    per_entity = df.groupBy(entity_col).agg(
        F.countDistinct(split_col).alias("_n_splits"),
        F.count(F.lit(1)).cast("long").alias("_n_rows"),
    )
    return per_entity.agg(
        F.count(F.lit(1)).cast("long").alias("n_entities"),
        F.sum("_n_rows").cast("long").alias("n_rows"),
        F.count(F.when(F.col("_n_splits") > 1, 1)).cast("long").alias(
            "n_leaked_entities"
        ),
        F.sum(F.when(F.col("_n_splits") > 1, F.col("_n_rows")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_leaked_rows"),
    )
