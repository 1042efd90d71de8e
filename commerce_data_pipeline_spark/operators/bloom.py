"""Bloom-filter benchmark decontamination — the broadcast-bitmap variant of
`corpus.benchmark_contamination`.

Why a second decontamination path: the exact version broadcasts the
benchmark's DISTINCT SHINGLE STRINGS. At real eval-suite sizes (hundreds of
benchmarks, ~10^7-10^8 distinct n-grams) that broadcast is gigabytes of
strings hashed into every executor's join map. A Bloom filter compresses the
same membership test into a FIXED-SIZE bit array (m bits — 16 KiB at
m=2^17, 16 MiB at m=2^27) at the cost of a bounded false-positive rate
(~(1-e^{-kn/m})^k, one-sided: never misses a real hit). This is exactly the
trade Spark's own runtime-filter join pushdown makes, re-expressed as an
explicit, oracle-checkable operator.

Plan shape for 100 TB corpus vs any benchmark size:
  1. build: benchmark shingles → k bit positions each (md5-derived, engine
     -reproducible) → groupBy(word) BIT_OR — a ≤ m/64-row aggregate.
  2. pack: collect the ≤ m/64 (word, bits) rows into one dense long[] —
     the ONLY driver action, a fixed-size codebook collect (16 KiB at the
     default m), same contract as the PQ/IVF codebook loads in index.py.
  3. check: the corpus scan tests every shingle against the bitmap as a
     LITERAL array via scan-side higher-order functions — zero joins, zero
     shuffles, zero corpus bytes moved. The 100 TB side is map-only.

Every hash is md5-prefix arithmetic (the repo-wide determinism idiom), so
the ANSI-SQL oracle replays bit-for-bit INCLUDING the false positives —
approximation with an exactly-specified answer, like sketches.py. The k
positions use Kirsch-Mitzenmacher double hashing — h1/h2 carved from one
md5 digest, pos_j = (h1 + j·h2) mod m — so membership costs ONE digest per
shingle, not k (md5 dominates; the arithmetic probes are free).

Reference scope: the reference repo has no decontamination at all; this
extends §2d (X-ops) alongside corpus.benchmark_contamination, which mirrors
the eval-overlap scan a training pipeline runs before every release.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import word_shingles

__all__ = ["bloom_build", "bloom_pack", "bloom_contamination", "DEFAULT_M_BITS", "DEFAULT_K"]

DEFAULT_M_BITS = 1 << 17  # 131072 bits = 2048 longs = 16 KiB
DEFAULT_K = 3


def _h1h2(key: Column) -> tuple[Column, Column]:
    """Split one md5 hex digest into two independent 60-bit longs (chars
    1-15 and 16-30). 15 hex chars keep each value positive in a signed
    64-bit long; the oracle replays them as
    CAST(('0x' || substr(md5(s), off, 15)) AS BIGINT)."""
    h1 = F.conv(F.substring(key, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(key, 16, 15), 16, 10).cast("long")
    return h1, h2


def bloom_build(
    benchmark: DataFrame,
    shingle_n: int = 3,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    text_col: str = "text",
) -> DataFrame:
    """Distributed Bloom-filter construction over the benchmark set's
    distinct word n-grams. Returns a (word_idx BIGINT, bits BIGINT) frame
    with at most m_bits/64 rows — word_idx = position div 64, bits = OR of
    (1 << position % 64) over every (shingle, hash_j) landing in that word.

    The only shuffles are the shingle distinct and the ≤ m/64-key BIT_OR
    groupBy; both are over the (small) benchmark side, never the corpus.
    """
    if m_bits % 64 != 0 or m_bits <= 0:
        raise ValueError("m_bits must be a positive multiple of 64")
    if k < 1:
        raise ValueError("k must be >= 1")
    sh = (
        benchmark.select(F.explode(word_shingles(text_col, shingle_n)).alias("_sh"))
        .distinct()
    )
    h1, h2 = _h1h2(F.md5(F.col("_sh")))
    pos = sh.select(
        F.explode(
            F.array(*[(h1 + F.lit(j) * h2) % F.lit(m_bits) for j in range(k)])
        ).alias("_pos")
    )
    return pos.groupBy((F.col("_pos") / 64).cast("long").alias("word_idx")).agg(
        F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT)))").alias(
            "bits"
        )
    )


def bloom_pack(bitmap: DataFrame, m_bits: int = DEFAULT_M_BITS) -> list[int]:
    """Collect the sparse (word_idx, bits) frame into a dense long[m/64].

    This is the one eager action in the Bloom path — a fixed-size codebook
    collect (2048 longs at the default m), the same budget class as
    index.py's PQ codebook load. The resulting list embeds in the corpus
    scan as a literal array, so the check stage needs no join at all.
    """
    words = [0] * (m_bits // 64)
    for row in bitmap.collect():
        words[int(row["word_idx"])] = int(row["bits"])
    return words


_MIN_LONG = -(1 << 63)


def _bits_literal(bits: list[int]) -> Column:
    """The packed bitmap as ONE array literal built from a single SQL
    expression string. `F.lit(list)` would marshal every element through
    py4j individually — ~1-2 s of driver time per plan at 2048 words,
    dwarfing the query itself. One parsed string costs milliseconds.
    MIN_LONG is spelled arithmetically (the parser rejects its absolute
    value as a long literal)."""
    parts = [
        "(-9223372036854775807L - 1L)" if v == _MIN_LONG else f"{v}L" for v in bits
    ]
    return F.expr(f"array({','.join(parts)})")


def bloom_contamination(
    docs: DataFrame,
    bits: list[int],
    shingle_n: int = 3,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    method: str = "scan",
) -> DataFrame:
    """Flag documents whose distinct shingles hit the Bloom filter.

    Two physically different plans, identical output:
    - `method="scan"` (default contract): shingling, positions, and bit
      tests are higher-order functions over the literal bitmap array —
      the corpus is read once, map-only, ZERO shuffles and zero joins.
      HOFs are CodegenFallback (interpreted), so per-row CPU is higher.
    - `method="explode"`: explode the shingle set, test bits in plain
      scalar expressions (whole-stage codegen), count per doc, join back
      for empty-shingle docs. Two thin (id, count) shuffles — bytes/doc,
      not text — in exchange for codegen-speed probes. Faster wall-clock
      wherever shuffle is not the binding constraint.

    Output per doc: n_shingles, n_bloom_hits (upper bound on true
    overlap — Bloom never misses, may over-count), hit_e6 =
    floor(1e6·hits/shingles), and `flagged` (ratio >= threshold). floor
    not round: half-even vs half-away rounding differs across engines.
    """
    if len(bits) != m_bits // 64:
        raise ValueError(f"bits must have exactly {m_bits // 64} words")
    if method not in ("scan", "explode"):
        raise ValueError("method must be 'scan' or 'explode'")
    lit_bits = _bits_literal(bits)
    sh = word_shingles(text_col, shingle_n)

    def _finalize(counted: DataFrame) -> DataFrame:
        ratio = F.col("n_bloom_hits").cast("double") / F.greatest(
            F.col("n_shingles"), F.lit(1)
        ).cast("double")
        return counted.select(
            F.col(id_col),
            "n_shingles",
            "n_bloom_hits",
            F.floor(ratio * 1_000_000).cast("long").alias("hit_e6"),
            (ratio >= F.lit(threshold)).alias("flagged"),
        )

    if method == "explode":
        ex = docs.select(F.col(id_col), F.explode(sh).alias("_sh"))
        h1, h2 = _h1h2(F.md5(F.col("_sh")))
        cond = None
        for j in range(k):
            pos = (h1 + F.lit(j) * h2) % F.lit(m_bits)
            word = F.element_at(lit_bits, (pos / 64).cast("int") + F.lit(1))
            bit_set = F.getbit(word, (pos % 64).cast("int")) == F.lit(1)
            cond = bit_set if cond is None else (cond & bit_set)
        hits = ex.groupBy(id_col).agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.sum(cond.cast("long")).cast("long").alias("n_bloom_hits"),
        )
        totals = docs.select(F.col(id_col))
        counted = (
            totals.join(hits, on=id_col, how="left")
            .na.fill({"n_shingles": 0, "n_bloom_hits": 0})
        )
        return _finalize(counted)

    def _digest_in_bloom(key: Column) -> Column:
        # AND of the k single-bit tests over ONE precomputed digest; each
        # test reads one word of the literal array and masks one bit —
        # pure codegen, no data movement.
        h1, h2 = _h1h2(key)
        cond = None
        for j in range(k):
            pos = (h1 + F.lit(j) * h2) % F.lit(m_bits)
            word = F.element_at(lit_bits, (pos / 64).cast("int") + F.lit(1))
            bit_set = F.getbit(word, (pos % 64).cast("int")) == F.lit(1)
            cond = bit_set if cond is None else (cond & bit_set)
        return cond

    # Staged projections with nondeterministic barriers: without them
    # CollapseProject inlines the shingle array into both consumers and the
    # whole HOF membership chain into every derived output column — HOFs
    # are CodegenFallback, so each copy re-evaluates interpreted (same trap
    # and same fix as winnow_fingerprints/minhash_signature).
    staged_sh = docs.select(
        F.col(id_col),
        sh.alias("_sh"),
        F.monotonically_increasing_id().alias("_mb0"),
    )
    # one md5 per shingle (transform), then k arithmetic bit probes
    counted = staged_sh.select(
        F.col(id_col),
        F.size("_sh").cast("long").alias("n_shingles"),
        F.size(
            F.filter(F.transform("_sh", lambda s: F.md5(s)), _digest_in_bloom)
        ).cast("long").alias("n_bloom_hits"),
        F.monotonically_increasing_id().alias("_mb1"),
    )
    return _finalize(counted)


def bloom_fpr_audit(
    benchmark: DataFrame,
    bits: list[int],
    shingle_n: int = 3,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    n_probes: int = 20_000,
    probe_prefix: str = "absent_probe_",
    text_col: str = "text",
) -> DataFrame:
    """Measured FALSE-POSITIVE RATE of a packed Bloom filter vs its
    theoretical bound — the sketch-accuracy contract (sketch_accuracy /
    sketch_union / quantile_groups) applied to the decontamination
    filter: before trusting "not in the benchmark" at 100 TB, prove the
    filter's error is the one its parameters promise.

    Probes are `n_probes` synthetic keys "<prefix><i>" — GUARANTEED
    absent from the inserted set (inserted keys are word n-grams
    containing spaces; probe keys contain none), so every hit is a false
    positive by construction, deterministically reproducible from the
    md5-derived bit positions. The boolean pins measured FPR ≤ 2× the
    theoretical p = (1 − e^{−k·n/m})^k (doubled: p is an expectation;
    the md5 "randomness" wobbles around it — a broken hash or bitmap
    lands orders of magnitude off, so the audit stays falsifiable).

    One benchmark-side distinct count + one map-side probe scan; the
    bitmap rides along as the same literal array the corpus scan uses.
    Returns (n_inserted, n_probes, n_hits, fpr_e6, bound_e6, fpr_ok).
    """
    if len(bits) != m_bits // 64:
        raise ValueError(f"bits must have exactly {m_bits // 64} words")
    spark = benchmark.sparkSession
    lit_bits = _bits_literal(bits)
    n_ins = (
        benchmark.select(F.explode(word_shingles(text_col, shingle_n)).alias("_sh"))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("n_inserted"))
    )
    probes = spark.range(n_probes).select(
        F.concat(F.lit(probe_prefix), F.col("id").cast("string")).alias("_key")
    )
    h1, h2 = _h1h2(F.md5(F.col("_key")))
    cond = None
    for j in range(k):
        pos = (h1 + F.lit(j) * h2) % F.lit(m_bits)
        word = F.element_at(lit_bits, (pos / 64).cast("int") + F.lit(1))
        bit_set = F.getbit(word, (pos % 64).cast("int")) == F.lit(1)
        cond = bit_set if cond is None else (cond & bit_set)
    hit = probes.agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum(cond.cast("long")).cast("long").alias("n_hits"),
    )
    out = n_ins.crossJoin(F.broadcast(hit))
    p_bound = F.pow(
        F.lit(1.0)
        - F.exp(
            -(F.lit(float(k)) * F.col("n_inserted").cast("double"))
            / F.lit(float(m_bits))
        ),
        F.lit(float(k)),
    )
    fpr = F.col("n_hits").cast("double") / F.col("n_probes").cast("double")
    return out.select(
        "n_inserted",
        "n_probes",
        "n_hits",
        F.floor(fpr * F.lit(1_000_000.0)).cast("long").alias("fpr_e6"),
        F.floor(p_bound * F.lit(1_000_000.0)).cast("long").alias("bound_e6"),
        (fpr <= F.lit(2.0) * p_bound).alias("fpr_ok"),
    )
