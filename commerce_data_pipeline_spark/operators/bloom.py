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
approximation with an exactly-specified answer, like sketches.py.

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


def _position(shingle: Column, j: int, m_bits: int) -> Column:
    """Bit position of hash function j for a shingle: first 60 bits of
    md5(j ':' shingle) mod m_bits. 15 hex chars keep the value positive in
    a signed 64-bit long; the oracle replays it as
    CAST(('0x' || substr(md5(j || ':' || s), 1, 15)) AS BIGINT) % m."""
    key = F.md5(F.concat_ws(":", F.lit(str(j)), shingle))
    return F.conv(F.substring(key, 1, 15), 16, 10).cast("long") % F.lit(m_bits)


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
    pos = sh.select(
        F.explode(
            F.array(*[_position(F.col("_sh"), j, m_bits) for j in range(k)])
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


def bloom_contamination(
    docs: DataFrame,
    bits: list[int],
    shingle_n: int = 3,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flag documents whose distinct shingles hit the Bloom filter.

    Entirely scan-side: shingling, k-hash positions, and the bit tests are
    higher-order functions over the literal bitmap array — the corpus is
    read once, map-only, nothing shuffles and nothing joins. Output per
    doc: n_shingles, n_bloom_hits (upper bound on true overlap — Bloom
    never misses, may over-count), hit_e6 = floor(1e6·hits/shingles), and
    `flagged` (ratio >= threshold). floor not round: half-even vs
    half-away rounding differs across engines.
    """
    if len(bits) != m_bits // 64:
        raise ValueError(f"bits must have exactly {m_bits // 64} words")
    lit_bits = F.lit(bits).cast("array<bigint>")
    sh = word_shingles(text_col, shingle_n)

    def _in_bloom(s: Column) -> Column:
        # AND of the k single-bit tests; each reads one word of the literal
        # array and masks one bit — pure codegen, no data movement.
        cond = None
        for j in range(k):
            pos = _position(s, j, m_bits)
            word = F.element_at(lit_bits, (pos / 64).cast("int") + F.lit(1))
            bit_set = F.getbit(word, (pos % 64).cast("int")) == F.lit(1)
            cond = bit_set if cond is None else (cond & bit_set)
        return cond

    hits = F.size(F.filter(sh, _in_bloom))
    n_sh = F.size(sh)
    ratio = hits.cast("double") / F.greatest(n_sh, F.lit(1)).cast("double")
    return docs.select(
        F.col(id_col),
        n_sh.cast("long").alias("n_shingles"),
        hits.cast("long").alias("n_bloom_hits"),
        F.floor(ratio * 1_000_000).cast("long").alias("hit_e6"),
        (ratio >= F.lit(threshold)).alias("flagged"),
    )
