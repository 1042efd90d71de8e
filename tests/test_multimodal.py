"""Multimodal column operators: binary payloads + typed metadata, decode /
feature / resize / frame-sample plumbing (stub codecs, real Spark surface)."""

import pytest
from pyspark.sql import functions as F

from commerce_data_pipeline_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"),
        (3, "x"),
        (4, "uno dos tres cuatro cinco seis siete ocho nueve diez once doce"),
        (5, "data pipelines all the way down"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def media(docs):
    return MM.synthesize_media(docs).cache()


def test_media_schema_and_types(media):
    # same names and types; nullability flags differ between literal
    # construction and the declared read schema
    assert [(f.name, f.dataType.simpleString()) for f in media.schema] == [
        (f.name, f.dataType.simpleString()) for f in MM.MEDIA_SCHEMA
    ]
    got = {r["media_id"]: r for r in media.collect()}
    assert got[0]["media_type"] == "image"
    assert got[1]["media_type"] == "audio"
    assert got[2]["media_type"] == "video"
    assert bytes(got[0]["payload"]) == b"alpha beta gamma delta epsilon zeta"
    assert got[2]["meta"]["n_frames"] == 2 % 40 + 8
    assert got[1]["meta"]["sample_rate"] == 16000
    assert got[0]["meta"]["n_frames"] == 1


def test_media_metadata_projection(media):
    meta = MM.media_metadata(media)
    r = {x["media_id"]: x for x in meta.collect()}
    assert r[3]["byte_len"] == 1
    import hashlib

    assert r[0]["payload_md5"] == hashlib.md5(b"alpha beta gamma delta epsilon zeta").hexdigest()
    assert r[0]["width"] == 64 and r[1]["width"] == 72


def test_decode_image_shapes(media):
    out = MM.decode_image(media).collect()
    # only image rows decode
    assert {r["media_id"] for r in out} == {0, 3}
    for r in out:
        assert len(r["pixels"]) == r["width"] * r["height"]
        assert all(0.0 <= p <= 1.0 for p in r["pixels"][:64])


def test_decode_is_deterministic(media):
    a = {r["media_id"]: r["pixels"][:8] for r in MM.decode_image(media).collect()}
    b = {r["media_id"]: r["pixels"][:8] for r in MM.decode_image(media).collect()}
    assert a == b


def test_real_codec_path_raises_without_pil(media):
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed; stub-gate test not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        MM.decode_image(media, use_real_codec=True)


def test_resize_nearest_neighbor(media):
    decoded = MM.decode_image(media)
    small = MM.resize(decoded, 8, 8).collect()
    for r in small:
        assert r["width"] == 8 and r["height"] == 8
        assert len(r["pixels"]) == 64


def test_extract_features_fixed_width(media):
    out = MM.extract_features(media, dim=32).collect()
    assert len(out) == 6
    for r in out:
        assert len(r["embedding"]) == 32
        assert all(-0.5 <= v <= 0.5 for v in r["embedding"])
    # deterministic across runs
    again = MM.extract_features(media, dim=32).collect()
    key = lambda rs: {r["media_id"]: r["embedding"] for r in rs}
    assert key(out) == key(again)


def test_sample_frames(media):
    frames = MM.sample_frames(media, stride=4)
    rows = frames.collect()
    vids = {r["media_id"] for r in rows}
    assert vids == {2, 5}  # doc_id % 3 == 2
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r["media_id"], []).append(r)
    meta = {m["media_id"]: m for m in media.collect()}
    for vid, rs in by_vid.items():
        n_frames = meta[vid]["meta"]["n_frames"]
        expect_idx = list(range(0, n_frames, 4))
        assert sorted(r["frame_index"] for r in rs) == expect_idx
        payload_len = len(bytes(meta[vid]["payload"]))
        fb = max(payload_len // n_frames, 1)
        for r in rs:
            expect_len = max(min(fb, payload_len - r["frame_index"] * fb), 0)
            assert len(bytes(r["frame_bytes"])) == expect_len


def test_metadata_query_prunes_payload(media, spark):
    """Binary payload must not be read when only metadata is selected."""
    docs_path = None  # plan-level check on a parquet-backed frame
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "media")
        media.write.parquet(p)
        back = spark.read.parquet(p)
        plan = (
            back.select("media_id", "media_type", F.col("meta.width"))
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "payload" not in plan


def test_audio_windows_overlap(media):
    w = MM.audio_windows(media, window_bytes=8, hop_bytes=4)
    rows = sorted(
        (r["media_id"], r["window_index"], r["start_byte"], bytes(r["window_payload"]))
        for r in w.collect()
    )
    auds = {m["media_id"]: bytes(m["payload"]) for m in media.collect()
            if m["media_type"] == "audio"}
    assert {r[0] for r in rows} == set(auds)
    for mid, idx, start, payload in rows:
        full = auds[mid]
        assert start == idx * 4
        assert payload == full[start:start + 8]  # 50% overlap slices


def test_perceptual_hash_identical_payloads_collide(spark):
    from commerce_data_pipeline_spark.operators import multimodal as M

    docs = spark.createDataFrame(
        # offset 144 ≡ 0 mod lcm(3,16,9): same media_type + dimensions
        [(0, "the quick brown fox " * 10), (144, "the quick brown fox " * 10),
         (3, "a completely different document body " * 10)],
        "doc_id long, text string",
    )
    media = M.synthesize_media(docs)
    hashes = {r["media_id"]: r["phash"]
              for r in M.perceptual_hash(M.decode_image(media)).collect()}
    images = {mid for mid in hashes}
    assert 0 in images and 144 in images  # doc_id % 3 == 0 → image type
    assert hashes[0] == hashes[144]       # same payload → same pHash
    if 3 in hashes:
        assert hashes[3] != hashes[0]     # different content → different hash


def test_phash_pairs_bucketing_finds_exact_dups(spark):
    from commerce_data_pipeline_spark.operators import multimodal as M

    texts = [(i * 3, f"image document number {i} " * 8) for i in range(8)]
    dups = [(i * 3 + 1_000_080, t) for i, (_, t) in zip(range(8), texts)]
    docs = spark.createDataFrame(texts + dups, "doc_id long, text string")
    hashes = M.perceptual_hash(M.decode_image(M.synthesize_media(docs)))
    pairs = M.phash_pairs(hashes, max_hamming=0).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    # every original pairs with its planted copy at hamming 0
    assert {(i * 3, i * 3 + 1_000_080) for i in range(8)} <= got
    assert all(r["hamming"] == 0 for r in pairs)


def test_phash_pairs_max_hamming_filters(spark):
    from commerce_data_pipeline_spark.operators import multimodal as M

    # hand-built hashes: 0 vs 1-bit flip vs far value
    hashes = spark.createDataFrame(
        [(1, 0b1010), (2, 0b1011), (3, (1 << 60) - 1)], "media_id long, phash long"
    )
    close = M.phash_pairs(hashes, max_hamming=1).collect()
    assert {(r["id_a"], r["id_b"]) for r in close} == {(1, 2)}


def test_fused_decode_and_phash_matches_two_stage(media):
    fused = {r["media_id"]: r["phash"] for r in MM.decode_and_phash(media).collect()}
    staged = {
        r["media_id"]: r["phash"]
        for r in MM.perceptual_hash(MM.decode_image(media)).collect()
    }
    assert fused == staged and fused  # identical hashes, nonempty


def test_phash_pairs_default_blocks_exact_pigeonhole(spark):
    """With blocks=None (max_hamming+1), a pair at exactly max_hamming bits
    whose flipped bits are spread one-per-block is still found — the case
    the old fixed-4-block default missed."""
    from commerce_data_pipeline_spark.operators import multimodal as M

    base = 0
    # one flip per 16-bit block — under 5 blocks (13,13,13,13,12) these land
    # in blocks 0-3 and block 4 (bits 52-63) still agrees
    other = (1 << 0) | (1 << 16) | (1 << 32) | (1 << 48)
    hashes = spark.createDataFrame(
        [(1, base), (2, other)], "media_id long, phash long"
    )
    got = M.phash_pairs(hashes, max_hamming=4).collect()
    assert {(r["id_a"], r["id_b"], r["hamming"]) for r in got} == {(1, 2, 4)}
    # explicit blocks <= max_hamming is the approximate cost knob: this
    # spread pattern (one flip per 16-bit block) is legitimately missed
    approx = M.phash_pairs(hashes, max_hamming=4, blocks=4).collect()
    assert approx == []


def test_decode_and_phash_real_codec_gate(media):
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed; stub-gate test not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        MM.decode_and_phash(media, use_real_codec=True)


def test_phash_int_deterministic_and_dup_colliding(media):
    a = {r["media_id"]: r["phash"] for r in MM.decode_and_phash_int(media).collect()}
    b = {r["media_id"]: r["phash"] for r in MM.decode_and_phash_int(media).collect()}
    assert a == b and len(a) == 2  # doc_ids 0 and 3 are images (id % 3 == 0)
    assert all(isinstance(v, int) and 0 <= v < 1 << 63 for v in a.values())


def test_phash_int_matches_duckdb_reference(spark, docs):
    """Cross-engine pin for the binarized-DCT twin: the same chain computed
    independently in numpy from first principles (not via the operator)."""
    import hashlib

    import numpy as np

    media = MM.synthesize_media(docs)
    got = {r["media_id"]: r["phash"] for r in MM.decode_and_phash_int(media).collect()}
    basis = MM._binarized_dct_basis(32)[:8]
    for row in docs.collect():
        did, text = row["doc_id"], row["text"]
        if did % 3 != 0:
            continue
        w, h = 64 + (did % 16) * 8, 64 + (did % 9) * 8
        seed = np.frombuffer(
            hashlib.md5(text.encode()).digest(), dtype="uint8"
        ).astype("int64")
        yi = (np.arange(32) * h) // 32
        xi = (np.arange(32) * w) // 32
        idx = yi[:, None] * w + xi[None, :]
        small = (seed[idx % 16] * 2654435761 + idx * 97) % 256
        d = basis @ small @ basis.T
        block = d.ravel()[1:]
        bits = block > np.median(block)
        want = int(bits.astype("int64") @ (1 << np.arange(63, dtype="int64")))
        assert got[did] == want


def test_phash_pairs_max_bucket_truncates_deterministically(spark):
    # ten identical hashes: every block bucket holds all ten. max_bucket=5
    # keeps the FIRST five members per bucket in (media_id, phash) order —
    # C(5,2)=10 pairs among media_ids 0..4 — instead of silently zeroing
    # the output the way whole-bucket dropping would.
    hashes = spark.createDataFrame(
        [(i, 0b1010) for i in range(10)], "media_id long, phash long"
    )
    assert MM.phash_pairs(hashes, max_hamming=1, max_bucket=None).count() == 45
    got = MM.phash_pairs(hashes, max_hamming=1, max_bucket=5).collect()
    assert len(got) == 10
    assert {(r["id_a"], r["id_b"]) for r in got} == {
        (a, b) for a in range(5) for b in range(5) if a < b
    }
    with pytest.raises(ValueError):
        MM.phash_pairs(hashes, max_hamming=1, max_bucket=1)


def test_phash_pairs_pathological_corpus_is_bounded(spark):
    # adversarial all-identical-hash corpus: unbounded expansion would
    # materialize C(4000,2) ≈ 8M pair structs per block; the default
    # max_bucket=512 bounds it to C(512,2) among the lowest 512 ids.
    n = 4000
    hashes = spark.range(n).select(
        F.col("id").alias("media_id"), F.lit(0x5A5A5A5A).alias("phash")
    )
    pairs = MM.phash_pairs(hashes, max_hamming=4)
    assert pairs.count() == 512 * 511 // 2
    assert pairs.agg(F.max("id_b")).first()[0] == 511

    stats = MM.phash_bucket_stats(hashes, max_hamming=4).collect()
    assert len(stats) == 5
    for r in stats:
        assert r["n_buckets"] == 1
        assert r["max_bucket_size"] == n
        assert r["n_saturated"] == 1
        assert r["members_past_cap"] == n - 512


def test_phash_bucket_stats_clean_corpus(spark):
    # distinct well-spread hashes: no saturation, stats witness exactness
    hashes = spark.createDataFrame(
        [(i, (i * 2654435761) % (1 << 63)) for i in range(50)],
        "media_id long, phash long",
    )
    stats = MM.phash_bucket_stats(hashes, max_hamming=4)
    assert stats.agg(F.sum("n_saturated")).first()[0] == 0
    assert stats.agg(F.sum("members_past_cap")).first()[0] == 0


def test_extract_features_empty_and_null_payload(spark):
    """Empty and NULL payloads must both take the chr(0) seed branch the
    media_features_md5 oracle replays (md5 of a single NUL byte), and
    all three rows must produce the full fixed-width vector."""
    import hashlib

    media = spark.createDataFrame(
        [
            (1, "image", bytearray(b""), None),
            (2, "audio", None, None),
            (3, "video", bytearray(b"xyz"), None),
        ],
        MM.MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in MM.extract_features(media, dim=16).collect()}
    assert all(len(rows[i]["embedding"]) == 16 for i in (1, 2, 3))
    want = [b / 255.0 - 0.5 for b in hashlib.md5(b"\x00").digest()]
    for mid in (1, 2):
        got = rows[mid]["embedding"]
        assert got == [pytest.approx(v, abs=1e-6) for v in want]
    assert rows[3]["embedding"] != rows[1]["embedding"]
