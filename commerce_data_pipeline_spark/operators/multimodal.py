"""Multimodal (image/audio/video) column operators (SURVEY.md §2d X5).

The reference pipeline is tabular-only (GA4 events; /root/reference/src/
pipeline/extractors/bigquery_extractor.py:76), so this module is pure
extension surface: the operations a 100 TB training-data pipeline needs for
media columns, expressed Spark-first.

Data model: media are **opaque binary columns with typed metadata** —
`payload binary` next to a `meta struct<...>` carrying what you'd get from
a container probe (dimensions, frame count, sample rate, codec). All
relational work (filtering, routing, dedup-by-digest, partition pruning)
happens on the metadata/digest columns JVM-side; the payload bytes are only
touched inside Arrow-batched `mapInPandas` stages.

Decode stubs: the real image/audio codecs (PIL/libav) are NOT in this
container, so `decode_image` tries the real library and falls back to a
deterministic fake decoder (seeded by the payload digest). The fake is
clearly marked; the Spark-side plumbing — schemas, batch iteration, column
shapes, partitioning — is real and is what the tests pin down.

Scale notes:
- payloads never shuffle for metadata-only queries (column pruning keeps
  the binary column out of the scan entirely — verify via ReadSchema).
- frame sampling emits one row per *sampled* frame, so the blow-up factor
  is n_frames/stride, controlled by the caller.
- feature extraction returns fixed-width float arrays → downstream joins
  shuffle dim×4 bytes/row, not the media bytes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

# Typed metadata carried beside every payload. A real ingest fills this from
# a container probe (ffprobe/PIL.open); the synthesizer below derives it
# deterministically from the source row.
MEDIA_META = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("codec", T.StringType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

MEDIA_TYPES = ("image", "audio", "video")


def synthesize_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Derive a deterministic media table from the documents corpus: the
    UTF-8 text bytes stand in for the container payload; metadata fields are
    arithmetic in the id (so a SQL oracle reproduces them exactly).

    This is the test-data path only — real ingest reads binary files +
    probes. Everything downstream treats the result as opaque media.
    """
    did = F.col(id_col)
    mtype = F.element_at(F.array(*[F.lit(t) for t in MEDIA_TYPES]), (did % 3 + 1).cast("int"))
    width = (F.lit(64) + (did % 16) * 8).cast("int")
    height = (F.lit(64) + (did % 9) * 8).cast("int")
    n_frames = F.when(mtype == "video", (did % 40 + 8).cast("int")).otherwise(F.lit(1))
    sample_rate = F.when(mtype == "audio", F.lit(16000)).otherwise(F.lit(0)).cast("int")
    duration_ms = (n_frames.cast("long") * 40)
    return docs.select(
        did.alias("media_id"),
        mtype.alias("media_type"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            width.alias("width"),
            height.alias("height"),
            n_frames.alias("n_frames"),
            sample_rate.alias("sample_rate"),
            duration_ms.alias("duration_ms"),
            F.lit("synthetic/v1").alias("codec"),
        ).alias("meta"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Metadata/digest projection — pure built-ins, no Python. The payload
    is touched only by octet_length/md5 inside codegen; at scale this is a
    map-only scan and the binary column prunes away for callers that drop
    the digest columns."""
    return media.select(
        "media_id",
        "media_type",
        F.octet_length("payload").cast("long").alias("byte_len"),
        F.md5("payload").alias("payload_md5"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_frames").alias("n_frames"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )


# ---------------------------------------------------------------------------
# Decode / feature-extract / resize / frame-sample — Arrow-batched stages
# ---------------------------------------------------------------------------

_DECODED_SCHEMA = "media_id long, width int, height int, pixels array<float>"


def _fake_pixels(payload: bytes, width: int, height: int, channels: int = 1):
    """STUB decoder: deterministic pixel block seeded by the payload digest.

    Real decode would be `PIL.Image.open(io.BytesIO(payload))`; that library
    is not in this container. The fake keeps the exact output shape/dtype a
    real decoder would produce (width*height*channels float32 in [0,1]), so
    every downstream stage exercises real plumbing.
    """
    import numpy as np

    n = width * height * channels
    seed = np.frombuffer(hashlib.md5(payload).digest(), dtype="uint8").astype("uint32")
    # xorshift-ish expansion of the 16 seed bytes to n values — cheap, seeded
    idx = np.arange(n, dtype="uint32")
    vals = (seed[idx % 16] * 2654435761 + idx * 97) % 256
    return (vals / 255.0).astype("float32")


def _decode_real(payload: bytes):
    """Real image decode via PIL (public library, optional in this
    container): grayscale float32 in [0,1], returned as (pixels, w, h).
    Callers must have verified PIL is importable (see decode_image)."""
    import io

    import numpy as np
    import PIL.Image

    img = PIL.Image.open(io.BytesIO(payload)).convert("L")
    arr = np.asarray(img, dtype="float32") / 255.0
    return arr.ravel(), img.width, img.height


def _require_pil():
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "real image decode needs PIL, which is not installed; "
            "use use_real_codec=False for the deterministic stub"
        ) from e


def decode_image(media: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """Decode image payloads to pixel arrays via `mapInPandas` (one Arrow
    batch in, one out; payload bytes never leave the executor).

    `use_real_codec=True` decodes with PIL (grayscale, [0,1] float) and
    raises NotImplementedError when PIL is absent; the default path uses
    the deterministic stub decoder.
    """
    if use_real_codec:
        _require_pil()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            if use_real_codec:
                decoded = [_decode_real(p) for p in pdf["payload"]]
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "width": [d[1] for d in decoded],
                        "height": [d[2] for d in decoded],
                        "pixels": [d[0] for d in decoded],
                    }
                )
            else:
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "width": pdf["width"],
                        "height": pdf["height"],
                        "pixels": [
                            _fake_pixels(p, w, h)
                            for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"])
                        ],
                    }
                )

    src = media.filter(F.col("media_type") == "image").select(
        "media_id", "payload", F.col("meta.width").alias("width"), F.col("meta.height").alias("height")
    )
    return src.mapInPandas(run, _DECODED_SCHEMA)


def resize(decoded: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of decoded pixel arrays (numpy, vectorized
    per Arrow batch). Nearest-neighbor is exact integer indexing — no codec
    needed, so this stage is real, not a stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for px, w, h in zip(pdf["pixels"], pdf["width"], pdf["height"]):
                img = np.asarray(px, dtype="float32").reshape(h, w)
                yi = (np.arange(out_h) * h) // out_h
                xi = (np.arange(out_w) * w) // out_w
                out.append(img[yi][:, xi].ravel())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": out_w,
                    "height": out_h,
                    "pixels": out,
                }
            )

    return decoded.mapInPandas(run, _DECODED_SCHEMA)


def extract_features(media: DataFrame, dim: int = 64) -> DataFrame:
    """Fixed-width feature vector per media row (the embedding-model stage).

    STUB model: md5-chained digest expansion of the payload — deterministic,
    media-type-agnostic, correct output shape (`array<float>` of `dim`).
    A real deployment swaps `_embed` for an ONNX/torch call; the Spark
    surface (Arrow batches in, fixed-width float arrays out) is unchanged.
    """

    def _embed(payload: bytes) -> list:
        import numpy as np

        # None (null payload) and b"" both seed the chain with a single
        # NUL byte — the SQL oracle's chr(0) branch replays exactly this
        out, block = [], (payload or b"")[:64] or b"\x00"
        while len(out) * 16 < dim:
            block = hashlib.md5(block).digest()
            out.append(np.frombuffer(block, dtype="uint8"))
        flat = np.concatenate(out)[:dim].astype("float32")
        return (flat / 255.0 - 0.5).tolist()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "embedding": [_embed(p) for p in pdf["payload"]],
                }
            )

    return media.select("media_id", "media_type", "payload").mapInPandas(
        run, "media_id long, media_type string, embedding array<float>"
    )


def audio_windows(
    media: DataFrame, window_bytes: int = 256, hop_bytes: int = 128
) -> DataFrame:
    """Overlapping audio windows (the STFT-framing shape): one row per
    window of `window_bytes` payload bytes advancing by `hop_bytes`
    (50% overlap at the defaults). Pure built-ins — window *selection* is
    relational (sequence + explode + substring); only spectral transforms
    on the window bytes would need a Pandas-UDF stage downstream.

    Returns (media_id, window_index, start_byte, window_len, window_bytes_col).
    Blow-up factor ≈ byte_len/hop — caller controls via hop.
    """
    auds = media.filter(F.col("media_type") == "audio")
    n_windows = F.greatest(
        F.floor(
            (F.octet_length("payload") - F.lit(window_bytes)) / F.lit(hop_bytes)
        ).cast("int")
        + 1,
        F.lit(1),
    )
    idx = F.sequence(F.lit(0), n_windows - 1)
    return (
        auds.select("media_id", "payload", F.explode(idx).alias("window_index"))
        .select(
            "media_id",
            "window_index",
            (F.col("window_index") * hop_bytes).alias("start_byte"),
            F.substring(
                F.col("payload"), F.col("window_index") * hop_bytes + 1, F.lit(window_bytes)
            ).alias("window_payload"),
        )
        .withColumn("window_len", F.octet_length("window_payload").cast("long"))
    )


def sample_frames(media: DataFrame, stride: int = 4) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled frame
    index (0, stride, 2·stride, …), each carrying a byte-slice of the
    payload as the fake frame data.

    Expressed as pure built-ins (sequence + posexplode) — frame *selection*
    is relational work; only frame *decode* (a later decode_image-shaped
    stage) needs Python. Blow-up factor = n_frames/stride, chosen by caller.
    """
    vids = media.filter(F.col("media_type") == "video")
    idx = F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(stride))
    # floor division (not cast-truncate): bit-for-bit reproducible in ANSI SQL
    per_frame = F.greatest(
        F.floor(F.octet_length("payload") / F.greatest(F.col("meta.n_frames"), F.lit(1))).cast("int"),
        F.lit(1),
    )
    return (
        vids.select(
            "media_id",
            F.col("meta.n_frames").alias("n_frames"),
            F.explode(idx).alias("frame_index"),
            "payload",
            per_frame.alias("_fbytes"),
        )
        .select(
            "media_id",
            "frame_index",
            F.substring(
                F.col("payload"), F.col("frame_index") * F.col("_fbytes") + 1, F.col("_fbytes")
            ).alias("frame_bytes"),
        )
    )


# ---------------------------------------------------------------------------
# Perceptual hashing (image near-dup — the X2 dedup family applied to X5)
# ---------------------------------------------------------------------------

def _dct_basis(size: int):
    """DCT-II basis matrix (orthonormal not required — median-threshold
    bits are scale-invariant)."""
    import numpy as np

    n_ = np.arange(size)
    return np.cos(np.pi * (n_[None, :] + 0.5) * n_[:, None] / size)


def _phash_one(img, basis, hash_size: int) -> int:
    """pHash kernel for one decoded image (2-D float64 array): nearest-
    neighbor downscale to (4·hash_size)², 2-D DCT-II via matmul, keep the
    top-left hash_size×hash_size low-frequency block minus the DC term,
    threshold at the median → 63-bit hash packed into a long."""
    import numpy as np

    size = hash_size * 4
    h, w = img.shape
    yi = (np.arange(size) * h) // size
    xi = (np.arange(size) * w) // size
    small = img[yi][:, xi]
    dct = basis @ small @ basis.T
    block = dct[:hash_size, :hash_size].ravel()[1:]  # drop DC
    bits = block > np.median(block)
    return int(bits.astype(np.uint64) @ (1 << np.arange(63, dtype=np.uint64)))


def perceptual_hash(decoded: DataFrame, hash_size: int = 8) -> DataFrame:
    """pHash over already-decoded pixel arrays (see `_phash_one` for the
    construction). Near-identical images (re-encodes, small crops/noise
    under a REAL codec; identical payloads under the stub) land within a
    few hamming bits. Arrow-batched mapInPandas; the output is 8 bytes per
    image — the dedup-friendly shape.

    Prefer `decode_and_phash` when the pixels have no other consumer: it
    fuses decode and hash into ONE Arrow stage, so the width×height float
    array never crosses a Python-worker boundary.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        basis = _dct_basis(hash_size * 4)
        for pdf in batches:
            if pdf.empty:
                continue
            hashes = [
                _phash_one(np.asarray(px, dtype="float64").reshape(h, w), basis, hash_size)
                for px, w, h in zip(pdf["pixels"], pdf["width"], pdf["height"])
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "phash": pd.Series(hashes, dtype="int64")})

    return decoded.select("media_id", "width", "height", "pixels").mapInPandas(
        run, "media_id long, phash long"
    )


def decode_and_phash(
    media: DataFrame, hash_size: int = 8, use_real_codec: bool = False
) -> DataFrame:
    """Fused decode→pHash: ONE mapInPandas stage from (payload, meta) to
    (media_id, phash). Produces bit-identical hashes to
    `perceptual_hash(decode_image(media))` — same stub/real decoder, same
    kernel — but the intermediate pixel array (width×height doubles per
    image) stays a worker-local numpy value instead of being Arrow-
    serialized between two Python stages. At 100 TB that serialization is
    the dominant cost of the two-stage form; here the per-image payload →
    8-byte hash reduction happens in a single map pass.
    """
    if use_real_codec:
        _require_pil()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        basis = _dct_basis(hash_size * 4)
        for pdf in batches:
            if pdf.empty:
                continue
            hashes = []
            for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                if use_real_codec:
                    px, w, h = _decode_real(p)
                else:
                    px = _fake_pixels(p, w, h)
                img = np.asarray(px, dtype="float64").reshape(h, w)
                hashes.append(_phash_one(img, basis, hash_size))
            yield pd.DataFrame({"media_id": pdf["media_id"], "phash": pd.Series(hashes, dtype="int64")})

    src = media.filter(F.col("media_type") == "image").select(
        "media_id", "payload", F.col("meta.width").alias("width"), F.col("meta.height").alias("height")
    )
    return src.mapInPandas(run, "media_id long, phash long")


def _binarized_dct_basis(size: int):
    """±1 sign matrix of the DCT-II basis (binarized-DCT pHash variant).

    sign(cos(π·(n+0.5)·k/size)) is well-defined for every (k, n) with
    k < size: the argument sits at least π/(2·size) away from any odd
    multiple of π/2, so |cos| ≥ sin(π/(2·size)) ≈ 0.049 at size=32 —
    far outside float rounding, and any engine's cos() agrees on the sign.
    That makes the transform integer-exact and cross-engine reproducible.
    """
    import numpy as np

    n = np.arange(size)
    c = np.cos(np.pi * (n[None, :] + 0.5) * n[:, None] / size)
    return np.where(c >= 0, 1, -1).astype("int64")


def decode_and_phash_int(media: DataFrame, hash_size: int = 8) -> DataFrame:
    """Oracle-reproducible pHash twin: fused decode→binarized-DCT hash,
    ALL-INTEGER after the fixed ±1 basis (see `_binarized_dct_basis`).

    Same construction as `decode_and_phash` — stub-decode, downscale to
    (4·hash_size)², 2-D transform, keep the low-frequency block minus DC,
    threshold at the median, pack 63 bits — but the cosine basis is
    binarized to ±1, so every intermediate is an int64 and a SQL engine
    reproduces the hash bit-for-bit (the float-DCT production path stays
    rows-only checked). Pixels are the stub decoder's values BEFORE the
    /255 normalization: `(md5_seed[idx%16]·2654435761 + idx·97) mod 256`,
    identical to `_fake_pixels`·255 (mod-256 commutes with the uint32
    wraparound because 256 divides 2^32). Binarized-DCT keeps the
    perceptual property that matters for dedup: identical payloads hash
    identically; near-identical pixel blocks land within a few bits.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        size = hash_size * 4
        bsub = _binarized_dct_basis(size)[:hash_size]  # hash_size × size
        weights = 1 << np.arange(hash_size * hash_size - 1, dtype="int64")
        for pdf in batches:
            if pdf.empty:
                continue
            hashes = []
            for p, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                seed = np.frombuffer(
                    hashlib.md5(bytes(p) if p is not None else b"").digest(),
                    dtype="uint8",
                ).astype("int64")
                yi = (np.arange(size, dtype="int64") * h) // size
                xi = (np.arange(size, dtype="int64") * w) // size
                idx = yi[:, None] * w + xi[None, :]
                small = (seed[idx % 16] * 2654435761 + idx * 97) % 256
                d = bsub @ small @ bsub.T
                block = d.ravel()[1:]  # drop DC
                bits = block > np.median(block)
                hashes.append(int(bits.astype("int64") @ weights))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "phash": pd.Series(hashes, dtype="int64")}
            )

    src = media.filter(F.col("media_type") == "image").select(
        "media_id",
        "payload",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return src.mapInPandas(run, "media_id long, phash long")


def _block_bounds(total_bits: int, blocks: int) -> list[tuple[int, int]]:
    """Split `total_bits` into `blocks` contiguous (offset, width) spans,
    widths differing by at most one (first `total_bits % blocks` spans get
    the extra bit)."""
    base, rem = divmod(total_bits, blocks)
    out, off = [], 0
    for b in range(blocks):
        w = base + (1 if b < rem else 0)
        out.append((off, w))
        off += w
    return out


def _phash_block_rows(hashes: DataFrame, blocks: int) -> DataFrame:
    """One row per (media_id, block) with the block's bit value — the
    shared blocking step of `phash_pairs` and `phash_bucket_stats`."""
    if not 1 <= blocks <= 64:
        raise ValueError("blocks must be in [1, 64]")
    bounds = _block_bounds(64, blocks)

    def _bval(off: int, w: int):
        # a 64-bit-wide block is the whole hash; (1<<64)-1 overflows a long
        if w == 64:
            return F.col("phash")
        return F.shiftrightunsigned(F.col("phash"), off).bitwiseAND(F.lit((1 << w) - 1))

    return hashes.select(
        F.col("media_id"),
        F.col("phash"),
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("blk"), _bval(off, w).alias("bval"))
                for b, (off, w) in enumerate(bounds)
            ])
        ).alias("bb"),
    ).select("media_id", "phash", F.col("bb.blk").alias("blk"), F.col("bb.bval").alias("bval"))


def phash_pairs(
    hashes: DataFrame,
    max_hamming: int = 4,
    blocks: int | None = None,
    max_bucket: int | None = 512,
) -> DataFrame:
    """Near-duplicate image pairs from perceptual hashes, without an
    all-pairs join: split each 64-bit hash into `blocks` contiguous bit
    blocks — a pair differing in at most `max_hamming` bits must agree on
    at least one block whenever `max_hamming < blocks` (pigeonhole: k
    flipped bits can touch at most k blocks). `blocks=None` (default)
    picks `max_hamming + 1`, making recall EXACT. Passing an explicit
    `blocks <= max_hamming` is allowed as a cost knob but recall becomes
    approximate: pairs whose differing bits hit every block are missed.
    Candidate pairs come from per-(block, value) buckets via the same
    in-bucket expansion the LSH/banding path uses (one aggregation
    shuffle, no self-join), verified by bit_count(xor) ≤ max_hamming.

    SCALE WARNING — block width bounds bucket count: a (64//blocks)-bit
    block has at most 2^(64//blocks) distinct values, so with many blocks
    (large max_hamming) bucket sizes grow linearly with the corpus and the
    in-bucket pair array goes quadratic (an 8×-stress OOM found exactly
    this at blocks=9 → 7-bit blocks → ≤128 buckets/block). Keep blocks ≤ 5
    (12-bit blocks) for large corpora.

    TRUNCATION CONTRACT — `max_bucket` (default 512, ON) bounds the pair
    stage: each (block, value) bucket is deterministically truncated to
    its first `max_bucket` members in ascending (media_id, phash) order
    BEFORE pair expansion, so per-bucket memory is ≤ C(max_bucket, 2)
    pair structs no matter how adversarial or duplicate-heavy the corpus
    is (an all-identical-hash corpus cannot OOM the stage — pinned in
    tests). The truncation is replayable by any SQL engine
    (ROW_NUMBER() OVER (PARTITION BY blk, bval ORDER BY media_id) ≤ K —
    the `image_near_dup_md5` oracle does exactly that), unlike a silent
    whole-bucket drop. When the cap binds, recall over hashes that share
    a saturated bucket becomes approximate (pairs among the first K
    members per bucket survive; later members only pair via their other,
    unsaturated blocks); audit the loss with `phash_bucket_stats`, which
    reports saturated buckets and members past the cap per block. Pass
    `max_bucket=None` to disable (exact, unbounded — small corpora only).
    """
    if blocks is None:
        blocks = max_hamming + 1
    block_rows = _phash_block_rows(hashes, blocks)
    buckets = (
        block_rows.groupBy("blk", "bval")
        .agg(F.sort_array(F.collect_set(F.struct("media_id", "phash"))).alias("_m"))
        .filter(F.size("_m") >= 2)
    )
    if max_bucket is not None:
        if max_bucket < 2:
            raise ValueError("max_bucket must be >= 2 (or None to disable)")
        # deterministic truncation: keep the first max_bucket members in
        # (media_id, phash) order — sort_array already ordered the struct
        # array, so this is a pure slice (see TRUNCATION CONTRACT above)
        buckets = buckets.withColumn("_m", F.slice(F.col("_m"), 1, max_bucket))
    pair_structs = F.flatten(
        F.transform(
            F.col("_m"),
            lambda a: F.transform(
                F.filter(F.col("_m"), lambda b: b["media_id"] > a["media_id"]),
                lambda b: F.struct(
                    a["media_id"].alias("id_a"), b["media_id"].alias("id_b"),
                    a["phash"].alias("ha"), b["phash"].alias("hb"),
                ),
            ),
        )
    )
    cand = (
        buckets.select(F.explode(pair_structs).alias("_p"))
        .select("_p.id_a", "_p.id_b", "_p.ha", "_p.hb")
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.select(
        "id_a", "id_b", hamming.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def phash_bucket_stats(
    hashes: DataFrame,
    max_hamming: int = 4,
    blocks: int | None = None,
    max_bucket: int | None = 512,
) -> DataFrame:
    """Audit companion to `phash_pairs` truncation: per block, how many
    (block, value) buckets exist, how many are saturated (size >
    max_bucket), and how many members sit past the cap (the ones whose
    pairs in THIS block are dropped by the truncation contract). Run it
    with the same (max_hamming, blocks, max_bucket) as the pairs call to
    quantify approximate-recall exposure before trusting a dedup sweep —
    `n_saturated = 0` everywhere means the pair output was exact.

    One aggregation shuffle over the same block rows as `phash_pairs`;
    output is `blocks` rows (driver-safe to collect)."""
    if blocks is None:
        blocks = max_hamming + 1
    cap = F.lit(max_bucket if max_bucket is not None else (1 << 62))
    sizes = (
        _phash_block_rows(hashes, blocks)
        .groupBy("blk", "bval")
        .agg(F.count_distinct("media_id", "phash").alias("sz"))
    )
    return (
        sizes.groupBy("blk")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("sz").alias("max_bucket_size"),
            F.sum((F.col("sz") > cap).cast("long")).alias("n_saturated"),
            F.sum(F.greatest(F.col("sz") - cap, F.lit(0))).alias("members_past_cap"),
        )
        .orderBy("blk")
    )
