"""Real-codec (PIL) path of decode_image (multimodal.py).

PIL is NOT installed in the driver container and cannot be added (no pip
allowed), so the decode tests here are skip-marked on import failure and
run green in any environment that has Pillow (`pytest tests/
test_real_codec.py` after `pip install pillow` elsewhere). The PNG
fixture is generated with the STDLIB ONLY (zlib + struct), so the test
exercises PIL against a real container format, not a PIL-round-tripped
one. What DOES run here, always: the NotImplementedError guard contract
when PIL is absent.
"""

import struct
import zlib

import pytest

from commerce_data_pipeline_spark.operators import multimodal as MM

try:
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except ImportError:
    HAVE_PIL = False


def make_gray_png(pixels: list[list[int]]) -> bytes:
    """Minimal 8-bit grayscale PNG writer (pure stdlib): IHDR + IDAT +
    IEND, no filter (filter byte 0 per scanline)."""
    h = len(pixels)
    w = len(pixels[0])

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit, grayscale
    raw = b"".join(b"\x00" + bytes(row) for row in pixels)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


PIXELS = [[0, 64, 128, 255], [255, 192, 96, 1], [7, 7, 7, 7]]  # 4x3


def test_require_pil_contract():
    """In a PIL-less container the real-codec path must fail loudly at
    plan-build time with NotImplementedError (not inside an executor);
    with PIL present it must not raise."""
    if HAVE_PIL:
        MM._require_pil()
    else:
        with pytest.raises(NotImplementedError, match="PIL"):
            MM._require_pil()


@pytest.mark.skipif(not HAVE_PIL, reason="Pillow not installed in this container")
def test_decode_real_reads_stdlib_png():
    png = make_gray_png(PIXELS)
    flat, w, h = MM._decode_real(png)
    assert (w, h) == (4, 3)
    want = [v / 255.0 for row in PIXELS for v in row]
    assert [pytest.approx(v, abs=1e-6) for v in want] == list(flat)


@pytest.mark.skipif(not HAVE_PIL, reason="Pillow not installed in this container")
def test_decode_image_real_codec_through_spark(spark):
    """decode_image(use_real_codec=True) end-to-end: real PNG payloads in
    a media frame, PIL decode inside mapInPandas, pixel values and the
    declared (width, height) vs container-derived dims both checked."""
    from pyspark.sql import functions as F

    png = make_gray_png(PIXELS)
    media = spark.createDataFrame(
        [(1, "image", bytearray(png), (4, 3, 1, 0, 40, "png"))],
        MM.MEDIA_SCHEMA,
    )
    row = MM.decode_image(media, use_real_codec=True).first()
    assert (row["width"], row["height"]) == (4, 3)
    want = [v / 255.0 for row_ in PIXELS for v in row_]
    assert [pytest.approx(v, abs=1e-6) for v in want] == list(row["pixels"])
    # and the stub path still runs on the same frame (shape parity)
    stub = MM.decode_image(media, use_real_codec=False).first()
    assert len(stub["pixels"]) == len(want)


@pytest.mark.skipif(not HAVE_PIL, reason="Pillow not installed in this container")
def test_decode_and_phash_equivalence_on_real_png(spark):
    """Fused decode→pHash (production) must equal phash-of-decode_image
    composition on a REAL decoded image, pinning that the fusion is an
    optimization, not a semantic fork."""
    import numpy as np

    png = make_gray_png(PIXELS)
    flat, w, h = MM._decode_real(png)
    # reference hash computed directly from the real decoded pixels via
    # the same float-DCT construction decode_and_phash documents
    img = np.asarray(flat, dtype="float64").reshape(h, w)
    want = MM._phash_one(img, MM._dct_basis(32), 8)

    media = spark.createDataFrame(
        [(1, "image", bytearray(png), (4, 3, 1, 0, 40, "png"))],
        MM.MEDIA_SCHEMA,
    )
    got = MM.decode_and_phash(media, use_real_codec=True).first()["phash"]
    assert got == want
