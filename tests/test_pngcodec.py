"""PNG codec (functions/pngcodec.py) + real image decode path in
multimodal operators."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from breweries_etl_spark.functions import pngcodec
from breweries_etl_spark.operators import multimodal


rng = np.random.default_rng(7)


@pytest.mark.parametrize("shape", [(5, 3), (4, 7, 3), (6, 2, 4)])
def test_roundtrip(shape):
    pixels = rng.integers(0, 256, size=shape, dtype=np.uint8)
    decoded = pngcodec.decode_png(pngcodec.encode_png(pixels))
    expected = pixels[:, :, None] if pixels.ndim == 2 else pixels
    assert np.array_equal(decoded, expected)


def _png_with_filters(pixels: np.ndarray, filters: list[int]) -> bytes:
    """Re-encode gray pixels using the given per-row filter types —
    exercises the decoder against what standard encoders emit."""
    h, w = pixels.shape
    rows = []
    prev = np.zeros(w, dtype=np.int16)
    for y, ftype in zip(range(h), filters):
        cur = pixels[y].astype(np.int16)
        if ftype == 0:
            enc = cur
        elif ftype == 1:
            enc = cur.copy()
            enc[1:] = (cur[1:] - cur[:-1]) % 256
        elif ftype == 2:
            enc = (cur - prev) % 256
        elif ftype == 3:
            left = np.concatenate([[0], cur[:-1]])
            enc = (cur - ((left + prev) >> 1)) % 256
        elif ftype == 4:
            enc = cur.copy()
            for x in range(w):
                a = int(cur[x - 1]) if x else 0
                b = int(prev[x])
                c = int(prev[x - 1]) if x else 0
                enc[x] = (int(cur[x]) - pngcodec._paeth(a, b, c)) % 256
        rows.append(bytes([ftype]) + bytes(enc.astype(np.uint8)))
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + pngcodec._chunk(b"IHDR", ihdr)
        + pngcodec._chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + pngcodec._chunk(b"IEND", b"")
    )


def test_decode_all_filter_types():
    pixels = rng.integers(0, 256, size=(5, 9), dtype=np.uint8)
    data = _png_with_filters(pixels, [0, 1, 2, 3, 4])
    assert np.array_equal(pngcodec.decode_png(data)[:, :, 0], pixels)


def test_resize_nearest_integer_grid():
    pixels = np.arange(64, dtype=np.uint8).reshape(8, 8)
    small = pngcodec.resize_nearest(pixels, 4, 4)
    # source index floor(dst*src/dst): rows/cols 0,2,4,6
    assert np.array_equal(small, pixels[::2, ::2])


def test_decode_rejects_non_png_and_bad_variants():
    with pytest.raises(ValueError, match="signature"):
        pngcodec.decode_png(b"JFIF....")
    # 16-bit PNG is out of scope: build a header claiming depth 16
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + pngcodec._chunk(b"IHDR", ihdr)
        + pngcodec._chunk(b"IDAT", zlib.compress(b"\x00" * 10))
        + pngcodec._chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported"):
        pngcodec.decode_png(data)


def test_decode_image_and_resize_image_png_path():
    pixels = rng.integers(0, 256, size=(10, 6, 3), dtype=np.uint8)
    payload = pngcodec.encode_png(pixels)
    assert np.array_equal(multimodal.decode_image(payload), pixels)
    resized = multimodal.resize_image(payload, 3, 5)
    assert np.array_equal(
        pngcodec.decode_png(resized), pngcodec.resize_nearest(pixels, 3, 5)
    )


def test_decode_image_non_png_still_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\xff\xd8\xff\xe0 jpeg-ish")


def test_image_stats_end_to_end(spark):
    docs = spark.createDataFrame([(i,) for i in (1, 2, 300)], "doc_id long")
    assets = multimodal.synthetic_image_assets(docs, width=4, height=4)
    rows = {r["asset_id"]: r for r in multimodal.image_stats(assets).collect()}
    for d in (1, 2, 300):
        expected = sum(
            (d * 31 + x * 7 + y * 13) % 256 for x in range(4) for y in range(4)
        )
        r = rows[d]
        assert (r["width"], r["height"], r["channels"]) == (4, 4, 1)
        assert r["sum_pixels"] == expected
        assert r["mean_pixel"] == round(expected / 16, 6)


def test_image_stats_resized(spark):
    docs = spark.createDataFrame([(9,)], "doc_id long")
    assets = multimodal.synthetic_image_assets(docs, width=4, height=4)
    r = multimodal.image_stats(assets, resize_to=(2, 2)).collect()[0]
    expected = sum((9 * 31 + x * 7 + y * 13) % 256 for x in (0, 2) for y in (0, 2))
    assert r["sum_pixels"] == expected
    assert (r["width"], r["height"]) == (2, 2)
