"""PNG codec: roundtrips, foreign-encoder filters, malformed inputs, and
the closed-form level-0 size the media contract oracle relies on."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from ocr_spark.kernels.png import (
    PNG_MAGIC,
    decode_png,
    encode_png,
    png_size_level0,
)


def _rng():
    return np.random.default_rng(42)


@pytest.mark.parametrize("shape", [(8, 384), (1, 1), (17, 23), (16, 16, 3)])
@pytest.mark.parametrize("level", [0, 6, 9])
def test_roundtrip(shape, level):
    img = _rng().integers(0, 256, shape, dtype=np.uint8)
    out = decode_png(encode_png(img, level))
    assert out.shape == img.shape
    assert (out == img).all()


@pytest.mark.parametrize("shape", [(8, 384), (3, 7), (16, 16, 3)])
def test_level0_size_closed_form(shape):
    img = _rng().integers(0, 256, shape, dtype=np.uint8)
    c = 1 if img.ndim == 2 else 3
    assert len(encode_png(img, 0)) == png_size_level0(
        shape[0], shape[1], c
    )


def _chunk(tag, body):
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _foreign_png(img: np.ndarray, ftype: int) -> bytes:
    """Grayscale PNG written with a NON-zero scanline filter, as another
    encoder might choose — our encoder never emits these, so decoding them
    proves the unfilter path, not a self-roundtrip."""
    h, w = img.shape
    rows = []
    prev = np.zeros(w, np.int64)
    for y in range(h):
        line = img[y].astype(np.int64)
        f = line.copy()
        if ftype == 1:
            f[1:] = (line[1:] - line[:-1]) & 0xFF
        elif ftype == 2:
            f = (line - prev) & 0xFF
        elif ftype == 3:
            for x in range(w):
                left = line[x - 1] if x > 0 else 0
                f[x] = (line[x] - ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:
            for x in range(w):
                a = line[x - 1] if x > 0 else 0
                b = prev[x]
                c = prev[x - 1] if x > 0 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                f[x] = (line[x] - pred) & 0xFF
        rows.append(bytes([ftype]) + bytes(f.astype(np.uint8)))
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(rows), 6))
        + _chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [1, 2, 3, 4])
def test_decode_foreign_filters(ftype):
    img = _rng().integers(0, 256, (9, 13), dtype=np.uint8)
    assert (decode_png(_foreign_png(img, ftype)) == img).all()


def test_rgba_alpha_dropped():
    h, w = 4, 5
    rgba = _rng().integers(0, 256, (h, w, 4), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), rgba.reshape(h, w * 4)], axis=1
    )
    data = (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )
    assert (decode_png(data) == rgba[:, :, :3]).all()


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:20],  # truncated mid-IHDR
        lambda b: b"JPEG" + b[4:],  # bad signature
        lambda b: b[:40] + b"\x00" * (len(b) - 40),  # zeroed IDAT
    ],
)
def test_malformed_raises_value_error(mutate):
    img = _rng().integers(0, 256, (8, 8), dtype=np.uint8)
    with pytest.raises((ValueError, zlib.error)):
        decode_png(mutate(encode_png(img)))


def test_decode_image_seam_sniffs_png():
    from ocr_spark.operators.multimodal import decode_image

    img = _rng().integers(0, 256, (8, 12), dtype=np.uint8)
    out = decode_image(encode_png(img), 999, 999)  # advisory meta lies
    assert out.shape == (8, 12)  # IHDR wins
    assert np.allclose(out, img / 255.0)
    # non-PNG payloads keep the deterministic stub
    fake = decode_image(b"not a png", 4, 4)
    assert fake.shape == (4, 4)


# ---- hostile-input hardening: a crawl corpus WILL contain these ----

from hypothesis import given, settings
from hypothesis import strategies as st


def test_hostile_ihdr_dimensions_rejected_before_allocation():
    """A 4-byte header edit declaring a 2^31-wide image must raise, not
    attempt the allocation (executor-OOM vector at corpus scale)."""
    img = np.zeros((4, 4), dtype=np.uint8)
    data = bytearray(encode_png(img))
    struct.pack_into(">I", data, 16, 2**31 - 1)  # IHDR width field
    with pytest.raises(ValueError):
        decode_png(bytes(data))


def test_decompression_bomb_bounded():
    """A tiny IDAT that inflates far past the declared raster must fail
    the size check, not balloon memory."""
    bomb = zlib.compress(b"\x00" * 10_000_000, 9)  # ~10 KB → 10 MB
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    data = (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", bomb)
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(data)


@settings(max_examples=80, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_fuzz_random_bytes_never_crash_differently(data):
    """Arbitrary bytes: decode either raises the documented exceptions or
    returns a valid raster — nothing else escapes to the caller."""
    try:
        out = decode_png(PNG_MAGIC + data)
        assert out.dtype == np.uint8
    except (ValueError, zlib.error):
        pass


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=8, max_value=200),
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=0, max_value=199),
)
def test_fuzz_mutated_valid_png(cut, byte, pos):
    """Truncations and single-byte corruptions of a valid file: decode
    raises the documented exceptions or returns a raster (CRC is not
    validated by design — a flipped pixel byte still decodes)."""
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    data = bytearray(encode_png(img))
    data[min(pos, len(data) - 1)] ^= byte
    try:
        decode_png(bytes(data[:cut]))
    except (ValueError, zlib.error):
        pass


def test_bad_ihdr_length_raises_value_error_not_struct_error():
    """A chunk header declaring a non-13-byte IHDR must raise ValueError —
    struct.error is not in the callers' skip-never-crash catch set."""
    ihdr5 = struct.pack(">IB", 16, 0)  # 5-byte body
    data = PNG_MAGIC + _chunk(b"IHDR", ihdr5) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        decode_png(data)


def test_zero_dim_rasters_pool_to_zero_feature():
    """Degenerate (0-width / 0-height) PNGs flow through the feature path
    as all-zero features — no crash, no NaN poison."""
    from ocr_spark.operators.multimodal import _pool_bands, decode_image

    for shape in [(8, 0), (0, 8)]:
        img = decode_image(encode_png(np.zeros(shape, np.uint8)), 16, 16)
        feat = _pool_bands(img)
        assert feat.shape == (16,)
        assert not np.isnan(feat).any()
        assert (feat == 0).all()
