"""Wild-encoder PNG coverage: palette (PLTE/tRNS), sub-byte depths,
16-bit samples, and Adam7 interlace — the container shapes a real crawl's
image payloads actually carry (round-4 VERDICT missing #1).

The fixtures are built by an INDEPENDENT encoder written here (forward
Adam7 split, bit packing, forward filters), so these are differential
tests of ``decode_png``, not self-roundtrips. Reference semantics:
RFC 2083 / the PNG spec; the engine's reference analog accepts whatever
``cv2.imread`` accepts (``/root/reference/test_img.py:38-43``).
"""

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

_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _rng(seed=0):
    return np.random.default_rng(seed)


def _chunk(tag, body):
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _pack_row(vals: np.ndarray, depth: int) -> bytes:
    """One scanline of per-sample values → packed bytes (MSB-first)."""
    if depth == 8:
        return vals.astype(np.uint8).tobytes()
    if depth == 16:
        return vals.astype(">u2").tobytes()
    bits = (
        (vals[:, None].astype(np.uint16) >> np.arange(depth - 1, -1, -1)) & 1
    ).astype(np.uint8).ravel()
    return np.packbits(bits).tobytes()


def _filter_row(line: bytes, prev: bytes, ftype: int, bpp: int) -> bytes:
    """Forward (encoder-side) scanline filter, independent of the codec."""
    cur = np.frombuffer(line, np.uint8).astype(np.int64)
    pri = np.frombuffer(prev, np.uint8).astype(np.int64)
    out = cur.copy()
    for x in range(len(cur)):
        a = cur[x - bpp] if x >= bpp else 0
        b = pri[x]
        c = pri[x - bpp] if x >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[x] = (cur[x] - pred) & 0xFF
    return bytes(out.astype(np.uint8))


def _wild_png(
    samples: np.ndarray,
    depth: int,
    color_type: int,
    palette: np.ndarray | None = None,
    trns: bytes | None = None,
    interlace: int = 0,
    ftype=0,
) -> bytes:
    """Arbitrary-shape PNG builder: ``samples`` is (H, W) for 1-channel
    types or (H, W, C); values are sample-depth-scaled already. ``ftype``
    may be an int or a callable(row_index) for mixed filters."""
    if samples.ndim == 2:
        samples = samples[:, :, None]
    h, w, channels = samples.shape
    bpp = max(1, depth * channels // 8)
    stream = bytearray()
    passes = (
        [(slice(None), slice(None))]
        if interlace == 0
        else [
            (slice(y0, None, ys), slice(x0, None, xs))
            for x0, y0, xs, ys in _ADAM7
        ]
    )
    for sel in passes:
        sub = samples[sel[0], sel[1]]
        ph, pw = sub.shape[0], sub.shape[1]
        if not ph or not pw:
            continue
        prev = b"\x00" * len(_pack_row(sub[0].ravel(), depth))
        for y in range(ph):
            line = _pack_row(sub[y].ravel(), depth)
            ft = ftype(y) if callable(ftype) else ftype
            stream.append(ft)
            stream.extend(_filter_row(line, prev, ft, bpp))
            prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    out = PNG_MAGIC + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", np.asarray(palette, np.uint8).tobytes())
    if trns is not None:
        out += _chunk(b"tRNS", trns)
    out += _chunk(b"IDAT", zlib.compress(bytes(stream), 6))
    out += _chunk(b"IEND", b"")
    return out


# ---------------------------------------------------------------------------
# Palette
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_palette8_decodes_to_palette_rgb(ftype):
    rng = _rng(1)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (11, 17), dtype=np.uint8)
    out = decode_png(_wild_png(idx, 8, 3, palette=pal, ftype=ftype))
    assert out.shape == (11, 17, 3)
    assert (out == pal[idx]).all()


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_palette_subbyte_depths_unaligned_width(depth):
    """Sub-byte palette indices with a width that does NOT fill the last
    byte of each scanline — the padding-bit handling differential."""
    rng = _rng(depth)
    n = 1 << depth
    pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    idx = rng.integers(0, n, (7, 13), dtype=np.uint8)
    out = decode_png(_wild_png(idx, depth, 3, palette=pal))
    assert (out == pal[idx]).all()


def test_small_palette_and_trns_ignored():
    """A 5-entry PLTE plus a tRNS transparency chunk: the alpha is
    dropped per the opaque-raster contract, the colors map exactly."""
    pal = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9], [250, 251, 252]],
        dtype=np.uint8,
    )
    idx = (np.arange(6 * 10, dtype=np.uint8) % 5).reshape(6, 10)
    png = _wild_png(idx, 8, 3, palette=pal, trns=bytes([0, 128, 255]))
    assert (decode_png(png) == pal[idx]).all()


def test_palette_index_out_of_range_rejected():
    pal = np.zeros((4, 3), dtype=np.uint8)
    idx = np.full((3, 3), 4, dtype=np.uint8)  # index 4 >= 4 entries
    with pytest.raises(ValueError, match="palette index"):
        decode_png(_wild_png(idx, 8, 3, palette=pal))


def test_palette_without_plte_rejected():
    idx = np.zeros((3, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="PLTE"):
        decode_png(_wild_png(idx, 8, 3, palette=None))


def test_bad_plte_length_rejected():
    idx = np.zeros((3, 3), dtype=np.uint8)
    png = bytearray(_wild_png(idx, 8, 3, palette=np.zeros((4, 3), np.uint8)))
    i = bytes(png).index(b"PLTE")
    # shrink the declared PLTE length to 11 (not a multiple of 3)
    struct.pack_into(">I", png, i - 4, 11)
    with pytest.raises(ValueError):
        decode_png(bytes(png))


def test_encode_png_palette_roundtrip_and_size():
    rng = _rng(9)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, (8, 21), dtype=np.uint8)
    png = encode_png(idx, level=0, palette=pal)
    assert (decode_png(png) == pal[idx]).all()
    # closed form: gray level-0 size + the PLTE chunk (12 + 3*256)
    assert len(png) == png_size_level0(8, 21) + 12 + 768


# ---------------------------------------------------------------------------
# Sub-byte / 16-bit grayscale and 16-bit color
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_gray_subbyte_rescaled(depth):
    rng = _rng(20 + depth)
    hi = (1 << depth) - 1
    vals = rng.integers(0, hi + 1, (9, 11), dtype=np.uint8)
    out = decode_png(_wild_png(vals, depth, 0))
    expect = (vals.astype(np.uint16) * 255 // hi).astype(np.uint8)
    assert (out == expect).all()


def test_gray16_msb_taken():
    rng = _rng(31)
    vals = rng.integers(0, 1 << 16, (6, 7), dtype=np.uint32)
    out = decode_png(_wild_png(vals, 16, 0))
    assert (out == (vals >> 8).astype(np.uint8)).all()


@pytest.mark.parametrize("ftype", [0, 2, 4])
def test_rgb16_msb_taken(ftype):
    rng = _rng(32)
    vals = rng.integers(0, 1 << 16, (5, 6, 3), dtype=np.uint32)
    out = decode_png(_wild_png(vals, 16, 2, ftype=ftype))
    assert (out == (vals >> 8).astype(np.uint8)).all()


# ---------------------------------------------------------------------------
# Adam7 interlace
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "shape", [(1, 1), (2, 3), (5, 5), (8, 8), (9, 13), (16, 17), (33, 7)]
)
def test_adam7_gray_equals_source(shape):
    img = _rng(hash(shape) % 2**31).integers(0, 256, shape, dtype=np.uint8)
    assert (decode_png(_wild_png(img, 8, 0, interlace=1)) == img).all()


def test_adam7_rgb_mixed_filters():
    rng = _rng(44)
    img = rng.integers(0, 256, (12, 10, 3), dtype=np.uint8)
    png = _wild_png(img, 8, 2, interlace=1, ftype=lambda y: (y * 3) % 5)
    assert (decode_png(png) == img).all()


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_adam7_palette_subbyte(depth):
    """Interlace + palette + sub-byte packing in one container — the
    worst realistic combination (old GIF-converted web PNGs)."""
    rng = _rng(50 + depth)
    n = 1 << depth
    pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    idx = rng.integers(0, n, (13, 11), dtype=np.uint8)
    png = _wild_png(idx, depth, 3, palette=pal, interlace=1)
    assert (decode_png(png) == pal[idx]).all()


def test_adam7_rgba_alpha_dropped():
    rng = _rng(60)
    img = rng.integers(0, 256, (9, 9, 4), dtype=np.uint8)
    out = decode_png(_wild_png(img, 8, 6, interlace=1))
    assert (out == img[:, :, :3]).all()


def test_adam7_truncated_pass_data_rejected():
    img = _rng(70).integers(0, 256, (16, 16), dtype=np.uint8)
    png = _wild_png(img, 8, 0, interlace=1)
    # re-deflate a truncated stream so the inflate succeeds but the
    # pass walk runs short
    i = png.index(b"IDAT")
    (ln,) = struct.unpack_from(">I", png, i - 4)
    raw = zlib.decompress(png[i + 4 : i + 4 + ln])
    short = zlib.compress(raw[: len(raw) // 2], 6)
    rebuilt = png[: i - 4] + _chunk(b"IDAT", short) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError):
        decode_png(rebuilt)


def test_unknown_interlace_method_rejected():
    img = np.zeros((4, 4), dtype=np.uint8)
    png = bytearray(_wild_png(img, 8, 0))
    i = bytes(png).index(b"IHDR")
    png[i + 4 + 12] = 2  # interlace byte
    with pytest.raises(ValueError, match="interlace"):
        decode_png(bytes(png))


def test_fuzz_wild_containers_fail_closed():
    """Single-byte corruption over palette/interlaced containers must
    either decode (cosmetic corruption) or raise ValueError — never any
    other exception (the callers' skip-never-crash catch set)."""
    rng = _rng(99)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (9, 9), dtype=np.uint8)
    for base in (
        _wild_png(idx, 4, 3, palette=pal, interlace=1),
        _wild_png(idx, 4, 3, palette=pal),
        _wild_png(rng.integers(0, 256, (8, 8), np.uint8), 8, 0, interlace=1),
    ):
        for _ in range(120):
            b = bytearray(base)
            b[rng.integers(8, len(b))] ^= 1 << rng.integers(0, 8)
            try:
                decode_png(bytes(b))
            except ValueError:
                pass


def test_encode_interlace_roundtrip_and_closed_form_size():
    """The engine's own Adam7 encoder round-trips through the
    de-interlacing decoder and its level-0 size follows the per-pass
    closed form (the media contract's oracle formula)."""
    from ocr_spark.kernels.png import zlib_stored_size

    rng = _rng(11)
    for h, w in [(8, 1), (8, 2), (8, 5), (8, 17), (8, 384), (1, 1),
                 (3, 9), (16, 16), (9, 9)]:
        img = rng.integers(0, 256, (h, w), np.uint8)
        b = encode_png(img, level=0, interlace=True)
        np.testing.assert_array_equal(decode_png(b), img)
        raw = 0
        for x0, y0, xs, ys in _ADAM7:
            pw = max(0, (w - x0 + xs - 1) // xs)
            ph = max(0, (h - y0 + ys - 1) // ys)
            if pw and ph:
                raw += ph * (pw + 1)
        assert len(b) == 8 + 25 + 12 + 12 + zlib_stored_size(raw), (h, w)
        # RGB interlace too
        img3 = rng.integers(0, 256, (h, w, 3), np.uint8)
        np.testing.assert_array_equal(
            decode_png(encode_png(img3, level=0, interlace=True)), img3
        )
