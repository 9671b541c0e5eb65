"""Pure-stdlib PNG codec (zlib + struct): the REAL image codec behind the
multimodal seam.

The reference pipeline decodes real image files before detection
(``/root/reference/test_img.py:38-43``,
``DataPreprocess/DataGen.py:423-425`` via OpenCV); this container has no
image libraries, so the engine carries its own RFC-2083 implementation:

- ``encode_png``: 8-bit grayscale or RGB, non-interlaced, per-scanline
  filter 0, IDAT deflated at a caller-chosen zlib level (level 0 = stored
  blocks gives a closed-form byte size, which the media contract oracle
  exploits; level 6 for realistic fixtures).
- ``decode_png``: parses IHDR/IDAT/IEND, inflates, and reverses ALL five
  scanline filters (None/Sub/Up/Average/Paeth) — so it reads PNGs from any
  conforming encoder, not just its own. Supports bit depth 8, color types
  0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA); alpha is dropped. Interlaced
  (Adam7) and palette images raise ``ValueError`` — they never occur in
  this pipeline and a silent wrong decode would be worse than a skip (the
  callers' malformed-payload discipline turns the raise into a row skip).

Everything is vectorized NumPy except the inherently sequential
filter-reversal scan over scanlines (prior-row dependencies); within a
scanline the Sub/Paeth reversal walks pixels, so hot paths should prefer
filter-0 encodes (this module's own output) which decode at memcpy speed.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# decode-side resource cap: a crawl-scale corpus WILL contain hostile or
# corrupt headers (a 4-byte IHDR edit can declare a 2^31-wide image and
# OOM the executor before any payload-length check runs). Bound the
# declared raster, not the payload — 64 MP ≈ any real web image.
MAX_DECODE_PIXELS = 64_000_000


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """uint8 array (H, W) grayscale or (H, W, 3) RGB → PNG bytes.

    Filter 0 on every scanline: the deflate stream is then a pure function
    of the pixel bytes, and at ``level=0`` the total file size is the
    closed form ``8 + 25 + 12 + zlib_stored_size(H*(W*C+1)) + 12``.
    """
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError(f"encode_png wants uint8, got {img.dtype}")
    if img.ndim == 2:
        color_type, channels = 0, 1
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, channels = 2, 3
    else:
        raise ValueError(f"encode_png wants (H,W) or (H,W,3), got {img.shape}")
    h, w = img.shape[0], img.shape[1]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # prepend the filter-type byte (0) to each scanline
    raw = np.empty((h, w * channels + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img.reshape(h, w * channels)
    idat = zlib.compress(raw.tobytes(), level)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def zlib_stored_size(n: int) -> int:
    """Byte size of ``zlib.compress(data, 0)`` for ``len(data) == n`` —
    fixed by the deflate stored-block framing: 2-byte zlib header, a
    5-byte block header per 65535-byte block, the raw bytes, 4-byte
    adler32. The closed form the media contract oracle mirrors in SQL."""
    blocks = max(1, -(-n // 65535))
    return 2 + 5 * blocks + n + 4


def png_size_level0(h: int, w: int, channels: int = 1) -> int:
    """Exact ``len(encode_png(img, level=0))`` for an h×w image."""
    return 8 + 25 + 12 + zlib_stored_size(h * (w * channels + 1)) + 12


def _unfilter(raw: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """Reverse per-scanline filtering: raw [h, 1+w*bpp] → pixels [h, w*bpp].

    Fast path: a file whose every scanline uses filter 0 (this module's
    own encoder, and most screenshot-style tools at low effort) decodes
    as a single slice — no per-row scan. Only mixed/nonzero filters pay
    the sequential reversal."""
    stride = w * bpp
    if not raw[:, 0].any():
        return raw[:, 1:].copy()
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int64)
        prior = out[y - 1].astype(np.int64) if y > 0 else np.zeros(stride, np.int64)
        if ftype == 0:  # None
            rec = line
        elif ftype == 1:  # Sub
            rec = line.copy()
            for x in range(bpp, stride):
                rec[x] = (rec[x] + rec[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            rec = (line + prior) & 0xFF
        elif ftype == 3:  # Average
            rec = line.copy()
            for x in range(stride):
                left = rec[x - bpp] if x >= bpp else 0
                rec[x] = (rec[x] + ((left + prior[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            rec = line.copy()
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prior[x]
                c = prior[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = rec.astype(np.uint8)
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (H, W) for grayscale, (H, W, 3) for color.

    Alpha channels are dropped. Raises ``ValueError`` on anything that is
    not an 8-bit non-interlaced gray/RGB(A) PNG."""
    if not data.startswith(PNG_MAGIC):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    w = h = None
    color_type = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length
        if tag == b"IHDR":
            if len(body) != 13:
                # struct.unpack on a short body raises struct.error, which
                # is NOT in the callers' skip-never-crash catch set
                raise ValueError(f"bad IHDR length {len(body)}")
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            # zero-width/height rasters are legitimate degenerate images
            # (the engine's own zero-width line strips encode as w=0);
            # each DIMENSION is bounded too, not just the product — a
            # 0×2^31 header would otherwise still buy a giant scanline
            # allocation via the +1 filter byte per row
            if w > 1 << 20 or h > 1 << 20 or w * h > MAX_DECODE_PIXELS:
                raise ValueError(f"refusing {w}x{h} raster (hostile header?)")
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color_type not in (0, 2, 4, 6):
                raise ValueError(f"unsupported color type {color_type}")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("truncated PNG (no IHDR/IDAT)")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    expect = h * (1 + w * channels)
    # bounded inflate: a decompression bomb (tiny deflate stream, huge
    # expansion) must not allocate past the declared raster size
    decompressor = zlib.decompressobj()
    inflated = decompressor.decompress(bytes(idat), expect + 1)
    raw = np.frombuffer(inflated, dtype=np.uint8)
    if raw.size != expect:
        raise ValueError(f"bad IDAT size {raw.size}, want {expect}")
    pixels = _unfilter(raw.reshape(h, 1 + w * channels), h, w, channels)
    img = pixels.reshape(h, w, channels)
    if color_type == 0:
        return img[:, :, 0]
    if color_type == 4:
        return img[:, :, 0]  # gray + alpha → gray
    return img[:, :, :3]  # RGB / RGBA → RGB


def png_to_gray_float(payload: bytes) -> np.ndarray:
    """PNG bytes → float32 grayscale raster in [0, 1] (color reduced to
    luma by channel mean). THE shared post-decode normalization — both the
    media decode seam (``operators.multimodal.decode_image``) and the
    embedded-line parser (``operators.pipeline._lines_of_doc``) go through
    here, so luma/normalization semantics cannot diverge between the two
    paths. Raises ``ValueError`` on anything ``decode_png`` rejects."""
    img = decode_png(payload)
    if img.ndim == 3:
        img = img.mean(axis=2)
    return (img / 255.0).astype(np.float32)
