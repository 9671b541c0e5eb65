"""OCR line recognition: fixed-weight conv kernel + CTC decode.

Re-expresses the reference's recognition branch (CRNN encoder + decoder +
CTC greedy decode, ``/root/reference/Module/RecognitionBackbone.py:20-123``,
``Module/RecognitionLoss.py:33-38``) as a deterministic batched NumPy
kernel. The learned weights are out of scope (training is explicitly not
part of the extraction capability — SURVEY §2.11); what must be preserved is
the *computational shape*:

    strip [B, 8, 384] float32 (height 8, width padded to 384 — the
    reference's RoIRotate output geometry, ``Module/RRotateLayer.py:94-107``
    and ``DataGen.py:403``)
      → conv features per timestep (stride-4 windows)
      → logits [B, T=96, 95]
      → CTC greedy decode → text

The fixed weights form a matched filter over a deterministic glyph code:
char class ``c`` renders as an 8×4 bipolar pattern derived from the bits of
``c`` (94 classes < 2^7 plus a marker column). The conv weight matrix W has
one row per class = that class's bipolar template, so
``logits = X_windows @ W.T`` peaks at the true class (Hamming-distance
matched filter); an all-background window scores highest for blank. This
keeps the whole batch in two matmuls — the "no per-row Python" discipline —
and is exactly invertible for fixture round-trips while remaining a genuine
conv+CTC inference pipeline.
"""

from __future__ import annotations

import numpy as np

from ocr_spark.config import (
    BLANK_INDEX,
    CHAR_VECTOR,
    LINE_HEIGHT,
    MAX_LINE_WIDTH,
    NUM_CLASSES,
)
from ocr_spark.kernels.ctc import ctc_greedy_decode_batch

CHAR_WIDTH = 4  # columns per glyph; stride of the conv
MAX_CHARS = MAX_LINE_WIDTH // CHAR_WIDTH  # 96 timesteps


def _glyph(c: int) -> np.ndarray:
    """Deterministic 8×4 binary glyph for class index ``c``.

    Column 0 = all-ones marker; columns 1..3 carry the 7 index bits split
    across rows 0..6 (col1: bits 0-2 in rows 0-2, col2: bits 3-5, col3:
    bit 6 in row 0); row 7 is a parity row.
    """
    g = np.zeros((LINE_HEIGHT, CHAR_WIDTH), dtype=np.float32)
    g[:, 0] = 1.0
    bits = [(c >> k) & 1 for k in range(7)]
    g[0:3, 1] = bits[0:3]
    g[0:3, 2] = bits[3:6]
    g[0, 3] = bits[6]
    g[7, 1:4] = (sum(bits) % 2)
    return g


def _weight_matrix() -> np.ndarray:
    """Fixed conv weights: one bipolar matched-filter row per class.

    Row ``c`` = 2·glyph(c)−1 flattened (32 dims). Blank row = the bipolar
    all-background template (2·0−1 = −1 everywhere). An exact glyph window
    scores 32 for its class and < 32 for every other (Hamming > 0), so
    argmax reproduces the rendered class exactly.
    """
    W = np.empty((NUM_CLASSES, LINE_HEIGHT * CHAR_WIDTH), dtype=np.float32)
    for c in range(len(CHAR_VECTOR)):
        W[c] = (2.0 * _glyph(c) - 1.0).ravel()
    W[BLANK_INDEX] = -1.0  # background: all-zero window → max score
    return W


_W = _weight_matrix()


def render_line(text: str, pad_to: int = MAX_LINE_WIDTH) -> tuple[np.ndarray, int]:
    """Render text as an 8×pad_to float strip; returns (strip, true width).

    Out-of-vocabulary characters are skipped (the reference's encoding
    discipline, ``/root/reference/DataPreprocess/DataGen.py:28-45``); text
    longer than 96 chars is truncated (the pad-384 width cap,
    ``DataGen.py:511-527``).
    """
    idx = [CHAR_VECTOR.index(ch) for ch in text if ch in CHAR_VECTOR]
    # CTC alignment discipline: a background (blank) slot separates repeated
    # chars, otherwise greedy decode would collapse them (merge_repeated).
    slots: list[int] = []
    for c in idx:
        if slots and slots[-1] == c:
            slots.append(BLANK_INDEX)
        slots.append(c)
    slots = slots[:MAX_CHARS]
    width = len(slots) * CHAR_WIDTH
    strip = np.zeros((LINE_HEIGHT, pad_to), dtype=np.float32)
    for t, c in enumerate(slots):
        if c != BLANK_INDEX:
            strip[:, t * CHAR_WIDTH : (t + 1) * CHAR_WIDTH] = _glyph(c)
    return strip, width


def bilinear_resample(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear gather + lerp resampling to (out_h, out_w) — the
    deterministic NumPy re-expression of the reference's spatial-transformer
    sampler (``/root/reference/Module/transformer.py:95-160``: corner
    gather, fractional weights, weighted sum), with pixel-center alignment
    and edge clamping.

    Properties the tests pin down: downscaling an integer-replicated
    upscale reproduces the original exactly (every sample point falls
    inside a constant block), and non-integer scales interpolate instead
    of aliasing the way nearest-neighbor does.
    """
    h, w = img.shape
    img = np.asarray(img, dtype=np.float64)
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.floor(ys)
    x0 = np.floor(xs)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    # clamp BOTH neighbor indices from the unclipped floor: clamping y1
    # from the already-clipped y0 would blend the border row 75% toward
    # the interior for sample points beyond the edge instead of
    # edge-clamping (y0=-1 → y0i=0 must pair with y1i=0, not 1)
    y0i = np.clip(y0.astype(np.int64), 0, h - 1)
    y1i = np.clip(y0.astype(np.int64) + 1, 0, h - 1)
    x0i = np.clip(x0.astype(np.int64), 0, w - 1)
    x1i = np.clip(x0.astype(np.int64) + 1, 0, w - 1)
    top = img[y0i][:, x0i] * (1 - wx) + img[y0i][:, x1i] * wx
    bot = img[y1i][:, x0i] * (1 - wx) + img[y1i][:, x1i] * wx
    return (top * (1 - wy) + bot * wy).astype(np.float32)


def normalize_strip(
    strip: np.ndarray,
    target_h: int = LINE_HEIGHT,
    pad_to: int = MAX_LINE_WIDTH,
    mode: str = "nearest",
) -> tuple[np.ndarray, int]:
    """Resample an arbitrary-height line strip to height 8, width
    ``ceil(8·w/h)``, padded to 384 — the reference's RoIRotate geometry
    (``/root/reference/DataPreprocess/DataGen.py:338-356``,
    ``Module/RRotateLayer.py:94-107``). ``mode`` selects the sampler:
    ``"nearest"`` (integer gather) or ``"bilinear"``
    (``bilinear_resample``, the reference ``Module/transformer.py``
    semantics — required for non-integer scales, which nearest aliases).
    """
    h, w = strip.shape
    out_w = min(int(np.ceil(target_h * w / h)), pad_to)
    if mode == "bilinear":
        resampled = bilinear_resample(strip, target_h, out_w)
    else:
        ys = np.minimum(
            (np.arange(target_h) * h / target_h).astype(np.int64), h - 1
        )
        xs = np.minimum((np.arange(out_w) * w / out_w).astype(np.int64), w - 1)
        resampled = strip[np.ix_(ys, xs)].astype(np.float32)
    out = np.zeros((target_h, pad_to), dtype=np.float32)
    out[:, :out_w] = resampled
    return out, out_w


def line_logits(strips: np.ndarray) -> np.ndarray:
    """Batched conv forward pass: ``[B, 8, 384] → [B, 96, 95]`` logits.

    Stride-4 windowing is a reshape (no copy); the whole batch is one
    matmul — the Arrow-batch analog of the reference's RECOG_BATCH batched
    inference (``/root/reference/test_img.py:97-116``).
    """
    strips = np.asarray(strips, dtype=np.float32)
    if strips.ndim == 2:
        strips = strips[None]
    B, H, Wd = strips.shape
    T = Wd // CHAR_WIDTH
    # [B, H, T, CW] → [B, T, H*CW]
    windows = (
        strips.reshape(B, H, T, CHAR_WIDTH)
        .transpose(0, 2, 1, 3)
        .reshape(B, T, H * CHAR_WIDTH)
    )
    # bipolar input: logit_c = 32 − 2·Hamming(window, glyph_c) → the true
    # class is the strictly unique argmax (any other template differs in ≥1
    # cell); raw 0/1 input would tie on subset glyphs.
    windows = 2.0 * np.clip(windows, 0.0, 1.0) - 1.0
    return windows @ _W.T  # [B, T, NUM_CLASSES]


def recognize_lines(
    strips: np.ndarray, widths: np.ndarray | list[int]
) -> list[str]:
    """strips [B, 8, 384] + true widths → decoded texts (batched)."""
    logits = line_logits(strips)
    seq_lens = np.asarray(widths, dtype=np.int64) // CHAR_WIDTH
    return ctc_greedy_decode_batch(logits, seq_lens)
