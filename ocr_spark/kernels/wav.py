"""Pure-stdlib WAV (RIFF/PCM) codec: the REAL audio codec behind the
multimodal seam, companion to ``kernels.png``.

Supports canonical PCM WAV: 8-bit unsigned and 16-bit signed samples, any
channel count (channels are averaged to mono on decode — the analysis
operators are mono), any sample rate. Compressed/float formats raise
``ValueError`` — callers' malformed-payload discipline turns that into a
row skip, never a task crash. The reference consumes decoded media via
OpenCV-style arrays (``/root/reference/test_img.py:38-43``); this is the
audio analog with the container parse done in-engine.
"""

from __future__ import annotations

import struct

import numpy as np

WAV_MAGIC = b"RIFF"


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000, bits: int = 16
) -> bytes:
    """float array in [-1, 1] → mono PCM WAV bytes (16-bit by default)."""
    x = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    if bits == 16:
        data = (x * 32767.0).round().astype("<i2").tobytes()
        block, fmt_bits = 2, 16
    elif bits == 8:
        data = ((x * 127.0).round() + 128).astype(np.uint8).tobytes()
        block, fmt_bits = 1, 8
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    fmt = struct.pack(
        "<HHIIHH", 1, 1, sample_rate, sample_rate * block, block, fmt_bits
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
        # RIFF chunks are word-aligned: an odd-length data chunk (8-bit PCM,
        # odd sample count) carries a pad byte NOT counted in the chunk
        # length — third-party parsers walk on the aligned boundary
        + (b"\x00" if len(data) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes → (float32 mono samples in [-1, 1], sample_rate)."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + length]
        if len(body) < length:
            raise ValueError("truncated WAV chunk")
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            if length < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            raw = body
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, sample_rate, _rate, _block, bits = fmt
    if audio_format != 1:
        raise ValueError(f"unsupported WAV format {audio_format} (PCM only)")
    if channels < 1:
        raise ValueError("zero channels")
    if bits == 16:
        x = np.frombuffer(raw[: len(raw) - len(raw) % (2 * channels)], "<i2")
        # /32767 keeps the encoder round-trip exact; the one asymmetric
        # value -32768 (full-scale negative from a foreign encoder) would
        # land at ~-1.00003, so clamp to the documented [-1, 1] contract
        x = np.maximum(x.astype(np.float32) / 32767.0, -1.0)
    elif bits == 8:
        x = np.frombuffer(raw[: len(raw) - len(raw) % channels], np.uint8)
        x = (x.astype(np.float32) - 128.0) / 127.0
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    if channels > 1:
        x = x.reshape(-1, channels).mean(axis=1)
    return x.astype(np.float32), sample_rate
