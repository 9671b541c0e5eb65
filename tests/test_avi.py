"""AVI codec: roundtrips, malformed inputs, and the sample_frames seam."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_spark.kernels.avi import decode_avi, encode_avi


def _frames(n=5, h=8, w=13):
    return np.random.default_rng(3).integers(0, 256, (n, h, w), dtype=np.uint8)


@pytest.mark.parametrize("shape", [(1, 16, 16), (5, 8, 13), (3, 7, 1)])
def test_roundtrip(shape):
    f = np.random.default_rng(0).integers(0, 256, shape, dtype=np.uint8)
    got = decode_avi(encode_avi(f))
    assert len(got) == shape[0]
    assert all((a == b).all() for a, b in zip(f, got))


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:10],
        lambda b: b"RIFX" + b[4:],
        lambda b: b[:60],
        lambda b: b.replace(b"strf", b"xxxx"),
    ],
)
def test_malformed_raises(mutate):
    with pytest.raises(ValueError):
        decode_avi(mutate(encode_avi(_frames())))


def test_sample_frames_decodes_real_avi(spark):
    """Video rows carrying real AVI payloads explode into one row per
    sampled frame; frame count comes from the container, not the meta."""
    import pyspark.sql.functions as F

    from ocr_spark.operators.multimodal import sample_frames, synth_media

    media = synth_media(spark, n=12)  # 4 video rows, 16 frames each
    frames = sample_frames(media, every_n=4)
    rows = frames.collect()
    per = {}
    for r in rows:
        per.setdefault(r.media_id, []).append(r.frame_no)
    assert len(per) == 4
    assert all(sorted(v) == [0, 4, 8, 12] for v in per.values())
    # features are real raster pools, not constants
    assert frames.select(F.size("feature")).distinct().collect()[0][0] == 16


# ---- hostile-input fuzz ----

from hypothesis import given, settings
from hypothesis import strategies as st


def test_deep_list_nesting_rejected():
    """A crafted chain of nested LIST headers must raise, not blow the
    recursion limit (task-crash vector on a hostile crawl payload)."""
    import struct

    body = b"00db" + b"\x00" * 4
    for _ in range(64):
        body = b"LIST" + struct.pack("<I", len(body) + 4) + b"hdrl" + body
    data = b"RIFF" + struct.pack("<I", len(body) + 4) + b"AVI " + body
    with pytest.raises(ValueError):
        decode_avi(data)


@settings(max_examples=80, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_fuzz_random_avi_bytes(data):
    import struct

    blob = b"RIFF" + struct.pack("<I", len(data) + 4) + b"AVI " + data
    try:
        frames = decode_avi(blob)
        assert all(f.dtype == np.uint8 for f in frames)
    except ValueError:
        pass


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=12, max_value=400),
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=0, max_value=399),
)
def test_fuzz_mutated_valid_avi(cut, byte, pos):
    data = bytearray(encode_avi(_frames(2, 4, 5)))
    data[min(pos, len(data) - 1)] ^= byte
    try:
        decode_avi(bytes(data[:cut]))
    except ValueError:
        pass


def test_topdown_negative_biheight_decodes_upright():
    """strf biHeight < 0 = top-down rows (the other standard DIB
    orientation): frames must NOT be flipped."""
    import struct as _s

    frames = _frames(1, 4, 5)
    data = bytearray(encode_avi(frames))
    # our encoder writes bottom-up (positive biHeight); flip the stored
    # rows AND negate biHeight → identical logical image, top-down layout
    idx = bytes(data).index(b"strf")
    h_off = idx + 8 + 8  # strf tag + len + biSize + biWidth
    (h,) = _s.unpack_from("<i", data, h_off)
    _s.pack_into("<i", data, h_off, -h)
    db = bytes(data).index(b"00db")
    body = db + 8
    row = 4 * 5 // 5 * 5  # row_bytes = pad4(5*3) = 16
    row = 16
    frame = bytes(data[body : body + row * 4])
    flipped = b"".join(
        frame[r * row : (r + 1) * row] for r in reversed(range(4))
    )
    data[body : body + row * 4] = flipped
    got = decode_avi(bytes(data))
    assert (got[0] == frames[0]).all()
