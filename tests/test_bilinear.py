"""Bilinear sampler properties (reference Module/transformer.py semantics)."""

from __future__ import annotations

import numpy as np
import pytest

from ocr_spark.kernels.ocr import bilinear_resample, normalize_strip, render_line


def test_integer_downscale_of_replicated_upscale_is_exact():
    """Downscaling an s×-replicated image by s reproduces it exactly: every
    sample center falls inside a constant block (the property that makes
    switching the line detector to bilinear output-identical on clean
    integer-scaled fixtures)."""
    rng_free = (np.arange(48, dtype=np.float64).reshape(6, 8) % 7) / 7.0
    for s in (2, 3, 4):
        up = np.repeat(np.repeat(rng_free, s, axis=0), s, axis=1)
        down = bilinear_resample(up, 6, 8)
        np.testing.assert_allclose(down, rng_free, atol=1e-12)


def test_normalize_strip_bilinear_matches_nearest_on_integer_scale():
    strip, width = render_line("Hello123")
    content = strip[:, :width]
    for s in (2, 3):
        tall = np.repeat(np.repeat(content, s, axis=0), s, axis=1)
        near, w_n = normalize_strip(tall, mode="nearest")
        bil, w_b = normalize_strip(tall, mode="bilinear")
        assert w_n == w_b == width
        np.testing.assert_allclose(bil, near, atol=1e-12)


def test_non_integer_scale_interpolates_within_epsilon():
    """1.5× height: bilinear recovers the original within a small epsilon
    while preserving mass ordering (no aliasing dropouts)."""
    strip, width = render_line("XYZ9")
    content = strip[:, :width].astype(np.float64)
    h, w = content.shape
    up = bilinear_resample(content, int(h * 1.5), int(w * 1.5))
    back = bilinear_resample(up, h, w)
    assert np.abs(back - content).mean() < 0.2
    # structure preserved: lit cells stay brighter than dark cells on average
    assert back[content > 0.5].mean() > back[content < 0.5].mean() + 0.3


def test_bilinear_constant_image_invariant():
    img = np.full((5, 9), 0.37)
    out = bilinear_resample(img, 8, 13)
    np.testing.assert_allclose(out, 0.37, atol=1e-7)


@pytest.mark.parametrize("mode", ["nearest", "bilinear"])
def test_normalize_strip_geometry_contract(mode):
    """Width law ceil(8*w/h) and 384 pad hold for both samplers."""
    tall = np.ones((24, 60), dtype=np.float32)
    out, w = normalize_strip(tall, mode=mode)
    assert out.shape == (8, 384)
    assert w == int(np.ceil(8 * 60 / 24))


def test_upscale_border_edge_clamps():
    """Sample points outside the source grid must edge-clamp: the first
    output row/column of an upscale reproduces the border pixels instead
    of blending toward the interior (regression: clamping the second
    neighbor from the already-clipped first one)."""
    img = np.array([[1.0, 1.0], [0.0, 0.0]])
    out = bilinear_resample(img, 4, 2)
    np.testing.assert_allclose(out[:, 0], [1.0, 0.75, 0.25, 0.0], atol=1e-12)
    np.testing.assert_allclose(out[0], 1.0, atol=1e-12)
    np.testing.assert_allclose(out[-1], 0.0, atol=1e-12)
