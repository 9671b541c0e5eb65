"""Rotated/polygon geometry: clipping, IoU, quad NMS, rotated-layout fixtures.

The lanms semantics (``/root/reference/locality_aware_nms.py``,
``lanms/lanms.h:22-34``) re-derived in the quad domain: these suites pin
down intersection math against hand-computable cases and check the rotated
path degenerates exactly to the AABB path at angle 0.
"""

from __future__ import annotations

import numpy as np
import pytest

from ocr_spark.kernels.blocks import (
    box_iou,
    clip_polygon,
    nms_merge_blocks,
    nms_merge_quads,
    polygon_area,
    polygon_iou,
    quad_aabb,
    rect_to_quad,
    sort_quad,
    xy_cut_order,
)


def test_shoelace_area_square_and_orientation():
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], dtype=float)
    assert polygon_area(sq) == pytest.approx(4.0)
    assert polygon_area(sq[::-1]) == pytest.approx(-4.0)


def test_clip_identical_squares():
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], dtype=float)
    inter = clip_polygon(sq, sq)
    assert abs(polygon_area(inter)) == pytest.approx(4.0)


def test_clip_offset_squares_quarter_overlap():
    a = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], dtype=float)
    b = a + [1.0, 1.0]
    inter = clip_polygon(a, b)
    assert abs(polygon_area(inter)) == pytest.approx(1.0)
    assert polygon_iou(a, b) == pytest.approx(1.0 / 7.0)


def test_rotated_45_square_iou_known_value():
    """Unit square vs itself rotated 45° about its center: intersection is
    a regular octagon of area 2(√2−1); union = 2 − that."""
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
    rot = rect_to_quad(np.array([0, 0, 1, 1.0]), angle=np.pi / 4)
    inter = 2.0 * (np.sqrt(2.0) - 1.0)
    expect = inter / (2.0 - inter)
    assert polygon_iou(sq, rot) == pytest.approx(expect, abs=1e-9)


def test_disjoint_polygons_iou_zero():
    a = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
    b = a + [5.0, 0.0]
    assert polygon_iou(a, b) == 0.0


@pytest.mark.parametrize("angle", [0.3, -0.3, 0.7])
def test_iou_rotation_invariance(angle):
    """Rotating BOTH polygons by the same angle preserves IoU."""
    a = rect_to_quad(np.array([0, 0, 4, 2.0]))
    b = rect_to_quad(np.array([1, 0.5, 5, 2.5]))
    base = polygon_iou(a, b)
    c, s = np.cos(angle), np.sin(angle)
    rot = np.array([[c, -s], [s, c]])
    assert polygon_iou(a @ rot.T, b @ rot.T) == pytest.approx(base, abs=1e-9)


def test_sort_quad_canonicalization():
    q = rect_to_quad(np.array([2, 3, 6, 5.0]), angle=0.2)
    for shift in range(4):
        rolled = np.roll(q, shift, axis=0)
        np.testing.assert_allclose(sort_quad(rolled), sort_quad(q))


def test_quad_nms_matches_aabb_nms_at_angle_zero():
    """Differential: with axis-aligned quads, nms_merge_quads must keep the
    same members and equivalent geometry as nms_merge_blocks."""
    boxes = np.array(
        [
            [0, 0, 10, 4],
            [0.5, 0.2, 10.5, 4.2],  # near-dup of block 0 → merges
            [20, 0, 30, 4],
            [0, 10, 10, 14],
        ],
        dtype=float,
    )
    scores = np.array([0.9, 0.8, 0.7, 0.6])
    kb, ks, km = nms_merge_blocks(boxes, scores, thres=0.3)
    quads = np.stack([rect_to_quad(b) for b in boxes])
    kq, qs, qm = nms_merge_quads(quads, scores, thres=0.3)
    assert km == qm
    np.testing.assert_allclose(qs, ks)
    np.testing.assert_allclose(quad_aabb(kq), kb, atol=1e-12)


def test_rotated_near_duplicates_merge_where_aabb_would_not():
    """The case AABB gets wrong: two thin 45°-rotated boxes on the same
    diagonal overlap heavily as polygons (merge) while a third parallel
    offset one does not — AABB IoU sees all three as similar overlaps."""
    base = np.array([0, 4, 10, 6.0])  # thin strip
    q1 = rect_to_quad(base, angle=np.pi / 4)
    q2 = rect_to_quad(base + [0.3, 0.3, 0.3, 0.3], angle=np.pi / 4)
    q3 = rect_to_quad(base + [2.5, -2.5, 2.5, -2.5], angle=np.pi / 4)
    assert polygon_iou(q1, q2) > 0.3  # true near-dup
    assert polygon_iou(q1, q3) < 0.1  # parallel diagonal, near-disjoint
    # but their AABBs overlap substantially — the axis-aligned metric lies
    a1, a3 = quad_aabb(np.stack([q1, q3]))
    assert box_iou(a1, a3) > 0.3
    _, _, members = nms_merge_quads(
        np.stack([q1, q2, q3]), np.array([0.9, 0.8, 0.7]), thres=0.3
    )
    assert members == [[0, 1], [2]]


def test_rotated_layout_reading_order_fixture():
    """A rotated two-column page: quad NMS dedups within columns, AABB
    hulls + XY-cut give column-major reading order."""
    rows = []
    for col, x in enumerate((0.0, 30.0)):
        for line in range(3):
            y = 10.0 * line
            rows.append((col, line, np.array([x, y, x + 20.0, y + 4.0])))
    quads = np.stack(
        [rect_to_quad(b, angle=0.15) for _, _, b in rows]
    )
    scores = np.full(len(rows), 0.9)
    kept, _, members = nms_merge_quads(quads, scores, thres=0.3)
    assert len(kept) == len(rows)  # nothing spuriously merged
    order = xy_cut_order(quad_aabb(kept), min_gap=1.0)
    labels = [(rows[members[i][0]][0], rows[members[i][0]][1]) for i in order]
    assert labels == [(0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (1, 2)]


def test_convex_hull_square_with_interior_points():
    from ocr_spark.kernels.blocks import convex_hull

    pts = np.array(
        [[0, 0], [4, 0], [4, 4], [0, 4], [2, 2], [1, 3], [3, 1]], dtype=float
    )
    hull = convex_hull(pts)
    assert len(hull) == 4
    assert abs(polygon_area(hull)) == pytest.approx(16.0)


def test_min_area_rect_recovers_rotated_rectangle():
    from ocr_spark.kernels.blocks import min_area_rect

    for angle in (0.0, 0.3, -0.5, 1.1):
        quad = rect_to_quad(np.array([2, 1, 10, 4.0]), angle=angle)
        rec = min_area_rect(quad)
        assert abs(polygon_area(rec)) == pytest.approx(8 * 3, abs=1e-6)
        assert polygon_iou(rec, quad) == pytest.approx(1.0, abs=1e-6)


def test_min_area_rect_beats_aabb_on_rotated_points():
    from ocr_spark.kernels.blocks import min_area_rect

    quad = rect_to_quad(np.array([0, 0, 20, 2.0]), angle=np.pi / 4)
    rec_area = abs(polygon_area(min_area_rect(quad)))
    aabb = quad_aabb(quad[None])[0]
    aabb_area = (aabb[2] - aabb[0]) * (aabb[3] - aabb[1])
    assert rec_area == pytest.approx(40.0, abs=1e-6)
    assert aabb_area > 2 * rec_area


def test_shrink_quad_axis_aligned_known_result():
    from ocr_spark.kernels.blocks import shrink_quad

    q = rect_to_quad(np.array([0, 0, 10, 4.0]))  # edges 10 and 4, r_i = 4
    s = shrink_quad(q, ratio=0.25)  # each vertex moves 1.0 along both edges
    expect = np.array([[1, 1], [9, 1], [9, 3], [1, 3]], dtype=float)
    np.testing.assert_allclose(s, expect, atol=1e-12)


def test_shrink_quad_stays_inside_and_smaller():
    from ocr_spark.kernels.blocks import shrink_quad

    q = rect_to_quad(np.array([5, 5, 30, 12.0]), angle=0.4)
    s = shrink_quad(q, ratio=0.3)
    assert abs(polygon_area(s)) < abs(polygon_area(q))
    inter = clip_polygon(s, q)
    assert abs(polygon_area(inter)) == pytest.approx(
        abs(polygon_area(s)), abs=1e-9
    )
