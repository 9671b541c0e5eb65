"""Block geometry kernels: NMS weighted merge + XY-cut reading order."""

import numpy as np

from ocr_spark.kernels.blocks import (
    assemble_pdf_text,
    box_iou,
    nms_merge_blocks,
    weighted_merge,
    xy_cut_order,
)


def test_box_iou():
    a = np.array([0.0, 0.0, 10.0, 10.0])
    assert box_iou(a, a) == 1.0
    assert box_iou(a, np.array([20.0, 20.0, 30.0, 30.0])) == 0.0
    # half overlap: inter 50, union 150
    b = np.array([5.0, 0.0, 15.0, 10.0])
    assert abs(box_iou(a, b) - 50.0 / 150.0) < 1e-12


def test_weighted_merge_reference_semantics():
    # g[:8]=(g8*g+p8*p)/(g8+p8); g8=g8+p8  (locality_aware_nms.py:18-21)
    g = np.array([0.0, 0.0, 10.0, 10.0])
    p = np.array([2.0, 2.0, 12.0, 12.0])
    merged, s = weighted_merge(g, 3.0, p, 1.0)
    assert np.allclose(merged, (3.0 * g + 1.0 * p) / 4.0)
    assert s == 4.0


def test_nms_merges_overlapping_keeps_disjoint():
    boxes = np.array(
        [
            [0, 0, 10, 10],
            [0.5, 0.5, 10.5, 10.5],  # near-dup of 0
            [50, 50, 60, 60],
        ],
        dtype=float,
    )
    scores = np.array([1.0, 0.4, 0.9])
    kept, ks, members = nms_merge_blocks(boxes, scores, thres=0.3)
    assert len(kept) == 2
    assert members[0][0] == 0  # highest-score constituent first
    assert set(members[0]) == {0, 1}
    assert members[1] == [2]
    assert ks[0] == 1.4  # scores ADD on merge


def test_nms_empty_and_single():
    kept, ks, members = nms_merge_blocks(np.zeros((0, 4)), np.zeros(0))
    assert len(kept) == 0 and members == []
    kept, ks, members = nms_merge_blocks(
        np.array([[0, 0, 1, 1.0]]), np.array([0.5])
    )
    assert len(kept) == 1 and members == [[0]]


def test_nms_idempotent():
    boxes = np.array([[0, 0, 10, 10], [100, 0, 110, 10], [0, 100, 10, 110]], float)
    scores = np.array([0.9, 0.8, 0.7])
    kept, ks, _ = nms_merge_blocks(boxes, scores)
    kept2, ks2, _ = nms_merge_blocks(kept, ks)
    assert np.allclose(kept, kept2) and np.allclose(ks, ks2)


def test_xy_cut_single_column_top_down():
    # stacked with gaps; given shuffled
    boxes = np.array(
        [[10, 60, 90, 80], [10, 0, 90, 20], [10, 30, 90, 50]], dtype=float
    )
    assert xy_cut_order(boxes).tolist() == [1, 2, 0]


def test_xy_cut_two_columns_column_major():
    # aligned rows; gutter (20) wider than line gaps (10) → columns first
    boxes = []
    for i in range(3):
        boxes.append([0, i * 30, 40, i * 30 + 20])  # left col: idx 0,2,4
        boxes.append([60, i * 30, 100, i * 30 + 20])  # right col: idx 1,3,5
    order = xy_cut_order(np.array(boxes, float)).tolist()
    assert order == [0, 2, 4, 1, 3, 5]


def test_xy_cut_title_above_columns():
    # full-width title spans the gutter → horizontal cut first
    boxes = [[0, 0, 100, 10]]  # title
    for i in range(2):
        boxes.append([0, 20 + i * 30, 40, 40 + i * 30])  # left: 1,3
        boxes.append([60, 20 + i * 30, 100, 40 + i * 30])  # right: 2,4
    order = xy_cut_order(np.array(boxes, float)).tolist()
    assert order == [0, 1, 3, 2, 4]


def test_xy_cut_no_gaps_falls_back_to_yx_sort():
    # overlapping mess: (y, x) lexsort — the reference's reading order
    boxes = np.array(
        [[5, 5, 50, 50], [0, 5, 45, 50], [0, 0, 50, 45]], dtype=float
    )
    order = xy_cut_order(boxes).tolist()
    assert order == [2, 1, 0]  # y0 asc, then x0 asc


def test_xy_cut_near_tie_stable():
    boxes = np.array([[0, 0.0, 10, 10], [20, 0.0, 30, 10]], dtype=float)
    assert xy_cut_order(boxes).tolist() == [0, 1]


def test_assemble_multi_page_order():
    pages = np.array([1, 0])
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], float)
    scores = np.array([0.9, 0.9])
    text, ids = assemble_pdf_text(pages, boxes, scores, ["second", "first"], np.array([7, 3]))
    assert text == "first\n\nsecond"
    assert ids == [3, 7]


def test_keep_representatives(spark):
    """dedup.keep_representatives: min-id survives each dup pair."""
    import pyspark.sql.functions as F

    from ocr_spark.operators.dedup import keep_representatives

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 3), (1, 4), (3, 5)], "doc_id_a long, doc_id_b long"
    )
    kept = sorted(r.doc_id for r in keep_representatives(docs, pairs).collect())
    assert kept == [0, 1, 2]
