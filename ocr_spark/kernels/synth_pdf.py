"""Deterministic PDF-layout fixture generation.

Each doc_id yields a block table plus its *by-construction* expected output
(no kernel logic duplicated): layouts are built so the correct reading order
and merge result are known a priori. Mirrors the reference's golden-fixture
style (``/root/reference/testData/*.npy`` driven through pure kernels).

Layout families (doc_id % 3):
  0 — single column, stacked blocks with clear gaps → top-down order.
  1 — two-column layout, blocks interleaved in id order → correct order is
      full left column then full right column (XY-cut), NOT the naive
      (y, x) interleave.
  2 — single column plus a lower-score near-duplicate overlapping block →
      NMS merges it away; the higher-score text survives.
"""

from __future__ import annotations

from ocr_spark.config import BLOCK_SEPARATOR


def _words(doc_id: int, tag: int) -> str:
    return (
        f"doc {doc_id} block {tag} content words alpha beta gamma delta "
        f"epsilon zeta eta theta"
    )


def make_pdf_doc(doc_id: int) -> tuple[list[dict], str, list[int]]:
    """Returns (block rows, expected_text, expected block_id order)."""
    url = f"pdf://doc-{doc_id}"
    fam = doc_id % 3
    rows: list[dict] = []

    def add(block_id, page, x0, y0, x1, y1, text, score):
        rows.append(
            dict(
                url=url, page=page, block_id=block_id,
                x0=float(x0), y0=float(y0), x1=float(x1), y1=float(y1),
                text=text, score=float(score),
            )
        )

    if fam == 0:
        # stacked blocks, ids shuffled relative to position
        order = [2, 0, 3, 1]  # block_id at vertical position 0,1,2,3
        for pos, bid in enumerate(order):
            add(bid, 0, 10, pos * 30, 90, pos * 30 + 20, _words(doc_id, bid), 0.9)
        expected_ids = order
    elif fam == 1:
        # two columns: left x∈[0,40], right x∈[60,100]; 3 blocks each,
        # ids assigned interleaved so (y,x) sort would give 0,1,2,3,4,5
        # but correct reading order is left column (0,2,4) then right (1,3,5)
        for i in range(3):
            add(2 * i, 0, 0, i * 30, 40, i * 30 + 20, _words(doc_id, 2 * i), 0.9)
            add(2 * i + 1, 0, 60, i * 30, 100, i * 30 + 20, _words(doc_id, 2 * i + 1), 0.9)
        expected_ids = [0, 2, 4, 1, 3, 5]
    else:
        # 3 stacked blocks; block 99 nearly duplicates block 1 with lower
        # score → merged away (weighted_merge keeps higher-score text)
        for pos in range(3):
            add(pos, 0, 10, pos * 30, 90, pos * 30 + 20, _words(doc_id, pos), 1.0)
        add(99, 0, 11, 31, 91, 51, _words(doc_id, 99), 0.4)
        expected_ids = [0, 1, 2]

    # multi-page: family 0 docs get a second page (order: page asc)
    if fam == 0:
        add(10, 1, 10, 0, 90, 20, _words(doc_id, 10), 0.9)
        expected_ids = expected_ids + [10]

    expected_text = BLOCK_SEPARATOR.join(_words(doc_id, b) for b in expected_ids)
    return rows, expected_text, expected_ids


def make_pdf_suite(n_docs: int) -> tuple[list[dict], list[dict]]:
    """n docs → (input block rows, expected rows)."""
    blocks: list[dict] = []
    expected: list[dict] = []
    for d in range(n_docs):
        rows, text, ids = make_pdf_doc(d)
        blocks.extend(rows)
        expected.append(
            dict(url=f"pdf://doc-{d}", expected_text=text, expected_order=ids)
        )
    return blocks, expected
