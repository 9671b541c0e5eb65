"""Fused full pipeline: HTML branch + embedded-image OCR branch → merged
per-document text.

This is the engine's analog of the reference's complete flow
(``/root/reference/test_img.py``): detect text regions (HTML blocks AND
image-embedded lines), recognize the image lines in batches, and assemble
everything in reading order. Dataflow:

    pages ─┬─ mapInPandas html-extract ──────────────┐
           └─ mapInPandas line-detect ─ mapInPandas  ├─ join(url) → concat
                      (strips out)      conv+CTC ─ groupBy(url) agg ┘

Scale shape: the two detection stages are map-side (zero shuffle, same
scan); recognition batches across ALL pages' lines in Arrow batches (the
RECOG_BATCH discipline, ``/root/reference/test_img.py:97-116``, but
batched across documents instead of within one); the only shuffles are
the groupBy(url) line assembly and the final url equi-join — both on slim
columns, the html blob never crosses an exchange. Line assembly is
JVM-side (``array_sort`` of (line_id, text) structs + ``array_join``), not
Python.
"""

from __future__ import annotations

import base64
import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ocr_spark.config import BLOCK_SEPARATOR, LINE_HEIGHT, MAX_LINE_WIDTH

# embedded-line detector: the stand-in for the reference's detection head
# over image content (score map → boxes); here lines announce themselves
# via the data-strip attribute written by the fixture generator. Optional
# data-height marks a strip rendered at a height other than 8 — the detect
# stage resamples it through ``normalize_strip`` (the RoIRotate analog:
# arbitrary-height crop → fixed 8×⌈8w/h⌉ pad-384 geometry,
# ``/root/reference/Module/RRotateLayer.py:94-107``).
_IMG_RE = re.compile(
    r'<img[^>]*?data-width="(\d+)"[^>]*?'
    r'(?:data-height="(\d+)"[^>]*?)?data-strip="([A-Za-z0-9+/=]+)"'
)

_LINES_SCHEMA = (
    "url string, line_id int, strip array<float>, width long"
)


def _detect_lines(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    from ocr_spark.kernels.ocr import normalize_strip

    for pdf in batches:
        urls, ids, strips, widths = [], [], [], []
        for url, html in zip(pdf["url"], pdf["html"]):
            text = bytes(html).decode("utf-8", errors="replace")
            for i, m in enumerate(_IMG_RE.finditer(text)):
                width = int(m.group(1))
                height = int(m.group(2)) if m.group(2) else LINE_HEIGHT
                raw = np.frombuffer(
                    base64.b64decode(m.group(3)), dtype=np.uint8
                ).astype(np.float32) / 255.0
                if height == LINE_HEIGHT:
                    if raw.size != LINE_HEIGHT * MAX_LINE_WIDTH:
                        continue  # malformed payload: skip, never crash
                    strip = raw.reshape(LINE_HEIGHT, MAX_LINE_WIDTH)
                else:
                    if raw.size % height != 0:
                        continue
                    tall = raw.reshape(height, raw.size // height)
                    # crop to true content width before resampling, as
                    # RoIRotate crops the box before the affine resample
                    tall = tall[:, : width]
                    strip, width = normalize_strip(tall)
                urls.append(url)
                ids.append(i)
                strips.append(strip.ravel().tolist())
                widths.append(width)
        if urls:  # an all-object empty frame cannot convert to list<float>
            yield pd.DataFrame(
                {"url": urls, "line_id": ids, "strip": strips, "width": widths}
            )


def detect_image_lines(pages: DataFrame) -> DataFrame:
    """pages → (url, line_id, strip, width) for every embedded line."""
    return pages.select("url", "html").mapInPandas(
        _detect_lines, schema=_LINES_SCHEMA
    )


def extract_full(pages: DataFrame) -> DataFrame:
    """Complete extraction: HTML text + recognized embedded lines, merged.

    Output (url, extracted_text): html blocks first (document order), then
    recognized lines in image order, all joined with BLOCK_SEPARATOR —
    the reading-order contract of the reference's result sink
    (``/root/reference/test_img.py:121-132``).
    """
    from ocr_spark.operators.extract_html import extract_pages
    from ocr_spark.operators.extract_ocr import recognize_line_strips

    html_branch = extract_pages(pages).select("url", "extracted_text")
    rec = recognize_line_strips(detect_image_lines(pages))
    ocr_agg = rec.groupBy("url").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("line_id", "text"))),
                lambda s: s["text"],
            ),
            BLOCK_SEPARATOR,
        ).alias("ocr_text")
    )
    merged = html_branch.join(ocr_agg, "url", "left")
    return merged.select(
        "url",
        F.concat_ws(
            BLOCK_SEPARATOR,
            F.when(F.col("extracted_text") == "", None).otherwise(
                F.col("extracted_text")
            ),
            F.col("ocr_text"),
        ).alias("extracted_text"),
    )
