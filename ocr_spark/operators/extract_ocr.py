"""OCR-branch Spark operator: line-strip table → decoded text rows.

One iterator-style ``mapInPandas`` stage; per Arrow batch the strips stack
into a single ``[B, 8, 384]`` tensor and the conv + CTC decode run as two
batched NumPy ops — the Arrow analog of the reference's RECOG_BATCH
micro-batched recognition loop (``/root/reference/test_img.py:97-119``).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ocr_spark.config import LINE_HEIGHT, MAX_LINE_WIDTH
from ocr_spark.kernels.ctc import ctc_greedy_decode_batch
from ocr_spark.kernels.ocr import recognize_lines

OCR_TEXT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("line_id", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


def _recognize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if len(pdf) == 0:
            continue
        strips = np.stack(
            [
                np.asarray(s, dtype=np.float32).reshape(LINE_HEIGHT, MAX_LINE_WIDTH)
                for s in pdf["strip"]
            ]
        )
        texts = recognize_lines(strips, pdf["width"].to_numpy(np.int64))
        yield pd.DataFrame(
            {"url": pdf["url"], "line_id": pdf["line_id"], "text": texts}
        )


def recognize_line_strips(lines: DataFrame) -> DataFrame:
    """lines(url, line_id, strip array<float> [8*384 flattened], width) →
    (url, line_id, text)."""
    return lines.select("url", "line_id", "strip", "width").mapInPandas(
        _recognize_batches, schema=OCR_TEXT_SCHEMA
    )


def _recognize_font_batches(decoder: str = "greedy"):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ocr_spark.kernels.font import recognize_lines_font

        for pdf in batches:
            if len(pdf) == 0:
                continue
            strips = np.stack(
                [
                    np.asarray(s, dtype=np.float32).reshape(
                        LINE_HEIGHT, MAX_LINE_WIDTH
                    )
                    for s in pdf["strip"]
                ]
            )
            texts = recognize_lines_font(
                strips, pdf["width"].to_numpy(np.int64), decoder=decoder
            )
            yield pd.DataFrame(
                {"url": pdf["url"], "line_id": pdf["line_id"], "text": texts}
            )

    return fn


def recognize_line_strips_font(
    lines: DataFrame, decoder: str = "greedy"
) -> DataFrame:
    """Font-atlas NCC recognizer over a line-strip table — same contract
    as ``recognize_line_strips`` but robust to anti-aliased scaling and
    additive noise (``kernels.font``): the strips need not be rendered
    from the engine's own glyph code. ``decoder="beam"`` switches the CTC
    collapse to prefix beam search for the high-noise regime."""
    return lines.select("url", "line_id", "strip", "width").mapInPandas(
        _recognize_font_batches(decoder), schema=OCR_TEXT_SCHEMA
    )


def _decode_logits_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        texts = []
        for lg in pdf["logits"]:
            arr = np.asarray([np.asarray(t, dtype=np.float32) for t in lg])
            if arr.size == 0:
                texts.append("")
                continue
            texts.append(ctc_greedy_decode_batch(arr[None])[0])
        yield pd.DataFrame(
            {"url": pdf["url"], "line_id": pdf["line_id"], "text": texts}
        )


def decode_logits(lines: DataFrame) -> DataFrame:
    """Golden-logits path (fixture suite 3): lines(url, line_id,
    logits array<array<float>>) → decoded text — the exact shape of the
    reference's hand-built-logits self-test
    (``/root/reference/Module/RecognitionLoss.py:41-54``)."""
    return lines.select("url", "line_id", "logits").mapInPandas(
        _decode_logits_batches, schema=OCR_TEXT_SCHEMA
    )
