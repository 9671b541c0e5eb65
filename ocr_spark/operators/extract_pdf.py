"""PDF-branch extraction: page-block table → per-document text.

Grouped-map (``applyInPandas``) per url — all blocks of one document must
meet for XY-cut + NMS, exactly the reference's per-image grouping of boxes
via ``boxes_masks`` (``/root/reference/DataPreprocess/DataGen.py:538-548``).
Groups are page-local and small (blocks per document ≪ 10^4), so the shuffle
key is never skewed beyond the per-document cap; the expensive part
(geometry) is vectorized NumPy inside the group kernel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from ocr_spark.config import BLOCK_SEPARATOR, MAX_BLOCKS_PER_PAGE, MERGE_IOU_THRESH
from ocr_spark.kernels.blocks import assemble_pdf_text

PDF_EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("extracted_text", T.StringType()),
        T.StructField("block_order", T.ArrayType(T.IntegerType())),
        T.StructField("n_blocks", T.IntegerType()),
    ]
)


def _extract_doc(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.iloc[: MAX_BLOCKS_PER_PAGE]
    text, ids = assemble_pdf_text(
        pdf["page"].to_numpy(np.int64),
        pdf[["x0", "y0", "x1", "y1"]].to_numpy(np.float64),
        pdf["score"].to_numpy(np.float64),
        pdf["text"].tolist(),
        pdf["block_id"].to_numpy(np.int64),
        merge_thres=MERGE_IOU_THRESH,
        separator=BLOCK_SEPARATOR,
    )
    return pd.DataFrame(
        {
            "url": [pdf["url"].iloc[0]],
            "extracted_text": [text],
            "block_order": [ids],
            "n_blocks": [len(ids)],
        }
    )


def extract_pdf_blocks(blocks: DataFrame) -> DataFrame:
    """blocks(url, page, block_id, x0..y1, text, score) → per-url text."""
    return blocks.groupBy("url").applyInPandas(
        _extract_doc, schema=PDF_EXTRACTED_SCHEMA
    )
