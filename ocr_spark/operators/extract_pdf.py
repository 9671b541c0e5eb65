"""PDF-branch extraction: page-block table → per-document text.

All blocks of one document must meet for XY-cut + NMS — the reference's
per-image grouping of boxes via ``boxes_masks``
(``/root/reference/DataPreprocess/DataGen.py:538-548``). The naive Spark
spelling is ``groupBy("url").applyInPandas(...)``, but per-URL groups are
tiny (a handful of blocks), and applyInPandas pays Arrow + pandas setup
PER GROUP — measured ~5 ms/group, which at 10^9 documents is pure overhead
dwarfing the actual geometry.

Production spelling instead: hash-repartition by url + sort within
partitions, then ONE ``mapInPandas`` whose iterator processes every
complete url-group inside each Arrow batch and carries the (possibly
split) trailing group over to the next batch. Per-group cost drops to a
pandas ``groupby`` slice; the shuffle is identical to the groupBy's (one
exchange on url), so the plan is strictly better. Groups can never straddle
partitions (hash partitioning), only batch boundaries (handled by the
carry buffer).
"""

from __future__ import annotations

from collections.abc import Iterator

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


def _extract_group(pdf: pd.DataFrame) -> dict:
    # the cap is PER PAGE (config semantics): a many-page document keeps
    # every page's head, it is one pathological page that gets clipped
    if len(pdf) > MAX_BLOCKS_PER_PAGE:
        pdf = pdf.groupby("page", sort=False).head(MAX_BLOCKS_PER_PAGE)
    text, ids = assemble_pdf_text(
        pdf["page"].to_numpy(np.int64),
        pdf[["x0", "y0", "x1", "y1"]].to_numpy(np.float64),
        pdf["score"].to_numpy(np.float64),
        pdf["text"].tolist(),
        pdf["block_id"].to_numpy(np.int64),
        merge_thres=MERGE_IOU_THRESH,
        separator=BLOCK_SEPARATOR,
    )
    return {
        "url": pdf["url"].iloc[0],
        "extracted_text": text,
        "block_order": ids,
        "n_blocks": len(ids),
    }


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    carry: pd.DataFrame | None = None
    for pdf in batches:
        if carry is not None and len(carry):
            pdf = pd.concat([carry, pdf], ignore_index=True)
            carry = None
        if not len(pdf):
            continue
        urls = pdf["url"].to_numpy()
        # rows of the trailing url may continue in the next Arrow batch —
        # hold them back (within a partition, groups are contiguous by sort)
        last_start = int(np.flatnonzero(urls != urls[-1])[-1]) + 1 if (
            urls != urls[-1]
        ).any() else 0
        carry = pdf.iloc[last_start:]
        complete = pdf.iloc[:last_start]
        if not len(complete):
            continue
        out = [
            _extract_group(g) for _, g in complete.groupby("url", sort=False)
        ]
        yield pd.DataFrame(out)
    if carry is not None and len(carry):
        yield pd.DataFrame([_extract_group(carry)])


def extract_pdf_blocks(blocks: DataFrame, colocated: bool = False) -> DataFrame:
    """blocks(url, page, block_id, x0..y1, text, score) → per-url text.

    ``colocated=True`` asserts each url's blocks already live contiguously
    within one partition (e.g. produced per-document by an upstream
    ``mapInPandas``) and skips the exchange entirely — zero shuffles.
    """
    if not colocated:
        blocks = blocks.repartition("url").sortWithinPartitions("url")
    return blocks.mapInPandas(_extract_batches, schema=PDF_EXTRACTED_SCHEMA)
