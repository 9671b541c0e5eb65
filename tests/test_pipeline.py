"""Fused HTML+OCR pipeline: merge semantics, degradation, plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F

from ocr_spark.operators.pipeline import detect_image_lines, extract_full
from ocr_spark.plans.inspect import count_exchanges
from ocr_spark.sources.pages import (
    pages_from_documents,
    pages_with_images_from_documents,
)

SF = "/root/testdata/sf0.001"


def test_pages_without_images_degrade_to_html_only(spark):
    pages = pages_from_documents(spark, SF)  # no embedded images
    out = extract_full(pages)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    assert out.count() == n
    assert detect_image_lines(pages).count() == 0
    # extracted text equals the pure-HTML branch result exactly
    joined = out.join(
        docs.selectExpr("text AS expected"), out.extracted_text == F.col("expected")
    )
    assert joined.count() == n


def test_line_detection_counts(spark):
    pages = pages_with_images_from_documents(spark, SF)
    lines = detect_image_lines(pages)
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert lines.count() == 2 * n
    assert lines.groupBy("url").count().filter(F.col("count") != 2).count() == 0


def test_pipeline_shuffle_budget(spark):
    """Design contract: fan-out repartition + line-assembly groupBy + final
    join — at most 3 exchanges; the html blob itself never shuffles (only
    slim columns cross exchanges)."""
    pages = pages_with_images_from_documents(spark, SF)
    assert count_exchanges(extract_full(pages)) <= 3
