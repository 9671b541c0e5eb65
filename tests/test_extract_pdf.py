"""PDF-branch Spark operator: fixture suite → byte-identical text + order."""

import pyspark.sql.functions as F

from ocr_spark.kernels.synth_pdf import make_pdf_suite
from ocr_spark.operators.extract_pdf import extract_pdf_blocks


def _load_suite(spark, n=30):
    blocks, expected = make_pdf_suite(n)
    bdf = spark.createDataFrame(blocks)
    edf = spark.createDataFrame(expected)
    return bdf, edf


def test_pdf_extraction_byte_identical(spark):
    bdf, edf = _load_suite(spark)
    got = extract_pdf_blocks(bdf)
    joined = got.join(edf, "url")
    agg = joined.agg(
        F.count("*").alias("n"),
        F.sum((F.col("extracted_text") == F.col("expected_text")).cast("int")).alias("text_ok"),
        F.sum((F.col("block_order") == F.col("expected_order")).cast("int")).alias("order_ok"),
    ).collect()[0]
    assert agg.n == 30
    assert agg.text_ok == 30, f"text match {agg.text_ok}/30"
    assert agg.order_ok == 30, f"order match {agg.order_ok}/30"


def test_pdf_extraction_deterministic(spark):
    bdf, _ = _load_suite(spark, n=9)
    a = extract_pdf_blocks(bdf).sort("url").toPandas()
    b = extract_pdf_blocks(bdf).sort("url").toPandas()
    assert a.equals(b)
