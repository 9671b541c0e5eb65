"""End-to-end Spark extraction: documents → synthetic pages → extract →
byte-identical match rate 1.0 (the north-star correctness gate)."""

import pyspark.sql.functions as F

from ocr_spark.operators.extract_html import extract_pages, extraction_match_rate
from ocr_spark.operators.nodes import tokenize_to_nodes
from ocr_spark.sources.pages import expected_from_documents, pages_from_documents
from tests.conftest import SF_DIR


def test_pages_schema(spark):
    pages = pages_from_documents(spark, SF_DIR)
    assert [f.name for f in pages.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang",
    ]
    row = pages.limit(1).collect()[0]
    assert isinstance(row.html, (bytes, bytearray))
    assert row.url.startswith("https://")


def test_extraction_byte_identical_match_rate_is_one(spark):
    pages = pages_from_documents(spark, SF_DIR)
    extracted = extract_pages(pages)
    expected = expected_from_documents(spark, SF_DIR)
    res = extraction_match_rate(extracted, expected)
    agg = res.agg(
        F.count("*").alias("n"), F.sum(F.col("match").cast("int")).alias("ok")
    ).collect()[0]
    assert agg.n > 0
    assert agg.ok == agg.n, f"match rate {agg.ok}/{agg.n} != 1.0"


def test_extraction_deterministic_double_run(spark):
    pages = pages_from_documents(spark, SF_DIR)
    a = extract_pages(pages).select("url", "extracted_text").toPandas()
    b = extract_pages(pages).select("url", "extracted_text").toPandas()
    a = a.sort_values("url").reset_index(drop=True)
    b = b.sort_values("url").reset_index(drop=True)
    assert a.equals(b)


def test_spans_cover_extracted_text(spark):
    pages = pages_from_documents(spark, SF_DIR, n_paragraphs=3)
    ext = extract_pages(pages).limit(20).collect()
    for row in ext:
        for s in row.spans:
            seg = row.extracted_text[s.start : s.end]
            assert seg and not seg.startswith("\n") and not seg.endswith("\n")


def test_node_table_operator(spark):
    pages = pages_from_documents(spark, SF_DIR).limit(50)
    nodes = tokenize_to_nodes(pages)
    pdf = nodes.toPandas()
    assert len(pdf) > 0
    # every page contributes exactly one retained-content-grade p node
    content = pdf[(pdf.tag == "p") & (~pdf.negative) & (pdf.score >= 0.8)]
    assert content.url.nunique() == 50
    # scores bounded, spans sane
    assert ((pdf.score >= 0) & (pdf.score <= 1)).all()
    assert (pdf.span_end >= pdf.span_start).all()
