"""WARC connector: round-trip through plain and gzip archives, then the
full extraction pipeline over WARC input."""

from __future__ import annotations

import datetime

import duckdb
import pyspark.sql.functions as F
import pytest

from ocr_spark.kernels.synth import url_for_doc, wrap_html
from ocr_spark.sources.warc import parse_warc, read_warc, write_warc

SF = "/root/testdata/sf0.001"


def _records(n=40):
    rows = duckdb.sql(
        f"SELECT doc_id, text, source FROM '{SF}/documents.parquet' "
        f"WHERE doc_id < {n}"
    ).fetchall()
    recs = []
    for doc_id, text, source in rows:
        url = url_for_doc(doc_id, source)
        recs.append(
            {
                "url": url,
                "warc_ts": "2024-01-01T00:00:00Z",
                "html": wrap_html(text, url),
                "text": text,
            }
        )
    return recs


@pytest.mark.parametrize("compress", [False, True], ids=["plain", "gzip"])
def test_warc_roundtrip(spark, tmp_path, compress):
    recs = _records()
    path = str(tmp_path / ("a.warc.gz" if compress else "a.warc"))
    write_warc(path, recs, compress=compress)

    # kernel-level parse
    with open(path, "rb") as f:
        parsed = parse_warc(f.read(), compress)
    assert len(parsed) == len(recs)
    assert {p["url"] for p in parsed} == {r["url"] for r in recs}
    by_url = {p["url"]: p["html"] for p in parsed}
    for r in recs:
        assert by_url[r["url"]] == r["html"]  # byte-identical payloads

    # Spark source → extraction → byte-identical text
    pages = read_warc(spark, path)
    assert pages.count() == len(recs)
    from ocr_spark.operators.extract_html import extract_pages

    got = {
        r.url: r.extracted_text for r in extract_pages(pages).collect()
    }
    for r in recs:
        assert got[r["url"]] == r["text"]
    ts = pages.select("warc_ts").first().warc_ts
    assert ts == datetime.datetime(2024, 1, 1, 0, 0, 0)


def test_warc_skips_non_response_and_garbage(spark, tmp_path):
    recs = _records(5)
    path = str(tmp_path / "b.warc")
    write_warc(path, recs)
    with open(path, "ab") as f:
        # a metadata record and trailing garbage must both be skipped
        f.write(
            b"WARC/1.0\r\nWARC-Type: metadata\r\nWARC-Target-URI: x://m\r\n"
            b"Content-Length: 3\r\n\r\nabc\r\n\r\n"
        )
        f.write(b"\x00\xffgarbage not a warc record at all")
    with open(path, "rb") as f:
        parsed = parse_warc(f.read(), False)
    assert len(parsed) == 5
    assert all(p["url"].startswith("https://") for p in parsed)
