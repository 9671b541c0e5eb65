"""WARC source connector: Common-Crawl-style archive files → pages rows.

Reads WARC (ISO 28500) files via Spark's ``binaryFile`` source — one task
per archive file, which matches how Common Crawl ships data (~1 GB .warc.gz
segments; a crawl's parallelism is its file count, tens of thousands at
full scale). Record parsing, gzip-member decompression, HTTP-header
stripping, and the pages-schema projection all happen inside one
``mapInPandas`` stage; only the mandated pages columns leave it.

Supports plain ``.warc`` and member-gzipped ``.warc.gz`` (each record its
own gzip member, the Common Crawl layout). Only ``WARC-Type: response``
records with an HTTP payload become pages; other record types (request,
metadata, warcinfo) are skipped. Malformed records are skipped, never
fatal (one broken record must not kill a 1 GB file's task).

``write_warc`` is the deterministic fixture serializer for tests.
"""

from __future__ import annotations

import gzip
import io
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ocr_spark.sources.pages import PAGES_SCHEMA


def _split_gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress concatenated gzip members one at a time."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        chunk = d.decompress(data[pos:])
        yield chunk
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            return
        pos += consumed


def parse_warc(data: bytes, is_gzip: bool) -> list[dict]:
    """WARC bytes → list of {url, warc_ts, html} response records."""
    if is_gzip:
        try:
            data = b"".join(_split_gzip_members(data))
        except Exception:
            return []
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        head_start = data.find(b"WARC/", pos)
        if head_start < 0:
            break
        head_end = data.find(b"\r\n\r\n", head_start)
        if head_end < 0:
            break
        headers: dict[str, str] = {}
        for line in data[head_start:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = (
                v.strip().decode("latin-1")
            )
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        body_start = head_end + 4
        body = data[body_start : body_start + length]
        pos = body_start + length
        if headers.get("warc-type", "").lower() != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts = headers.get("warc-date", "")
        # payload is an HTTP response: strip its header block
        http_end = body.find(b"\r\n\r\n")
        html = body[http_end + 4 :] if http_end >= 0 else body
        if url:
            out.append({"url": url, "warc_ts": ts, "html": html})
    return out


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC file glob → pages DataFrame (url, warc_ts, html, text, lang).

    ``text``/``lang`` are NULL at this stage — they are crawl-metadata
    columns populated downstream (language ID runs post-extraction).
    """
    files = spark.read.format("binaryFile").load(path).select("path", "content")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for p, content in zip(pdf["path"], pdf["content"]):
                recs = parse_warc(bytes(content), str(p).endswith(".gz"))
                for r in recs:
                    ts = pd.to_datetime(r["warc_ts"], utc=True, errors="coerce")
                    rows.append(
                        {
                            "url": r["url"],
                            "warc_ts": None
                            if ts is pd.NaT
                            else ts.tz_localize(None),
                            "html": r["html"],
                            "text": None,
                            "lang": None,
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return files.mapInPandas(fn, schema=PAGES_SCHEMA)


def write_warc(path: str, records: list[dict], compress: bool = False) -> None:
    """Serialize {url, warc_ts(iso str), html(bytes)} records to a WARC
    file (fixture helper; one gzip member per record when compress=True,
    the Common Crawl layout)."""
    out = io.BytesIO()
    for r in records:
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + r["html"]
        )
        head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {r['url']}\r\n".encode()
            + f"WARC-Date: {r['warc_ts']}\r\n".encode()
            + f"Content-Length: {len(http)}\r\n".encode()
            + b"Content-Type: application/http; msgtype=response\r\n\r\n"
        )
        record = head + http + b"\r\n\r\n"
        out.write(gzip.compress(record) if compress else record)
    with open(path, "wb") as f:
        f.write(out.getvalue())
