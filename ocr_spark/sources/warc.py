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
    """Decompress concatenated gzip members one at a time. A corrupt
    member is skipped by scanning for the next gzip magic — one damaged
    record must not lose the rest of a 1 GB archive."""
    pos = 0
    n = len(data)
    while pos < n:
        try:
            d = zlib.decompressobj(wbits=31)
            chunk = d.decompress(data[pos:])
            consumed = n - pos - len(d.unused_data)
            if consumed <= 0 or not d.eof:
                raise ValueError("truncated member")
            yield chunk
            pos += consumed
        except Exception:
            nxt = data.find(b"\x1f\x8b\x08", pos + 1)
            if nxt < 0:
                return
            pos = nxt


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked transfer-encoded body."""
    out = []
    pos = 0
    while True:
        line_end = body.find(b"\r\n", pos)
        if line_end < 0:
            break
        size_token = body[pos:line_end].split(b";")[0].strip()
        try:
            size = int(size_token, 16)
        except ValueError:
            break
        if size == 0:
            break
        out.append(body[line_end + 2 : line_end + 2 + size])
        pos = line_end + 2 + size + 2  # skip chunk data + CRLF
    return b"".join(out) if out else body


def _decode_http_payload(body: bytes) -> bytes:
    """Strip the HTTP header block; undo chunked framing and
    Content-Encoding gzip/deflate (raw payload returned on any failure)."""
    http_end = body.find(b"\r\n\r\n")
    if http_end < 0:
        return body
    head = body[:http_end].lower()
    payload = body[http_end + 4 :]
    try:
        if b"transfer-encoding:" in head and b"chunked" in head:
            payload = _dechunk(payload)
        if b"content-encoding:" in head:
            if b"gzip" in head:
                payload = gzip.decompress(payload)
            elif b"deflate" in head:
                try:
                    payload = zlib.decompress(payload)
                except zlib.error:
                    payload = zlib.decompress(payload, -15)  # raw deflate
    except Exception:
        pass  # keep what we have; extraction is garbage-tolerant
    return payload


def _parse_records(data: bytes) -> list[dict]:
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
            # WARC 1.1 header values are UTF-8 (IRIs in Target-URI)
            headers[k.strip().lower().decode("utf-8", "replace")] = (
                v.strip().decode("utf-8", "replace")
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
        if url:
            out.append(
                {"url": url, "warc_ts": ts, "html": _decode_http_payload(body)}
            )
    return out


def parse_warc(data: bytes, is_gzip: bool) -> list[dict]:
    """WARC bytes → list of {url, warc_ts, html} response records.

    Gzip archives are parsed PER MEMBER (never materialized whole): the
    Common Crawl layout is one record per member, so peak memory is one
    record, and a corrupt member loses only itself.
    """
    if not is_gzip:
        return _parse_records(data)
    out: list[dict] = []
    for member in _split_gzip_members(data):
        out.extend(_parse_records(member))
    return out


def _warc_pages_fn(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """(path, content) archive rows → pages rows; shared by the batch and
    streaming WARC sources (one parse path, two execution modes)."""
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


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC file glob → pages DataFrame (url, warc_ts, html, text, lang).

    ``text``/``lang`` are NULL at this stage — they are crawl-metadata
    columns populated downstream (language ID runs post-extraction).
    """
    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(_warc_pages_fn, schema=PAGES_SCHEMA)


def read_warc_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin of ``read_warc``: each newly-arrived archive file is
    one micro-batch unit (the continuous crawl-ingest front door — a
    Common Crawl segment drop becomes incremental work, with checkpoint
    resume handled by the engine)."""
    files = (
        spark.readStream.format("binaryFile")
        # the binaryFile source's fixed schema, spelled out because
        # streaming file sources require one explicitly
        .schema(
            "path string, modificationTime timestamp, "
            "length long, content binary"
        )
        .option("maxFilesPerTrigger", 8)
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(_warc_pages_fn, schema=PAGES_SCHEMA)


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


def warc_fixture(spark: SparkSession, sf_dir: str, n_files: int = 8) -> str:
    """Materialize the documents table as a multi-file member-gzipped
    WARC crawl (the Common Crawl layout) and return its directory.

    The crawl is DETERMINISTIC per document — url/timestamp/page bytes are
    pure functions of (doc_id, source, text) via ``kernels.synth`` — so
    extraction over the WARC files is oracle-checkable against the raw
    ``documents`` table, exactly like the parquet-backed pages source.
    Files are written DISTRIBUTED (one ``.warc.gz`` per task, matching the
    one-task-per-archive read path; on a cluster this seam would target
    shared storage) into the fixture cache, keyed by the same
    content-fingerprint as the page fixtures; only per-task record COUNTS
    return to the driver."""
    import os
    import uuid
    from datetime import datetime, timezone

    from pyspark.sql import functions as F

    from ocr_spark.kernels.synth import url_for_doc, warc_ts_for_doc, wrap_html
    from ocr_spark.sources.pages import fixture_cache_base, fixture_cache_key

    base = fixture_cache_base()
    if base is None:
        import tempfile

        base = tempfile.mkdtemp(prefix="ocr_spark_warc_")
    path = os.path.join(base, f"warc-{fixture_cache_key(sf_dir, 'warc')}")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        recs = []
        for pdf in batches:
            for doc_id, text, source in zip(
                pdf["doc_id"], pdf["text"], pdf["source"]
            ):
                doc_id = int(doc_id)
                url = url_for_doc(doc_id, str(source))
                ts = datetime.fromtimestamp(
                    warc_ts_for_doc(doc_id), tz=timezone.utc
                ).strftime("%Y-%m-%dT%H:%M:%SZ")
                recs.append(
                    {
                        "url": url,
                        "warc_ts": ts,
                        "html": wrap_html(str(text), url),
                    }
                )
        if recs:
            pid = TaskContext.get().partitionId()
            write_warc(
                os.path.join(tmp, f"part-{pid:05d}.warc.gz"),
                recs,
                compress=True,
            )
        yield pd.DataFrame({"n": [len(recs)]})

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", "source")
        .repartition(n_files, "doc_id")
    )
    # bounded driver traffic: one count per task
    docs.mapInPandas(fn, schema="n long").agg(F.sum("n")).collect()
    with open(os.path.join(tmp, "_SUCCESS"), "w"):
        pass
    try:
        os.rename(tmp, path)
    except OSError:
        # a concurrent session won the rename; its fixture is equivalent
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return path
