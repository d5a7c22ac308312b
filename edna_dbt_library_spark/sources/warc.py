"""WARC (ISO 28500) crawl-archive ingestion — the on-disk format of
Common-Crawl-style corpora, parsed stdlib-only.

A WARC file is a sequence of records (``WARC/1.0`` header block +
Content-Length payload), conventionally stored as one gzip MEMBER per
record (``.warc.gz``); ``parse_warc_records`` handles both the plain and
multi-member-gzip layouts and splits HTTP response payloads into status/
headers/body. ``load_warc`` distributes the parse: one task per archive
file via the binaryFile source, Arrow-batched record extraction, typed
rows out — the ingestion head of a crawl pipeline, feeding straight into
strip_html → text quality → dedup.

Scale shape: parallelism is per FILE (crawl archives are conventionally
~1 GiB each, a good task granule); a production deployment that needs
sub-file splits plugs a record-aligned InputFormat in at the reader, the
rest of the chain is unchanged. Payload bytes stay binary; nothing is
decoded until a downstream operator asks.
"""

from __future__ import annotations

import io
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("source_file", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _gunzip_members(data: bytes) -> bytes:
    """Concatenate every gzip member (the .warc.gz convention is one
    member per record; a plain single-member file also lands here)."""
    out, pos = bytearray(), 0
    while pos < len(data):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out += d.decompress(data[pos:])
        out += d.flush()
        tail = d.unused_data
        if not tail:
            break
        pos = len(data) - len(tail)
    return bytes(out)


def _split_http(payload: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content-type, body) from an HTTP message payload; the
    payload is returned unsplit when it isn't HTTP."""
    head_end = payload.find(b"\r\n\r\n")
    if head_end < 0 or not payload[:5] in (b"HTTP/",):
        return None, None, payload
    head = payload[:head_end].decode("latin-1", "replace").split("\r\n")
    try:
        status = int(head[0].split()[1])
    except (IndexError, ValueError):
        return None, None, payload
    ctype = None
    for line in head[1:]:
        if ":" in line:
            k, v = line.split(":", 1)
            if k.strip().lower() == "content-type":
                ctype = v.strip()
    return status, ctype, payload[head_end + 4 :]


def parse_warc_records(data: bytes) -> Iterator[dict]:
    """Yield one dict per WARC record (hostile/truncated input yields
    what parses and stops — an ingest job never dies on one bad
    archive). Gzip (multi-member or single) is transparently inflated."""
    if data[:2] == b"\x1f\x8b":
        try:
            data = _gunzip_members(data)
        except zlib.error:
            return
    buf = io.BytesIO(data)
    while True:
        # skip inter-record blank lines
        line = buf.readline()
        while line in (b"\r\n", b"\n"):
            line = buf.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            return  # lost sync: stop rather than misattribute payloads
        headers: dict[str, str] = {}
        while True:
            line = buf.readline()
            if line in (b"\r\n", b"\n", b""):
                break
            text = line.decode("utf-8", "replace").rstrip("\r\n")
            if ":" in text:
                k, v = text.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            return
        payload = buf.read(clen)
        if len(payload) < clen:
            return  # truncated archive
        status, http_ctype, body = _split_http(payload)
        yield {
            "record_id": headers.get("warc-record-id"),
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "http_status": status,
            "http_content_type": http_ctype,
            "payload": body,
        }


def load_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] = ("response",),
) -> DataFrame:
    """Distributed WARC ingestion: every archive under ``path`` (glob ok)
    parsed in parallel, one typed row per record of the requested
    ``record_types`` (default: response records — the crawl content;
    pass () for all). Output schema: WARC_SCHEMA; HTTP payloads arrive
    pre-split (status / content-type / body)."""
    files = spark.read.format("binaryFile").load(path).select(
        F.col("path").alias("source_file"), "content"
    )
    return _extract_records(files, record_types)


def _extract_records(
    files: DataFrame, record_types: tuple[str, ...]
) -> DataFrame:
    """Distributed record extraction over (source_file, content) rows —
    shared by the batch reader and the streaming foreachBatch sink."""
    # one archive per Arrow row: archives are big, never batch them up
    files.sparkSession.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
    wanted = tuple(record_types)

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for src, content in zip(pdf["source_file"], pdf["content"]):
                for rec in parse_warc_records(bytes(content)):
                    if wanted and rec["warc_type"] not in wanted:
                        continue
                    rec["source_file"] = src
                    rows.append(rec)
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_SCHEMA.fields]
            )

    return files.mapInPandas(run, WARC_SCHEMA)


def warc_to_documents(records: DataFrame) -> DataFrame:
    """(doc_id, url, text, fetched_at) from parsed response records —
    the bridge into the documents-shaped pipeline (ids via the
    replay-idempotent content hash, text via utf-8 with replacement;
    markup stripping is strip_html downstream, not here)."""
    from edna_dbt_library_spark.sources.ingest import with_ingest_ids

    docs = records.where(
        F.col("http_status").isNotNull() & (F.col("http_status") == 200)
    ).select(
        F.col("target_uri").alias("url"),
        # binary->string is a total UTF-8 reinterpretation in Spark
        # (invalid sequences become replacement chars, never an error)
        F.coalesce(F.col("payload").cast("string"), F.lit("")).alias("text"),
        F.col("warc_date").alias("fetched_at"),
    )
    return with_ingest_ids(docs, content_cols=("url", "text"), id_col="doc_id")
