"""WARC crawl-archive ingestion (sources/warc.py): hand-built archives
per ISO 28500 — plain, one-gzip-member-per-record, truncated/hostile —
through the pure parser and the distributed load_warc path, then the
warc_to_documents bridge into the documents-shaped pipeline."""

from __future__ import annotations

import gzip

from pyspark.sql import functions as F

from edna_dbt_library_spark.sources.warc import (
    load_warc,
    parse_warc_records,
    warc_to_documents,
)


def _record(rtype: str, uri: str | None, payload: bytes, rid: str) -> bytes:
    heads = [
        b"WARC/1.0",
        b"WARC-Type: " + rtype.encode(),
        b"WARC-Record-ID: <" + rid.encode() + b">",
        b"WARC-Date: 2024-03-01T00:00:00Z",
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    if uri:
        heads.append(b"WARC-Target-URI: " + uri.encode())
    return b"\r\n".join(heads) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _http(status: int, ctype: str, body: bytes) -> bytes:
    return (
        f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def _archive() -> bytes:
    return (
        _record("warcinfo", None, b"software: test\r\n", "info-1")
        + _record(
            "request", "http://a.example/x", b"GET /x HTTP/1.1\r\nHost: a\r\n\r\n", "req-1"
        )
        + _record(
            "response",
            "http://a.example/x",
            _http(200, "text/html; charset=utf-8", b"<html><p>hello crawl</p></html>"),
            "resp-1",
        )
        + _record(
            "response",
            "http://b.example/y",
            _http(404, "text/plain", b"gone"),
            "resp-2",
        )
    )


def test_parse_warc_records_plain_and_gzip():
    recs = list(parse_warc_records(_archive()))
    assert [r["warc_type"] for r in recs] == ["warcinfo", "request", "response", "response"]
    ok = recs[2]
    assert ok["target_uri"] == "http://a.example/x"
    assert ok["http_status"] == 200
    assert ok["http_content_type"] == "text/html; charset=utf-8"
    assert ok["payload"] == b"<html><p>hello crawl</p></html>"
    assert recs[3]["http_status"] == 404
    # request payload is HTTP but not a response: stays unsplit
    assert recs[1]["http_status"] is None and recs[1]["payload"].startswith(b"GET ")

    # one gzip member PER RECORD (the .warc.gz convention)
    gz = b"".join(
        gzip.compress(_record("response", f"http://m/{i}", _http(200, "t/p", b"x" * i), f"m-{i}"))
        for i in range(1, 4)
    )
    grecs = list(parse_warc_records(gz))
    assert [len(r["payload"]) for r in grecs] == [1, 2, 3]

    # hostile: truncation mid-payload yields the parseable prefix only
    whole = _archive()
    assert len(list(parse_warc_records(whole[: len(whole) - 40]))) == 3
    assert list(parse_warc_records(b"not a warc")) == []
    assert list(parse_warc_records(b"\x1f\x8bbroken gzip")) == []


def test_load_warc_and_documents_bridge(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(_archive())
    (tmp_path / "b.warc.gz").write_bytes(
        gzip.compress(
            _record(
                "response",
                "http://c.example/z",
                _http(200, "text/plain", "unicode éè".encode()),
                "resp-3",
            )
        )
    )

    recs = load_warc(spark, str(tmp_path / "*.warc*"))
    rows = recs.collect()
    assert {r["target_uri"] for r in rows} == {
        "http://a.example/x", "http://b.example/y", "http://c.example/z"
    }
    assert all(r["warc_type"] == "response" for r in rows)
    assert {r["http_status"] for r in rows} == {200, 404}

    docs = warc_to_documents(recs)
    got = {r["url"]: r for r in docs.collect()}
    # only status-200 responses become documents
    assert set(got) == {"http://a.example/x", "http://c.example/z"}
    assert got["http://a.example/x"]["text"] == "<html><p>hello crawl</p></html>"
    assert got["http://c.example/z"]["text"] == "unicode éè"
    # ids are deterministic across replays (idempotent ingestion)
    again = {r["url"]: r["doc_id"] for r in warc_to_documents(recs).collect()}
    assert {u: r["doc_id"] for u, r in got.items()} == again

    # the bridge feeds the standard chain: strip_html on the landed text
    from edna_dbt_library_spark.functions.text import strip_html

    cleaned = docs.select(strip_html("text").alias("c")).collect()
    assert "hello crawl" in {r["c"] for r in cleaned}


def test_stream_warc_ingest_equals_batch(spark, tmp_path):
    """streamed==batch for WARC: archives drained one per trigger land
    the same record set the batch reader produces; replays rewrite
    batch=<id> subdirs instead of duplicating."""
    from edna_dbt_library_spark.streaming import stream_warc_ingest

    src = tmp_path / "drop"
    src.mkdir()
    (src / "a.warc").write_bytes(_archive())
    (src / "b.warc.gz").write_bytes(
        gzip.compress(
            _record("response", "http://c.example/z", _http(200, "t/p", b"zz"), "r3")
        )
    )
    (src / "c.warc").write_bytes(
        _record("response", "http://d.example/w", _http(301, "t/h", b"moved"), "r4")
    )

    store, cp = str(tmp_path / "wstore"), str(tmp_path / "wcp")
    q = stream_warc_ingest(
        spark, str(src), store, cp, max_files_per_trigger=1
    )
    q.awaitTermination(120)

    import os

    landed = spark.read.parquet(f"{store}/records").drop("batch")
    batch = load_warc(spark, str(src))
    cols = ["record_id", "warc_type", "target_uri", "http_status"]
    assert sorted(map(tuple, landed.select(*cols).collect())) == sorted(
        map(tuple, batch.select(*cols).collect())
    )
    assert len(os.listdir(f"{store}/records")) == 3  # one dir per trigger
    # payload bytes survive the round trip
    got = {r["target_uri"]: bytes(r["payload"]) for r in landed.collect()}
    assert got["http://c.example/z"] == b"zz"
