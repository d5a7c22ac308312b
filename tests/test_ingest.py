"""JSONL/CSV ingestion contracts (sources/ingest.py): quarantine
semantics for malformed lines and missing required fields, schema
pinning, deterministic content ids."""

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from edna_dbt_library_spark.sources.ingest import (
    CORRUPT_COL,
    load_csv,
    load_jsonl,
    with_ingest_ids,
)

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("fetched_at", T.LongType()),
    ]
)


def _write(path, lines):
    path.write_text("\n".join(lines) + "\n")
    return str(path)


def test_jsonl_good_bad_split(spark, tmp_path):
    p = _write(
        tmp_path / "crawl.jsonl",
        [
            json.dumps({"url": "http://a", "text": "hello world", "fetched_at": 1}),
            '{"url": "http://broken", "text": "unterminated',  # malformed
            json.dumps({"url": None, "text": "no url", "fetched_at": 2}),  # missing required
            json.dumps({"url": "http://c", "text": "ok", "fetched_at": 3}),
            '{"url": "http://d", "text": "bad type", "fetched_at": "NaN"}',  # type mismatch
        ],
    )
    res = load_jsonl(spark, p, SCHEMA, required=("url",))
    good = sorted(r["url"] for r in res.good.collect())
    assert good == ["http://a", "http://c"]
    assert res.good.columns == ["url", "text", "fetched_at"]  # corrupt col never leaks
    rows = res.quarantine.collect()
    # classification is stable under pruning: count() (no columns) and
    # collect() (all columns) must agree — the JSON DataSource's corrupt
    # column does NOT guarantee this, which is why ingestion parses via
    # text + from_json
    assert res.quarantine.count() == len(rows) == 3
    q = {r["reason"]: r["raw"] for r in rows}
    assert "malformed" in q and "missing_required:url" in q
    # quarantine preserves the ORIGINAL raw line for replay
    assert q["missing_required:url"].startswith('{"url": null')


def test_jsonl_requires_explicit_schema(spark, tmp_path):
    with pytest.raises(TypeError):
        load_jsonl(spark, str(tmp_path), None)  # type: ignore[arg-type]
    clash = T.StructType([T.StructField(CORRUPT_COL, T.StringType())])
    with pytest.raises(ValueError):
        load_jsonl(spark, str(tmp_path), clash)


def test_csv_split_and_types(spark, tmp_path):
    p = _write(
        tmp_path / "vendor.csv",
        [
            "url,text,fetched_at",
            "http://a,hello,1",
            "http://b,world,not_a_number",  # type mismatch -> malformed
            ",missing url,3",  # empty required field
            "http://d,ok,4",
        ],
    )
    res = load_csv(spark, p, SCHEMA, required=("url",))
    assert sorted(r["url"] for r in res.good.collect()) == ["http://a", "http://d"]
    reasons = sorted(r["reason"] for r in res.quarantine.collect())
    assert reasons == ["malformed", "missing_required:url"]


def test_multiple_missing_required_listed(spark, tmp_path):
    p = _write(tmp_path / "x.jsonl", [json.dumps({"fetched_at": 9})])
    res = load_jsonl(spark, p, SCHEMA, required=("url", "text"))
    assert res.quarantine.collect()[0]["reason"] == "missing_required:url,text"
    assert res.good.count() == 0


def test_with_ingest_ids_deterministic_and_content_keyed(spark, tmp_path):
    rows = [("http://a", "hello"), ("http://b", "hello"), ("http://a", "hello")]
    df = spark.createDataFrame(rows, "url string, text string")
    ids = with_ingest_ids(df, ("url", "text"))
    got = [r["doc_id"] for r in ids.collect()]
    assert got[0] == got[2] != got[1]  # same content -> same id; diff content -> diff id
    assert all(v >= 0 for v in got)
    # replay (fresh frame, different partitioning) yields identical ids
    again = with_ingest_ids(df.repartition(7), ("url", "text"))
    assert sorted(r["doc_id"] for r in again.collect()) == sorted(got)
    # separator prevents boundary gaming: ("ab","c") != ("a","bc")
    d2 = spark.createDataFrame([("ab", "c"), ("a", "bc")], "url string, text string")
    i2 = [r["doc_id"] for r in with_ingest_ids(d2, ("url", "text")).collect()]
    assert i2[0] != i2[1]
    with pytest.raises(ValueError):
        with_ingest_ids(df, ())


def test_ingest_feeds_curation_pipeline(spark, tmp_path):
    """End-to-end: ingest -> ids -> exact dedup keeps one row per text."""
    from edna_dbt_library_spark.operators.dedup import exact_duplicate_groups

    lines = [
        json.dumps({"url": f"http://site/{i}", "text": f"doc body {i % 3}", "fetched_at": i})
        for i in range(9)
    ]
    p = _write(tmp_path / "c.jsonl", lines)
    res = load_jsonl(spark, p, SCHEMA, required=("url", "text"))
    docs = with_ingest_ids(res.good, ("text",))
    groups = exact_duplicate_groups(docs.select("doc_id", "text"))
    # 3 distinct bodies, replicated 3x -> ids collide exactly per body
    assert docs.select("doc_id").distinct().count() == 3
    assert groups.count() == 3


def test_ingest_contract_runs_under_structured_streaming(spark, tmp_path):
    """The text + from_json split is stateless scan-side Column algebra,
    so the SAME parse expression ingests a streaming drop folder
    unchanged: a drained availableNow stream splits good/quarantine
    identically to the batch read."""
    import json as _json

    from pyspark.sql import functions as F
    from edna_dbt_library_spark.sources.ingest import CORRUPT_COL
    from pyspark.sql import types as T

    src = tmp_path / "drop"
    src.mkdir()
    _write(
        src / "part-0.jsonl",
        [
            _json.dumps({"url": "http://a", "text": "hi", "fetched_at": 1}),
            '{"broken',
            _json.dumps({"url": None, "text": "no url", "fetched_at": 2}),
        ],
    )
    read_schema = T.StructType(
        list(SCHEMA.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parse = F.from_json(
        "value", read_schema, {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}
    )
    is_bad = (
        F.col(f"r.{CORRUPT_COL}").isNotNull() | F.col("r").isNull() | F.col("r.url").isNull()
    )
    stream_in = spark.readStream.text(str(src)).select("value", parse.alias("r"))
    out_dir, cp = str(tmp_path / "out"), str(tmp_path / "cp")
    q = (
        stream_in.select(
            F.col("r.url").alias("url"), is_bad.alias("bad"), F.col("value").alias("raw")
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(out_dir)
    assert out.count() == 3
    assert sorted(r["raw"] for r in out.where("bad").collect()) != []
    assert [r["url"] for r in out.where("NOT bad").collect()] == ["http://a"]
    assert out.where("bad").count() == 2


def test_stream_jsonl_ingest_equals_batch_split(spark, tmp_path):
    """Quarantine-aware streaming ingest (streaming/ingest_stream.py):
    drained across multiple micro-batches (maxFilesPerTrigger=1), the
    landed good/quarantine sets equal the batch load_jsonl split on the
    same files — classification is stable under ANY micro-batch
    chopping because both paths share split_jsonl_lines."""
    import json as _json

    from edna_dbt_library_spark.streaming import read_ingested, stream_jsonl_ingest

    src = tmp_path / "drop"
    src.mkdir()
    _write(
        src / "part-0.jsonl",
        [
            _json.dumps({"url": "http://a", "text": "hello", "fetched_at": 1}),
            '{"broken json',
            _json.dumps({"url": None, "text": "no url", "fetched_at": 2}),
        ],
    )
    _write(
        src / "part-1.jsonl",
        [
            _json.dumps({"url": "http://b", "text": "ok", "fetched_at": 3}),
            '{"url": "http://c", "text": "bad", "fetched_at": "NaN"}',
        ],
    )
    _write(
        src / "part-2.jsonl",
        [_json.dumps({"url": "http://d", "text": "late", "fetched_at": 4})],
    )

    store, cp = str(tmp_path / "store"), str(tmp_path / "cp")
    q = stream_jsonl_ingest(
        spark, str(src), SCHEMA, store, cp,
        required=("url",), max_files_per_trigger=1,
    )
    q.awaitTermination(120)

    batch = load_jsonl(spark, str(src), SCHEMA, required=("url",))
    s_good, s_quar = read_ingested(spark, store)
    assert sorted(map(tuple, s_good.select("url", "text", "fetched_at").collect())) == sorted(
        map(tuple, batch.good.collect())
    )
    assert sorted(map(tuple, s_quar.select("reason", "raw").collect())) == sorted(
        map(tuple, batch.quarantine.collect())
    )
    # the backlog really was chopped: one batch=<id> dir per trigger
    import os

    assert len(os.listdir(tmp_path / "store" / "good")) >= 3
    # count-vs-collect stability holds on the landed quarantine too
    assert s_quar.count() == len(s_quar.collect()) == 3


def test_stream_csv_ingest_equals_batch_split(spark, tmp_path):
    """CSV streaming ingest: per-file headers shed under micro-batch
    chopping, landed split equals batch load_csv."""
    from edna_dbt_library_spark.streaming import read_ingested, stream_csv_ingest

    src = tmp_path / "csvdrop"
    src.mkdir()
    hdr = "url,text,fetched_at"
    _write(src / "p0.csv", [hdr, "http://a,hello,1", "http://b,ok,notanint"])
    _write(src / "p1.csv", [hdr, ",missing url,2", "http://c,fine,3"])

    store, cp = str(tmp_path / "cstore"), str(tmp_path / "ccp")
    q = stream_csv_ingest(
        spark, str(src), SCHEMA, store, cp,
        required=("url",), max_files_per_trigger=1,
    )
    q.awaitTermination(120)
    from edna_dbt_library_spark.sources.ingest import load_csv

    batch = load_csv(spark, str(src), SCHEMA, required=("url",))
    s_good, s_quar = read_ingested(spark, store)
    assert sorted(map(tuple, s_good.collect())) == sorted(map(tuple, batch.good.collect()))
    assert sorted(map(tuple, s_quar.collect())) == sorted(
        map(tuple, batch.quarantine.collect())
    )
    assert s_good.count() == 2 and s_quar.count() == 2


def test_read_ingested_empty_store_and_batch_column_guard(spark, tmp_path):
    """Round-5 ADVICE: an ingest store with no landed batches is a
    legitimate state (first trigger still running) — with the contract
    schema, read_ingested returns correctly-typed EMPTY frames; without
    it, a clear FileNotFoundError (not an AnalysisException). And a
    contract column named 'batch' would collide with the sink's
    partition bookkeeping, so stream start rejects it."""
    import pytest

    from edna_dbt_library_spark.streaming import read_ingested
    from edna_dbt_library_spark.streaming.ingest_stream import (
        QUARANTINE_SCHEMA,
        stream_csv_ingest,
        stream_jsonl_ingest,
    )

    store = str(tmp_path / "never_landed")
    good, quar = read_ingested(spark, store, schema=SCHEMA)
    assert good.schema == SCHEMA and good.count() == 0
    assert quar.schema == QUARANTINE_SCHEMA and quar.count() == 0

    with pytest.raises(FileNotFoundError, match="no landed batches"):
        read_ingested(spark, store)

    bad = T.StructType(
        [T.StructField("url", T.StringType()), T.StructField("batch", T.LongType())]
    )
    src = tmp_path / "drop2"
    src.mkdir()
    for fn in (stream_jsonl_ingest, stream_csv_ingest):
        with pytest.raises(ValueError, match="must not name a column 'batch'"):
            fn(spark, str(src), bad, str(tmp_path / "s2"), str(tmp_path / "c2"))
