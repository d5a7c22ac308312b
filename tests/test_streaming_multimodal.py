"""Streaming incremental append (checkpointed, crash-safe) and multimodal
binary-column plumbing (schema, batching, determinism)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from edna_dbt_library_spark.operators.multimodal import (
    DECODE_SCHEMA,
    attach_fake_media,
    decode_images,
    extract_features,
    plan_frame_samples,
    require_real_codecs,
)
from edna_dbt_library_spark.operators.materializations import PartitionSpec
from edna_dbt_library_spark.sources.tables import load_table
from edna_dbt_library_spark.streaming import stream_incremental_append, stream_windowed_counts

SF = "/root/testdata/sf0.001"


def test_stream_incremental_append_drains_and_resumes(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    tgt_dir = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")
    events = load_table(spark, SF, "events")
    schema = events.schema

    # first micro-drain: half the data
    events.where(F.col("ts") <= "2024-01-15").write.parquet(src_dir, mode="overwrite")
    q = stream_incremental_append(
        spark, src_dir, schema, tgt_dir, ckpt, partition_by=PartitionSpec("ts")
    )
    q.awaitTermination(120)
    n1 = spark.read.parquet(tgt_dir).count()
    exp1 = events.where(F.col("ts") <= "2024-01-15").count()
    assert n1 == exp1

    # append more source files; the checkpoint (the streaming watermark)
    # makes the second drain process ONLY the new files
    events.where(F.col("ts") > "2024-01-15").write.parquet(src_dir, mode="append")
    q2 = stream_incremental_append(
        spark, src_dir, schema, tgt_dir, ckpt, partition_by=PartitionSpec("ts")
    )
    q2.awaitTermination(120)
    n2 = spark.read.parquet(tgt_dir).count()
    assert n2 == events.count()
    # day-partitioned layout on disk
    import os

    assert any(d.startswith("_pdate=") for d in os.listdir(tgt_dir))


def test_stream_windowed_counts_semantics_in_batch(spark):
    """The windowed-agg transformation is testable in batch mode (same
    logical plan Structured Streaming runs incrementally)."""
    events = load_table(spark, SF, "events")
    out = stream_windowed_counts(events, window_duration="1 hour", watermark_delay="2 hours")
    rows = out.collect()
    assert out.columns == ["window_start", "window_end", "event_type", "n_events", "sum_value"]
    total = sum(r["n_events"] for r in rows)
    assert total == events.count()
    # window bounds are aligned hours
    assert all(r["window_start"].minute == 0 and (r["window_end"] - r["window_start"]) == dt.timedelta(hours=1) for r in rows)


def test_attach_and_decode_images(spark):
    docs = load_table(spark, SF, "documents").limit(100)
    media = attach_fake_media(docs)
    assert [f.name for f in media.schema.fields] == ["doc_id", "content", "media"]
    decoded = decode_images(media)
    assert decoded.schema == DECODE_SCHEMA
    rows = decoded.collect()
    assert len(rows) == 100
    # deterministic digest equals md5 of the utf-8 text
    import hashlib

    truth = {r["doc_id"]: hashlib.md5(r["text"].encode()).hexdigest() for r in docs.collect()}
    for r in rows:
        assert r["content_md5"] == truth[r["doc_id"]]
        assert r["n_bytes"] > 0


def test_extract_features_shape_and_determinism(spark):
    docs = load_table(spark, SF, "documents").limit(50)
    media = attach_fake_media(docs)
    f1 = {r["doc_id"]: r["feature"] for r in extract_features(media, dim=8).collect()}
    f2 = {r["doc_id"]: r["feature"] for r in extract_features(media, dim=8).collect()}
    assert f1 == f2  # deterministic across runs
    assert all(len(v) == 8 for v in f1.values())
    assert all(abs(sum(v) - 1.0) < 1e-5 for v in f1.values())  # normalized histogram


def test_plan_frame_samples_pure_column(spark):
    docs = load_table(spark, SF, "documents").limit(10)
    media = attach_fake_media(docs)
    plan = plan_frame_samples(media, every_ms=500)
    rows = plan.collect()
    assert plan.columns == ["doc_id", "frame_idx", "frame_ts_ms"]
    # one doc's frame count matches its duration
    d0 = media.select("doc_id", "media.duration_ms").collect()[0]
    n0 = sum(1 for r in rows if r["doc_id"] == d0["doc_id"])
    assert n0 == max(d0["duration_ms"] // 500, 1)
    # no UDF in the plan (pure codegen path)
    assert "mapInPandas" not in plan._jdf.queryExecution().executedPlan().toString().lower().replace(" ", "")


def test_real_codec_stub_raises():
    with pytest.raises(NotImplementedError, match="decode"):
        require_real_codecs()
