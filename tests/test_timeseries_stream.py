"""Streaming continuous aggregate (streaming/timeseries_stream.py):
drained partials == one-shot batch resample; day ladder from streamed
partials == direct day resample; masked-merge compaction is exact
through its crash window and converges on re-run."""

import os

from pyspark.sql import functions as F

from edna_dbt_library_spark.operators.timeseries import DAY_US, HOUR_US, resample_sum
from edna_dbt_library_spark.sources import load_table
from edna_dbt_library_spark.streaming.timeseries_stream import (
    compact_continuous_aggregate,
    read_continuous_aggregate,
    stream_continuous_aggregate,
)


def _events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long").alias("cents")
    return ev.select("event_id", "user_id", "ts", cents)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _drain(spark, ev, src, store, ckpt, where):
    ev.where(where).write.parquet(src, mode="append")
    stream = spark.readStream.schema(ev.schema).parquet(src)
    stream_continuous_aggregate(
        stream, ["user_id"], "ts", "cents", store, ckpt
    ).awaitTermination(120)


def test_streamed_partials_equal_batch_resample(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    src, store, ckpt = (str(tmp_path / d) for d in ("src", "store", "ckpt"))
    _drain(spark, ev, src, store, ckpt, F.col("event_id") % 3 == 0)
    _drain(spark, ev, src, store, ckpt, F.col("event_id") % 3 != 0)

    streamed = read_continuous_aggregate(spark, store, ["user_id"])
    whole = resample_sum(ev, ["user_id"], "ts", "cents", HOUR_US)
    assert _rows(streamed) == _rows(whole)

    # hour -> day ladder from the streamed partials == direct day resample
    day_stream = read_continuous_aggregate(spark, store, ["user_id"], grain_factor=24)
    day_whole = resample_sum(ev, ["user_id"], "ts", "cents", DAY_US)
    assert _rows(day_stream) == _rows(day_whole)


def test_compaction_masks_then_converges(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    src, store, ckpt = (str(tmp_path / d) for d in ("src", "store", "ckpt"))
    for k in range(3):
        _drain(spark, ev, src, store, ckpt, F.col("event_id") % 3 == k)
    before = _rows(read_continuous_aggregate(spark, store, ["user_id"]))
    n_dirs = len(os.listdir(store))
    assert n_dirs >= 3

    upto = compact_continuous_aggregate(spark, store, ["user_id"])
    assert upto >= 0
    assert _rows(read_continuous_aggregate(spark, store, ["user_id"])) == before
    # the kept tail batch stays an open dir next to the merged segment
    names = os.listdir(store)
    assert any(nm.startswith("merged-upto-") for nm in names)
    assert sum(nm.startswith("batch=") for nm in names) == 1

    # idempotent: nothing new below the tail -> no-op, same answer
    assert compact_continuous_aggregate(spark, store, ["user_id"]) == upto
    assert _rows(read_continuous_aggregate(spark, store, ["user_id"])) == before


def test_compaction_crash_window_is_masked(spark, sf_dir, tmp_path):
    """A crash AFTER writing merged-upto-N but BEFORE removing the
    folded dirs must not double-count: the read path masks every
    segment at-or-below N."""
    import shutil

    ev = _events(spark, sf_dir)
    src, store, ckpt = (str(tmp_path / d) for d in ("src", "store", "ckpt"))
    for k in range(3):
        _drain(spark, ev, src, store, ckpt, F.col("event_id") % 3 == k)
    before = _rows(read_continuous_aggregate(spark, store, ["user_id"]))

    # simulate the crash: snapshot the folded dirs, compact, restore them
    batch_dirs = sorted(nm for nm in os.listdir(store) if nm.startswith("batch="))
    stash = tmp_path / "stash"
    stash.mkdir()
    for nm in batch_dirs[:-1]:
        shutil.copytree(os.path.join(store, nm), str(stash / nm))
    upto = compact_continuous_aggregate(spark, store, ["user_id"])
    for nm in batch_dirs[:-1]:
        shutil.copytree(str(stash / nm), os.path.join(store, nm))

    # stale dirs present next to the merged segment: reads stay exact
    assert _rows(read_continuous_aggregate(spark, store, ["user_id"])) == before
    # re-running compact converges (stale dirs are below the mask)
    assert compact_continuous_aggregate(spark, store, ["user_id"]) == upto
    assert _rows(read_continuous_aggregate(spark, store, ["user_id"])) == before


def test_replay_rewrites_batch_subdir(spark, sf_dir, tmp_path):
    """A fresh checkpoint re-drain of the same source rewrites the same
    batch=<id> subdirs (idempotent sink) — the folded answer does not
    change."""
    ev = _events(spark, sf_dir)
    src, store = (str(tmp_path / d) for d in ("src", "store"))
    _drain(spark, ev, src, store, str(tmp_path / "ckpt1"), F.lit(True))
    before = _rows(read_continuous_aggregate(spark, store, ["user_id"]))
    # same source, new checkpoint: batch ids restart at 0 and overwrite
    stream = spark.readStream.schema(ev.schema).parquet(src)
    stream_continuous_aggregate(
        stream, ["user_id"], "ts", "cents", store, str(tmp_path / "ckpt2")
    ).awaitTermination(120)
    assert _rows(read_continuous_aggregate(spark, store, ["user_id"])) == before


def test_fresh_checkpoint_after_compaction_raises(spark, sf_dir, tmp_path):
    """Batch ids restart at 0 under a fresh checkpoint; on a compacted
    store those ids sit below the merged-upto mask and reads would
    silently swallow them — the writer must RAISE instead."""
    import pytest

    from edna_dbt_library_spark.streaming.timeseries_stream import (
        compact_continuous_aggregate,
    )

    ev = _events(spark, sf_dir)
    src, store = (str(tmp_path / d) for d in ("src", "store"))
    for k in range(2):
        _drain(spark, ev, src, store, str(tmp_path / "ckpt"), F.col("event_id") % 2 == k)
    compact_continuous_aggregate(spark, store, ["user_id"], keep_open_batches=0)
    before = _rows(read_continuous_aggregate(spark, store, ["user_id"]))

    ev.where(F.col("event_id") % 7 == 3).write.parquet(src, mode="append")
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = stream_continuous_aggregate(
        stream, ["user_id"], "ts", "cents", store, str(tmp_path / "ckpt_fresh")
    )
    with pytest.raises(Exception, match="compacted mask"):
        q.awaitTermination(120)
        raise AssertionError("drain should have failed on the masked batch id")
    # the store is untouched — no silently-masked partials landed
    assert _rows(read_continuous_aggregate(spark, store, ["user_id"])) == before

    # the ORIGINAL checkpoint continues past the mask and stays exact
    _drain(spark, ev, src, store, str(tmp_path / "ckpt"), F.lit(False))
    # the source dir now holds ALL events plus a duplicate file of the
    # %7==3 rows — the file-source (correctly) counts both copies
    whole = resample_sum(
        ev.unionAll(ev.where(F.col("event_id") % 7 == 3)),
        ["user_id"], "ts", "cents", HOUR_US,
    )
    assert _rows(read_continuous_aggregate(spark, store, ["user_id"])) == _rows(whole)
