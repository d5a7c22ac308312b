"""stream_changelog (streaming/incremental_stream.py): the push-style
row-level changelog feed. Gate: a full drain of both queries (inserts +
materialized deletes) over a table's whole DML history must equal
Warehouse.read_changelog between the empty-table snapshot and the final
snapshot — same rows, same tags, no phantoms from uncommitted
transactions."""

import os

import pytest
from pyspark.sql import functions as F

from edna_dbt_library_spark.sources import TableMeta, Warehouse
from edna_dbt_library_spark.streaming.incremental_stream import (
    _settle_pending,
    stream_changelog,
)
from edna_dbt_library_spark.sources.warehouse import InjectedCrash


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, p string")


def _tagged(df):
    return sorted(
        (r["_change_type"], r["k"], r["v"], r["p"])
        for r in df.select("_change_type", "k", "v", "p").collect()
    )


def test_stream_changelog_drain_equals_read_changelog(spark, wh, tmp_path):
    rel = wh.relation("s", "t")
    wh.create_as(rel, _mk(spark, []).limit(0), TableMeta(partition_by="p"))
    v0 = wh.snapshot(rel, "base")
    wh.append(rel, _mk(spark, [(k, f"v{k}", "a" if k < 5 else "b") for k in range(10)]))
    wh.delete_where(rel, "k < 3")
    wh.update_where(rel, "k = 5", {"v": F.lit("u")})
    wh.append(rel, _mk(spark, [(k, f"v{k}", "c") for k in range(10, 15)]))
    v1 = wh.snapshot(rel, "end")

    expected = _tagged(
        wh.read_changelog(rel, v0, v1).withColumn(
            "p", F.col("p").cast("string")
        )
    )

    got = []

    def handler(df, epoch_id, kind):
        got.extend(
            (r["_change_type"], r["k"], r["v"], str(r["p"]))
            for r in df.select("_change_type", "k", "v", "p").collect()
        )
        assert kind in ("insert", "delete")

    qi, qd = stream_changelog(
        wh, rel, handler, str(tmp_path / "cp"), available_now=True
    )
    qi.awaitTermination()
    qd.awaitTermination()
    assert sorted(got) == expected
    # sanity on the window content itself: 10+5 appends + 1 update
    # rewrite = 16 inserts; 3 deletes + 1 update original = 4 deletes
    kinds = [t for t, *_ in got]
    assert kinds.count("insert") == 16 and kinds.count("delete") == 4


def test_stream_changelog_drops_crashed_txn_artifacts(spark, wh, tmp_path):
    """A crashed update's txn-named data files and delete shards sit in
    the dirs the file streams list; the settle filter must drop them —
    the stream agrees with every batch reader that the statement never
    happened."""
    rel = wh.relation("s", "t")
    wh.create_as(
        rel,
        _mk(spark, [(k, f"v{k}", "a") for k in range(6)]),
        TableMeta(partition_by="p"),
    )
    wh._txn_crash_point = "before_commit"
    with pytest.raises(InjectedCrash):
        wh.update_where(rel, "k = 1", {"v": F.lit("ghost")})
    wh._txn_crash_point = None

    got = []

    def handler(df, epoch_id, kind):
        got.extend(
            (r["_change_type"], r["k"], r["v"]) for r in df.collect()
        )

    qi, qd = stream_changelog(
        wh,
        rel,
        handler,
        str(tmp_path / "cp"),
        settle_s=1.0,
        crashed_after_s=0.0,  # fresh marker: declare it crashed at once
    )
    qi.awaitTermination()
    qd.awaitTermination()
    assert ("insert", 1, "ghost") not in got
    assert all(t == "insert" for t, *_ in got) and len(got) == 6


def test_settle_pending_raises_for_plausibly_inflight_txn(spark, wh):
    """A YOUNG pending marker may be a statement still committing: the
    batch must FAIL (so the trigger retries) rather than drop the rows
    — the file-source checkpoint would mark them consumed forever."""
    rel = wh.relation("s", "t")
    wh.create_as(rel, _mk(spark, [(1, "a", "p1")]), TableMeta())
    wh._txn_crash_point = "before_commit"
    with pytest.raises(InjectedCrash):
        wh.update_where(rel, "k = 1", {"v": F.lit("b")})
    wh._txn_crash_point = None
    import glob as _glob

    raw = spark.read.parquet(
        *_glob.glob(os.path.join(wh.path(rel), "*.parquet"))
    )
    with pytest.raises(RuntimeError, match="still-committing"):
        _settle_pending(wh, rel, raw, settle_s=0.1)  # default crashed_after_s
    # once the marker is old enough to be declared crashed: rows dropped
    out = _settle_pending(wh, rel, raw, settle_s=0.1, crashed_after_s=0.0)
    assert out.count() == 1  # only the committed original row


def test_settle_pending_passes_committed_txn_rows(spark, wh):
    """Committed transactions (marker gone) pass through untouched —
    the filter only drops rows of still-pending txn ids."""
    rel = wh.relation("s", "t")
    wh.create_as(rel, _mk(spark, [(1, "a", "p1")]), TableMeta())
    wh.update_where(rel, "k = 1", {"v": F.lit("b")})  # commits txn files
    raw = spark.read.parquet(
        *(os.path.join(wh.path(rel), f) for f in wh._live_data_files(rel))
    )
    out = _settle_pending(wh, rel, raw, settle_s=0.2)
    assert out.count() == raw.count()


def test_staging_steps_refresh_pending_marker_mtime(spark, wh):
    """Marker age must measure staging INACTIVITY, not total statement
    duration (ADVICE r9 #1): a long multi-shard statement that keeps
    landing artifacts must keep a YOUNG marker, so _settle_pending
    raises (retry) instead of classifying it crashed and silently
    dropping committed rows past the file-source checkpoint."""
    import glob as _glob
    import time as _time

    rel = wh.relation("s", "t")
    wh.create_as(rel, _mk(spark, [(1, "a", "p1"), (2, "b", "p1")]), TableMeta())
    meta = wh.read_meta(rel)
    with pytest.raises(RuntimeError, match="staging refreshed"):
        with wh._txn(rel, "test") as txid:
            marker = os.path.join(wh._pending_dir(rel), f"{txid}.json")
            old = _time.time() - 10_000
            os.utime(marker, (old, old))
            wh._stage_data_files(rel, wh.read(rel).limit(1), meta, txid)
            assert _time.time() - os.path.getmtime(marker) < 600
            # the still-staging txn now reads as in-flight, never crashed
            raw = spark.read.parquet(
                *_glob.glob(os.path.join(wh.path(rel), "*.parquet"))
            )
            with pytest.raises(RuntimeError, match="still-committing"):
                _settle_pending(wh, rel, raw, settle_s=0.1)
            os.utime(marker, (old, old))
            wh._stage_delete_shard(
                rel,
                spark.createDataFrame([("f", 0)], "file string, pos long"),
                1,
                txid,
            )
            assert _time.time() - os.path.getmtime(marker) < 600
            raise RuntimeError("staging refreshed")  # abort: sweep artifacts
    assert not wh._pending_txids(rel)


def test_vacuum_after_failed_batch_does_not_wedge_stream(spark, wh, tmp_path):
    """vacuum() may unlink a crashed txn's files AFTER the file source
    listed them into a checkpointed-but-uncommitted micro-batch; on
    restart the batch replays against its checkpointed file list. With
    ignoreMissingFiles (ADVICE r9 #2) the replay skips the swept files
    (their rows were never committed) instead of dying on
    FileNotFoundException forever."""
    rel = wh.relation("s", "t")
    wh.create_as(
        rel,
        _mk(spark, [(k, f"v{k}", "a") for k in range(4)]),
        TableMeta(partition_by="p"),
    )
    wh._txn_crash_point = "before_commit"
    with pytest.raises(InjectedCrash):
        wh.update_where(rel, "k = 1", {"v": F.lit("ghost")})
    wh._txn_crash_point = None

    def failing(df, epoch_id, kind):
        raise RuntimeError("sink down")

    qi, qd = stream_changelog(
        wh, rel, failing, str(tmp_path / "cp"),
        settle_s=0.5, crashed_after_s=0.0,
    )
    for q in (qi, qd):
        with pytest.raises(Exception):
            q.awaitTermination()

    # maintenance sweeps the crashed txn's artifacts from both dirs
    assert wh.vacuum(rel)["txns_swept"] >= 1

    got = []

    def handler(df, epoch_id, kind):
        got.extend((r["_change_type"], r["k"], r["v"]) for r in df.collect())

    qi, qd = stream_changelog(
        wh, rel, handler, str(tmp_path / "cp"),
        settle_s=0.5, crashed_after_s=0.0,
    )
    qi.awaitTermination()
    qd.awaitTermination()
    assert sorted(got) == [("insert", k, f"v{k}") for k in range(4)]
