"""Atomic DML commit (sources/warehouse._txn): multi-step statements
(update_where's data files + delete shard; multi-part delete shards)
become visible as ONE unit when the pending marker is unlinked. A crash
at ANY earlier point must leave the table byte-for-byte readable at its
pre-statement state — no transient duplicates, no half-visible deletes
— and make a blind retry safe even for self-referential sets
(v = v + 1), the caveat the pre-txn design documented.

Crash injection uses a BaseException (InjectedCrash) so the in-process
abort cleanup does NOT run — exactly a process kill."""

import os

import pytest
from pyspark.sql import functions as F

from edna_dbt_library_spark.sources import TableMeta, Warehouse
from edna_dbt_library_spark.sources.warehouse import InjectedCrash


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def _table(spark, wh, partitioned=True):
    rel = wh.relation("s", "t")
    meta = TableMeta(partition_by="p") if partitioned else TableMeta()
    df = spark.createDataFrame(
        [(k, 10 * k, "a" if k < 10 else "b") for k in range(20)],
        "k long, amt long, p string",
    ).coalesce(2)
    wh.create_as(rel, df, meta)
    return rel


def _rows(wh, rel):
    return sorted(tuple(r) for r in wh.read(rel).select("k", "amt", "p").collect())


CRASH_POINTS = ["after_stage_write", "after_data_move", "before_commit"]


@pytest.mark.parametrize("point", CRASH_POINTS)
def test_update_crash_leaves_exact_prior_state_and_safe_retry(spark, wh, point):
    rel = _table(spark, wh)
    before = _rows(wh, rel)
    wh._txn_crash_point = point
    with pytest.raises(InjectedCrash):
        wh.update_where(rel, "k < 5", {"amt": F.col("amt") + 1})
    # crashed mid-statement: reader sees EXACTLY the old table
    assert _rows(wh, rel) == before
    assert wh._pending_txids(rel)
    # repair: vacuum sweeps the invisible artifacts...
    wh._txn_crash_point = None
    v = wh.vacuum(rel)
    assert v["txns_swept"] >= 1
    assert not wh._pending_txids(rel)
    assert _rows(wh, rel) == before
    # ...and the SELF-REFERENTIAL retry applies exactly once
    assert wh.update_where(rel, "k < 5", {"amt": F.col("amt") + 1})[
        "n_updated"
    ] == 5
    after = _rows(wh, rel)
    assert [(k, amt) for k, amt, _ in after if k < 5] == [
        (k, 10 * k + 1) for k in range(5)
    ]
    assert len(after) == 20


def test_update_retry_works_without_vacuum(spark, wh):
    """A crashed txn's marker must not block later DML: the retry scans
    committed files only (never resurrects the orphans) and commits its
    own transaction."""
    rel = _table(spark, wh)
    wh._txn_crash_point = "before_commit"
    with pytest.raises(InjectedCrash):
        wh.update_where(rel, "k < 5", {"amt": F.col("amt") + 1})
    wh._txn_crash_point = None
    assert wh.update_where(rel, "k < 5", {"amt": F.col("amt") + 1})[
        "n_updated"
    ] == 5
    after = _rows(wh, rel)
    assert len(after) == 20  # no resurrection of the crashed txn's rows
    assert [(k, amt) for k, amt, _ in after if k < 5] == [
        (k, 10 * k + 1) for k in range(5)
    ]


def test_delete_where_crash_is_all_or_nothing(spark, wh):
    rel = _table(spark, wh)
    before = _rows(wh, rel)
    wh._txn_crash_point = "before_commit"
    with pytest.raises(InjectedCrash):
        wh.delete_where(rel, "p = 'a'")
    assert _rows(wh, rel) == before  # not even one row half-deleted
    wh._txn_crash_point = None
    assert wh.delete_where(rel, "p = 'a'")["n_deleted"] == 10
    assert all(p == "b" for _, _, p in _rows(wh, rel))


def test_delete_matching_crash_is_all_or_nothing(spark, wh):
    rel = _table(spark, wh)
    before = _rows(wh, rel)
    probe = spark.createDataFrame([(1,), (2,)], "k long")
    wh._txn_crash_point = "before_commit"
    with pytest.raises(InjectedCrash):
        wh.delete_matching(rel, probe, ["k"])
    assert _rows(wh, rel) == before
    wh._txn_crash_point = None
    assert wh.delete_matching(rel, probe, ["k"])["n_deleted"] == 2


def test_in_process_failure_aborts_cleanly(spark, wh, monkeypatch):
    """A plain exception mid-transaction (not a crash) sweeps its own
    artifacts and removes the marker — no vacuum needed."""
    rel = _table(spark, wh)
    before = _rows(wh, rel)

    def boom(*a, **k):
        raise RuntimeError("disk full")

    monkeypatch.setattr(wh, "_stage_delete_shard", boom)
    with pytest.raises(RuntimeError, match="disk full"):
        wh.update_where(rel, "k < 5", {"amt": F.lit(0)})
    assert not wh._pending_txids(rel)
    assert _rows(wh, rel) == before
    # no invisible artifacts left behind either
    leftovers = [
        fn
        for _d, _dd, fns in os.walk(wh.path(rel))
        for fn in fns
        if fn.startswith("txn-")
    ]
    assert leftovers == []


def test_sidecar_refresh_ignores_crashed_txn_files(spark, wh):
    """Zone-map/bloom refresh index _live_data_files: a crashed txn's
    orphans must not be indexed (they are not live data)."""
    rel = _table(spark, wh)
    n_files = len(wh._live_data_files(rel))
    wh._txn_crash_point = "before_commit"
    with pytest.raises(InjectedCrash):
        wh.update_where(rel, "k < 5", {"amt": F.lit(0)})
    wh._txn_crash_point = None
    assert len(wh._live_data_files(rel)) == n_files
    r = wh.refresh_bloom_sidecar(rel, ["k"], m_bits=1 << 12, k=5)
    assert r["files_total"] == n_files


def test_partition_moving_update_crash_preserves_state(spark, wh):
    """An update that MOVES rows across partitions stages files into
    new partition dirs; a crash must still leave the old state (and the
    stray partition dir contents invisible)."""
    rel = _table(spark, wh)
    before = _rows(wh, rel)
    wh._txn_crash_point = "before_commit"
    with pytest.raises(InjectedCrash):
        wh.update_where(rel, "k = 1", {"p": F.lit("c")})
    assert _rows(wh, rel) == before
    wh._txn_crash_point = None
    wh.vacuum(rel)
    assert wh.update_where(rel, "k = 1", {"p": F.lit("c")})["n_updated"] == 1
    assert (1, 10, "c") in _rows(wh, rel)


def test_unpartitioned_update_txn_roundtrip(spark, wh):
    rel = _table(spark, wh, partitioned=False)
    wh._txn_crash_point = "after_data_move"
    before = _rows(wh, rel)
    with pytest.raises(InjectedCrash):
        wh.update_where(rel, "k >= 18", {"amt": F.col("amt") * 2})
    assert _rows(wh, rel) == before
    wh._txn_crash_point = None
    assert wh.update_where(rel, "k >= 18", {"amt": F.col("amt") * 2})[
        "n_updated"
    ] == 2
    assert (18, 360, "b") in _rows(wh, rel)


def test_vacuum_no_pending_reports_zero(spark, wh):
    rel = _table(spark, wh)
    assert wh.vacuum(rel)["txns_swept"] == 0


@pytest.mark.parametrize("point", ["after_data_move", "before_commit"])
def test_upsert_matching_crash_is_all_or_nothing(spark, wh, point):
    """MERGE's apply (key masks + inserted rows) is ONE transaction: a
    crash can never show the deletes without their replacements — the
    exact window the two-statement delete_matching+append form had."""
    rel = _table(spark, wh)
    before = _rows(wh, rel)
    src = spark.createDataFrame(
        [(1, -1, "a"), (99, -2, "b")], "k long, amt long, p string"
    )
    wh._txn_crash_point = point
    with pytest.raises(InjectedCrash):
        wh.upsert_matching(rel, src, ["k"])
    assert _rows(wh, rel) == before  # k=1 not deleted, k=99 not inserted
    wh._txn_crash_point = None
    r = wh.upsert_matching(rel, src, ["k"])
    assert r == {"n_upserted": 2, "n_deleted": 1}
    rows = _rows(wh, rel)
    assert (1, -1, "a") in rows and (99, -2, "b") in rows
    assert (1, 10, "a") not in rows and len(rows) == 21


def test_cdc_refresh_hard_crash_does_not_poison_watermark(spark, wh):
    """A process kill between the watermark snapshot and the merge used
    to leave the unapplied snapshot as the NEWEST watermark — the next
    refresh would diff from it and silently skip the window. The
    promote-after-apply protocol ('!pending' note, renamed on success)
    sweeps crashed attempts instead."""
    from edna_dbt_library_spark.operators.materializations import (
        PartitionMergeConfig,
        PartitionSpec,
        run_cdc_refresh,
    )

    src = wh.relation("s", "ev")
    tgt = wh.relation("s", "ev_clean")
    df = spark.createDataFrame(
        [(k, f"2024-01-{1 + k % 3:02d} 00:00:00") for k in range(12)],
        "k long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    wh.create_as(src, df, TableMeta())
    cfg = PartitionMergeConfig(
        unique_key="k", partition_by=PartitionSpec(field="ts")
    )
    run_cdc_refresh(wh, src, tgt, lambda d: d, cfg)

    wh.append(
        src,
        spark.createDataFrame(
            [(100, "2024-01-05 00:00:00")], "k long, ts string"
        ).withColumn("ts", F.to_timestamp("ts")),
    )

    def crash(_):
        raise InjectedCrash("mid-refresh")

    with pytest.raises(InjectedCrash):
        run_cdc_refresh(wh, src, tgt, crash, cfg)
    assert 100 not in {r["k"] for r in wh.read(tgt).collect()}
    # retry with a working transform must still see the window
    r = run_cdc_refresh(wh, src, tgt, lambda d: d, cfg)
    assert r["cdc_mode"] == "delta"
    assert 100 in {r["k"] for r in wh.read(tgt).collect()}


def test_replica_sync_crashed_apply_replays_convergently(spark, wh):
    """A replica delta apply that crashes mid-transaction leaves the
    replica at its previous state; the NEXT sync (same watermark — it
    never advanced) re-applies the window and converges."""
    from edna_dbt_library_spark.operators.materializations import (
        run_replica_sync,
    )

    src = wh.relation("s", "src")
    rep = wh.relation("s", "rep")
    df = spark.createDataFrame(
        [(k, 10 * k, "a" if k < 10 else "b") for k in range(20)],
        "k long, amt long, p string",
    ).coalesce(2)
    wh.create_as(src, df, TableMeta(partition_by="p"))
    assert run_replica_sync(wh, src, rep, keys=["k"])["mode"] == "full"
    before = _rows(wh, rep)
    wh.delete_where(src, "k < 3")
    wh.update_where(src, "k = 5", {"amt": F.lit(0)})
    wh._txn_crash_point = "before_commit"
    with pytest.raises(InjectedCrash):
        run_replica_sync(wh, src, rep, keys=["k"])
    assert _rows(wh, rep) == before  # apply invisible
    wh._txn_crash_point = None
    r = run_replica_sync(wh, src, rep, keys=["k"])
    assert r["mode"] == "delta"
    assert _rows(wh, rep) == _rows(wh, src)
