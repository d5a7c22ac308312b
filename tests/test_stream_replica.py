"""stream_replica_sync (streaming/incremental_stream.py): continuous
keyed replica maintenance. Gates: a full drain leaves the replica equal
to wh.read(source) through arbitrary DML (delete / partition-moving
update / append); rows deleted in the source BEFORE their insert files
are ever streamed never land; a fresh-checkpoint re-drain (full replay)
converges to the same state via the keyed apply."""

import pytest
from pyspark.sql import functions as F

from edna_dbt_library_spark.sources import TableMeta, Warehouse
from edna_dbt_library_spark.streaming.incremental_stream import (
    stream_replica_sync,
)


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, v string, p string")


def _state(wh, rel):
    return sorted(
        (r["k"], r["v"], str(r["p"]))
        for r in wh.read(rel).select("k", "v", "p").collect()
    )


def _drain(wh, src, rep, keys, cp):
    q = stream_replica_sync(wh, src, rep, keys, str(cp), settle_s=1.0)
    q.awaitTermination()


def test_stream_replica_drains_to_source_state_through_dml(spark, wh, tmp_path):
    src = wh.relation("s", "src")
    rep = wh.relation("s", "rep")
    wh.create_as(
        src,
        _mk(spark, [(k, f"v{k}", "a" if k < 5 else "b") for k in range(10)]),
        TableMeta(partition_by="p"),
    )
    cp = tmp_path / "cp"
    _drain(wh, src, rep, ["k"], cp)
    assert _state(wh, rep) == _state(wh, src)

    # DML window: delete, partition-moving update, fresh append
    wh.delete_where(src, "k < 2")
    wh.update_where(src, "k = 7", {"v": F.lit("u7"), "p": F.lit("c")})
    wh.append(src, _mk(spark, [(20, "n", "a"), (21, "n", "c")]))
    _drain(wh, src, rep, ["k"], cp)
    got = _state(wh, rep)
    assert got == _state(wh, src)
    assert (7, "u7", "c") in got and (7, "v7", "b") not in got
    assert not any(k in (0, 1) for k, _, _ in got)


def test_stream_replica_source_deletes_before_first_drain_never_land(
    spark, wh, tmp_path
):
    """Delete entries that predate the insert files' first streaming:
    the already-deleted anti join must drop those rows at landing (their
    shards are folded in the same trigger and never re-arrive)."""
    src = wh.relation("s", "src")
    rep = wh.relation("s", "rep")
    wh.create_as(
        src, _mk(spark, [(k, f"v{k}", "a") for k in range(8)]), TableMeta()
    )
    wh.delete_where(src, "k % 2 = 0")  # before ANY streaming
    _drain(wh, src, rep, ["k"], tmp_path / "cp")
    assert _state(wh, rep) == _state(wh, src)
    assert all(k % 2 == 1 for k, _, _ in _state(wh, rep))


def test_stream_replica_full_replay_converges(spark, wh, tmp_path):
    """A fresh checkpoint replays every file (at-least-once worst case):
    the keyed apply re-masks the prior copies, so the replica still
    equals the source with no duplicate keys."""
    src = wh.relation("s", "src")
    rep = wh.relation("s", "rep")
    wh.create_as(
        src, _mk(spark, [(k, f"v{k}", "a") for k in range(6)]), TableMeta()
    )
    _drain(wh, src, rep, ["k"], tmp_path / "cp1")
    wh.update_where(src, "k = 3", {"v": F.lit("u")})
    _drain(wh, src, rep, ["k"], tmp_path / "cp2")  # FULL replay
    got = _state(wh, rep)
    assert got == _state(wh, src)
    assert len({k for k, _, _ in got}) == len(got) == 6
    assert (3, "u", "a") in got


def test_stream_cdc_refresh_drops_crashed_txn_phantoms(spark, wh, tmp_path):
    """stream_cdc_refresh consumes the raw file stream: a crashed
    update's txn-named files must be reconciled away per batch or the
    CDC target keeps phantom rows forever."""
    from edna_dbt_library_spark.operators.materializations import (
        PartitionMergeConfig,
        PartitionSpec,
    )
    from edna_dbt_library_spark.sources.warehouse import InjectedCrash
    from edna_dbt_library_spark.streaming.incremental_stream import (
        stream_cdc_refresh,
    )

    src = wh.relation("s", "ev")
    tgt = wh.relation("s", "ev_t")
    df = spark.createDataFrame(
        [(k, f"2024-01-0{1 + k % 3} 00:00:00", f"v{k}") for k in range(6)],
        "k long, ts string, v string",
    ).withColumn("ts", F.to_timestamp("ts"))
    wh.create_as(src, df, TableMeta())
    wh._txn_crash_point = "before_commit"
    with pytest.raises(InjectedCrash):
        wh.update_where(src, "k = 1", {"v": F.lit("ghost")})
    wh._txn_crash_point = None

    cfg = PartitionMergeConfig(
        unique_key="k", partition_by=PartitionSpec(field="ts")
    )
    q = stream_cdc_refresh(
        wh,
        src,
        tgt,
        lambda d: d,
        cfg,
        str(tmp_path / "cdc_cp"),
        settle_s=0.2,
        crashed_after_s=0.0,  # fresh marker: declare it crashed at once
    )
    q.awaitTermination()
    vals = {r["v"] for r in wh.read(tgt).collect()}
    assert "ghost" not in vals and "v1" in vals and len(vals) == 6


def test_stream_replica_content_hash_delete_spares_replacement(spark, wh, tmp_path):
    """The delete fold masks by key AND content: process the UPDATE's
    insert file in one drain, then its original's delete shard in a
    later drain (worst-case feed order) — the replacement survives."""
    src = wh.relation("s", "src")
    rep = wh.relation("s", "rep")
    wh.create_as(
        src, _mk(spark, [(k, f"v{k}", "a") for k in range(4)]), TableMeta()
    )
    cp = tmp_path / "cp"
    _drain(wh, src, rep, ["k"], cp)
    wh.update_where(src, "k = 2", {"v": F.lit("new")})
    _drain(wh, src, rep, ["k"], cp)
    got = _state(wh, rep)
    assert (2, "new", "a") in got and (2, "v2", "a") not in got
    assert got == _state(wh, src)
