"""Multi-run scenario tests for the incremental materializations
(SURVEY.md §5 point 3; FIXTURES.md §B incremental-target fixture):
first-run create, incremental append, MERGE idempotency on overlap,
event-time recency rejection, empty batch, history-load capping."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from edna_dbt_library_spark.operators.materializations import (
    IncrementalLogConfig,
    PartitionMergeConfig,
    PartitionSpec,
    read_table,
    run_incremental_log,
    run_incremental_partition_merge,
)
from edna_dbt_library_spark.sources import Relation, Warehouse
from edna_dbt_library_spark.sources.event_log import (
    get_last_successful_run_window_end,
    ids_for_relation,
)
from edna_dbt_library_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def _events(spark):
    return load_table(spark, SF, "events")


# ---------------------------------------------------------------------------
# incremental_log


def test_incremental_log_create_then_append(spark, wh):
    target = wh.relation("analytics_curated", "events_log")
    events = _events(spark)

    # run 1 at T1: full create, everything <= T1
    t1 = dt.datetime(2024, 1, 15)
    r1 = run_incremental_log(
        wh, target, events,
        IncrementalLogConfig(run_window_column="ts", dev_ci=False),
        run_started_at=t1,
    )
    assert r1["action"] == "create"
    n1 = read_table(wh, target).count()
    expected1 = events.where(F.col("ts") <= F.lit("2024-01-15 00:00:00")).count()
    assert n1 == expected1 > 0

    # watermark was recorded
    ids = ids_for_relation(target, "analytics")
    wm = get_last_successful_run_window_end(wh, ids, dev_ci=False)
    assert wm == "2024-01-15 00:00:00.000000 UTC"

    # run 2 at T2: appends exactly (T1, T2]
    t2 = dt.datetime(2024, 1, 20)
    r2 = run_incremental_log(
        wh, target, events,
        IncrementalLogConfig(run_window_column="ts", dev_ci=False),
        run_started_at=t2,
    )
    assert r2["action"] == "append"
    assert r2["run_window_start"] == "2024-01-15 00:00:00.000000 UTC"
    n2 = read_table(wh, target).count()
    expected2 = events.where(F.col("ts") <= F.lit("2024-01-20 00:00:00")).count()
    assert n2 == expected2

    # run 3 with no new data beyond T2 boundary: zero-row append, no dupes
    r3 = run_incremental_log(
        wh, target, events,
        IncrementalLogConfig(run_window_column="ts", dev_ci=False),
        run_started_at=t2,
    )
    assert read_table(wh, target).count() == n2
    assert r3["action"] == "append"


def test_incremental_log_crash_recovery_recomputes_window(spark, wh):
    """If a run logs 'started' but never 'succeeded', the next run reuses
    the previous watermark (at-least-once, SURVEY.md §3.1)."""
    target = wh.relation("analytics_curated", "events_crash")
    events = _events(spark)
    t1 = dt.datetime(2024, 1, 15)
    run_incremental_log(
        wh, target, events, IncrementalLogConfig(run_window_column="ts", dev_ci=False),
        run_started_at=t1,
    )
    # simulate a crashed run: started logged, write "failed", no success row
    from edna_dbt_library_spark.sources.event_log import log_model_event

    ids = ids_for_relation(target, "analytics")
    log_model_event(
        wh, ids, "model_run_started", "2024-01-15 00:00:00.000000 UTC",
        "2024-01-18 00:00:00.000000 UTC", model_name="events_crash",
    )
    wm = get_last_successful_run_window_end(wh, ids, dev_ci=False)
    assert wm == "2024-01-15 00:00:00.000000 UTC"  # unchanged by the crash


def test_incremental_log_partitioned_with_history_cap(spark, wh):
    target = wh.relation("analytics_curated", "events_capped")
    events = _events(spark)
    t1 = dt.datetime(2024, 1, 10)
    run_incremental_log(
        wh, target, events,
        IncrementalLogConfig(
            run_window_column="ts",
            partition_by=PartitionSpec("ts"),
            cluster_by=["user_id"],
            dev_ci=False,
        ),
        run_started_at=t1,
    )
    # run 2 started much later, but capped to 3 days of history per run
    t2 = dt.datetime(2024, 1, 25)
    r2 = run_incremental_log(
        wh, target, events,
        IncrementalLogConfig(
            run_window_column="ts", partition_by=PartitionSpec("ts"),
            max_history_load_days=3, dev_ci=False,
        ),
        run_started_at=t2,
    )
    assert r2["run_window_end"] == "2024-01-13 00:00:00.000000 UTC"
    n = read_table(wh, target).count()
    expected = events.where(F.col("ts") <= F.lit("2024-01-13 00:00:00")).count()
    assert n == expected
    # partition directories exist (day-partitioned layout)
    assert len(wh.partitions(target)) >= 10


def test_incremental_log_dev_ci_clamps_to_one_day(spark, wh):
    target = wh.relation("analytics_curated", "events_devci")
    events = _events(spark)
    r = run_incremental_log(
        wh, target, events,
        IncrementalLogConfig(run_window_column="ts", max_history_load_days=30, dev_ci=True),
        run_started_at=dt.datetime(2024, 1, 20),
    )
    # dev/ci: 1-day clamp from the 1900 default watermark... the clamp is
    # relative to window_start, so the window ends 1900-01-02
    assert r["run_window_end"] == "1900-01-02 00:00:00.000000 UTC"
    assert read_table(wh, target).count() == 0


# ---------------------------------------------------------------------------
# incremental_partition_merge


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, value double"
    )


TS = dt.datetime


def test_merge_create_then_upsert_and_recency(spark, wh):
    target = wh.relation("analytics_curated", "state")
    cfg = PartitionMergeConfig(
        partition_by=PartitionSpec("ts"), unique_key="event_id", event_time="ts"
    )
    # run 1: create
    b1 = _batch(spark, [
        (1, TS(2024, 1, 1, 10), 100, 1.0),
        (2, TS(2024, 1, 1, 11), 101, 2.0),
        (3, TS(2024, 1, 2, 9), 102, 3.0),
    ])
    r1 = run_incremental_partition_merge(wh, target, b1, cfg)
    assert r1["action"] == "create"
    assert read_table(wh, target).count() == 3

    # run 2: newer update for key 1, stale update for key 2, new key 4
    b2 = _batch(spark, [
        (1, TS(2024, 1, 1, 12), 100, 10.0),   # newer -> update
        (2, TS(2024, 1, 1, 10), 101, 20.0),   # stale -> rejected (S.ts > T.ts fails)
        (4, TS(2024, 1, 3, 8), 103, 4.0),     # new key -> insert
    ])
    r2 = run_incremental_partition_merge(wh, target, b2, cfg)
    assert r2["action"] == "merge"
    assert sorted(r2["touched_partitions"]) == ["2024-01-01", "2024-01-03"]
    state = {r["event_id"]: r for r in read_table(wh, target).collect()}
    assert len(state) == 4
    assert state[1]["value"] == 10.0 and state[1]["ts"] == TS(2024, 1, 1, 12)
    assert state[2]["value"] == 2.0 and state[2]["ts"] == TS(2024, 1, 1, 11)  # stale rejected
    assert state[3]["value"] == 3.0  # untouched partition intact
    assert state[4]["value"] == 4.0

    # run 3: exact replay of run 2 (idempotency — rerun after crash)
    run_incremental_partition_merge(wh, target, b2, cfg)
    state3 = {r["event_id"]: r for r in read_table(wh, target).collect()}
    assert {k: (v["value"], v["ts"]) for k, v in state3.items()} == {
        k: (v["value"], v["ts"]) for k, v in state.items()
    }


def test_merge_without_event_time_updates_unconditionally(spark, wh):
    target = wh.relation("analytics_curated", "state_noev")
    cfg = PartitionMergeConfig(partition_by=PartitionSpec("ts"), unique_key="event_id")
    b1 = _batch(spark, [(1, TS(2024, 1, 1, 10), 100, 1.0)])
    run_incremental_partition_merge(wh, target, b1, cfg)
    b2 = _batch(spark, [(1, TS(2024, 1, 1, 9), 100, 99.0)])  # older ts still updates
    run_incremental_partition_merge(wh, target, b2, cfg)
    row = read_table(wh, target).collect()[0]
    assert row["value"] == 99.0 and row["ts"] == TS(2024, 1, 1, 9)


def test_merge_empty_batch_paths(spark, wh):
    target = wh.relation("analytics_curated", "state_empty")
    cfg = PartitionMergeConfig(partition_by=PartitionSpec("ts"), unique_key="event_id")
    empty = _batch(spark, []).where(F.lit(False))
    # first run, empty: creates empty table with schema
    r1 = run_incremental_partition_merge(wh, target, empty, cfg)
    assert r1["action"] == "create_empty"
    assert read_table(wh, target).count() == 0
    assert read_table(wh, target).columns == ["event_id", "ts", "user_id", "value"]
    # later empty run: no-op
    b1 = _batch(spark, [(1, TS(2024, 1, 1, 10), 100, 1.0)])
    run_incremental_partition_merge(wh, target, b1, cfg)
    r3 = run_incremental_partition_merge(wh, target, empty, cfg)
    assert r3["action"] == "noop"
    assert read_table(wh, target).count() == 1


def test_merge_update_column_subset(spark, wh):
    target = wh.relation("analytics_curated", "state_subset")
    cfg = PartitionMergeConfig(
        partition_by=PartitionSpec("ts"), unique_key="event_id",
        merge_update_columns=["event_id", "ts", "value"],  # user_id excluded
    )
    b1 = _batch(spark, [(1, TS(2024, 1, 1, 10), 100, 1.0)])
    run_incremental_partition_merge(wh, target, b1, cfg)
    b2 = _batch(spark, [(1, TS(2024, 1, 1, 11), 999, 5.0)])
    run_incremental_partition_merge(wh, target, b2, cfg)
    row = read_table(wh, target).collect()[0]
    assert row["value"] == 5.0 and row["user_id"] == 100  # user_id kept from target

    # new keys insert NULL for non-updatable columns (explicit INSERT list)
    b3 = _batch(spark, [(2, TS(2024, 1, 1, 12), 7, 6.0)])
    run_incremental_partition_merge(wh, target, b3, cfg)
    rows = {r["event_id"]: r for r in read_table(wh, target).collect()}
    assert rows[2]["user_id"] is None


def test_merge_key_outside_touched_partitions_duplicates(spark, wh):
    """Partition-local key identity: a batch row whose key lives in an
    UNtouched target partition is NOT matched (the partition-IN predicate
    hides it) and is inserted — the same duplicate BigQuery's pruned MERGE
    produces (reference: incremental_partition_merge.sql:239-252). This is
    a documented reference quirk, asserted here so a refactor doesn't
    silently change it."""
    target = wh.relation("analytics_curated", "state_dup")
    cfg = PartitionMergeConfig(
        partition_by=PartitionSpec("ts"), unique_key="event_id", event_time="ts"
    )
    b1 = _batch(spark, [(1, TS(2024, 1, 1, 10), 100, 1.0)])
    run_incremental_partition_merge(wh, target, b1, cfg)
    b2 = _batch(spark, [(1, TS(2024, 1, 2, 8), 100, 2.0)])  # key 1, new day only
    run_incremental_partition_merge(wh, target, b2, cfg)
    rows = read_table(wh, target).collect()
    assert len(rows) == 2  # duplicate key across partitions, like BigQuery
    assert sorted(wh.partitions(target)) == ["2024-01-01", "2024-01-02"]


def test_merge_null_key_target_rows_pass_through_untouched(spark, wh):
    """A target row with a NULL unique_key never matches any source row
    (NULL = NULL is not TRUE) and the reference MERGE has no WHEN NOT
    MATCHED BY SOURCE clause (incremental_partition_merge.sql:247-264) —
    so merging an unrelated batch into the same partition must leave the
    NULL-keyed row byte-identical, not NULL out its columns."""
    target = wh.relation("analytics_curated", "state_nullkey")
    cfg = PartitionMergeConfig(
        partition_by=PartitionSpec("ts"), unique_key="event_id", event_time="ts"
    )
    b1 = _batch(spark, [
        (None, TS(2024, 1, 1, 12), 77, 1.5),  # NULL-keyed row
        (1, TS(2024, 1, 1, 10), 100, 1.0),
    ])
    run_incremental_partition_merge(wh, target, b1, cfg)
    # merge an unrelated key into the SAME partition
    b2 = _batch(spark, [(2, TS(2024, 1, 1, 11), 101, 2.0)])
    run_incremental_partition_merge(wh, target, b2, cfg)
    rows = read_table(wh, target).collect()
    nulls = [r for r in rows if r["event_id"] is None]
    assert len(nulls) == 1
    assert nulls[0]["ts"] == TS(2024, 1, 1, 12)
    assert nulls[0]["user_id"] == 77 and nulls[0]["value"] == 1.5
    assert len(rows) == 3

    # NULL-keyed SOURCE rows match nothing either: each one inserts, and
    # two NULL-keyed batch rows are NOT a duplicate-key error (they can't
    # both match one target row — they match none).
    b3 = _batch(spark, [
        (None, TS(2024, 1, 1, 13), 88, 3.0),
        (None, TS(2024, 1, 1, 14), 99, 4.0),
    ])
    run_incremental_partition_merge(wh, target, b3, cfg)
    rows = read_table(wh, target).collect()
    assert len([r for r in rows if r["event_id"] is None]) == 3
    assert len(rows) == 5


def test_merge_partition_field_update_moves_row_and_drops_empty_dir(spark, wh):
    """A matched UPDATE that changes the partition field relocates the row
    (no duplicate), and a touched partition left empty by the move has its
    directory dropped.

    Setup: key1@Jan1, key2@Jan2. Batch: key1 newer at Jan2 (moves away
    from Jan1), key2 STALE at Jan1 (rejected, but Jan1 becomes touched).
    After the merge Jan1 holds no rows at all."""
    target = wh.relation("analytics_curated", "state_move")
    cfg = PartitionMergeConfig(
        partition_by=PartitionSpec("ts"), unique_key="event_id", event_time="ts"
    )
    b1 = _batch(spark, [(1, TS(2024, 1, 1, 10), 100, 1.0),
                        (2, TS(2024, 1, 2, 10), 101, 2.0)])
    run_incremental_partition_merge(wh, target, b1, cfg)
    b2 = _batch(spark, [(1, TS(2024, 1, 2, 8), 100, 10.0),   # newer: Jan1 -> Jan2
                        (2, TS(2024, 1, 1, 9), 101, 99.0)])  # stale: rejected
    r = run_incremental_partition_merge(wh, target, b2, cfg)
    assert sorted(r["touched_partitions"]) == ["2024-01-01", "2024-01-02"]
    state = {row["event_id"]: row for row in read_table(wh, target).collect()}
    assert len(state) == 2
    assert state[1]["ts"] == TS(2024, 1, 2, 8) and state[1]["value"] == 10.0
    assert state[2]["ts"] == TS(2024, 1, 2, 10) and state[2]["value"] == 2.0
    assert wh.partitions(target) == ["2024-01-02"]  # emptied Jan 1 dropped


def test_window_filter_raw_ns_bound_is_exact_at_inclusive_end(spark):
    """The raw `_ts_ns` superset bound must be computed with integer
    arithmetic: a float `timestamp()*1e6` can truncate one microsecond low,
    excluding a row exactly at the inclusive window end that the exact
    timestamp predicate keeps — and the next run's exclusive lower bound
    then skips it forever (at-least-once watermark violation)."""
    import datetime as _dt

    from edna_dbt_library_spark.operators.relational import window_filter

    epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
    hi = "2026-03-01 12:34:56.789123"
    hi_dt = _dt.datetime.fromisoformat(hi).replace(tzinfo=_dt.timezone.utc)
    hi_us = (hi_dt - epoch) // _dt.timedelta(microseconds=1)
    # boundary row: exactly at the inclusive end, with max sub-us nanos
    # (converted value floor(ns/1000) == hi_us, so it MUST be kept)
    rows = [
        (1, hi_us * 1000 + 999),   # at inclusive end -> keep
        (2, hi_us * 1000),         # at inclusive end -> keep
        (3, (hi_us + 1) * 1000),   # 1us past the end -> drop
    ]
    # exact integer division, like sources.tables.load_table (double `/`
    # would lose precision at ~1.7e18 ns)
    df = spark.createDataFrame(rows, "id bigint, _ts_ns bigint").withColumn(
        "ts", F.timestamp_micros(F.expr("_ts_ns div 1000"))
    )
    kept = sorted(r["id"] for r in window_filter(df, "ts", None, hi).collect())
    assert kept == [1, 2]
    # and the same boundary as an exclusive LOWER bound drops both end rows
    kept_lo = sorted(
        r["id"]
        for r in window_filter(df, "ts", hi, "2027-01-01 00:00:00").collect()
    )
    assert kept_lo == [3]


def test_incremental_log_rejects_copy_partitions(spark, wh):
    """reference: incremental_log.sql:35-39."""
    target = wh.relation("analytics_curated", "nope")
    with pytest.raises(ValueError, match="copy_partitions"):
        run_incremental_log(
            wh, target, _events(spark),
            IncrementalLogConfig(run_window_column="ts", copy_partitions=True, dev_ci=False),
        )


def test_merge_validations(spark, wh):
    target = wh.relation("analytics_curated", "bad")
    b = _batch(spark, [(1, TS(2024, 1, 1), 1, 1.0)])
    with pytest.raises(ValueError, match="partition_by"):
        run_incremental_partition_merge(wh, target, b, PartitionMergeConfig(unique_key="event_id"))
    with pytest.raises(ValueError, match="DAY"):
        run_incremental_partition_merge(
            wh, target, b,
            PartitionMergeConfig(partition_by=PartitionSpec("ts", "hour"), unique_key="event_id"),
        )
    with pytest.raises(ValueError, match="unique_key"):
        run_incremental_partition_merge(
            wh, target, b, PartitionMergeConfig(partition_by=PartitionSpec("ts"), unique_key=[])
        )


def test_incremental_log_schema_evolution_append_new_columns(spark, wh):
    target = wh.relation("analytics_curated", "evolving")
    events = _events(spark)
    run_incremental_log(
        wh, target, events, IncrementalLogConfig(run_window_column="ts", dev_ci=False),
        run_started_at=dt.datetime(2024, 1, 10),
    )
    evolved = events.withColumn("extra", F.lit("x"))
    run_incremental_log(
        wh, target, evolved,
        IncrementalLogConfig(run_window_column="ts", on_schema_change="append_new_columns", dev_ci=False),
        run_started_at=dt.datetime(2024, 1, 20),
    )
    out = read_table(wh, target)
    assert "extra" in out.columns
    n_new = out.where(F.col("extra").isNotNull()).count()
    n_old = out.where(F.col("extra").isNull()).count()
    assert n_new > 0 and n_old > 0


# ---------------------------------------------------------------------------
# scd2_snapshot


def _scd2_batch(spark, rows):
    from pyspark.sql import functions as SF2

    df = spark.createDataFrame(rows, "k string, ts string, attr string")
    return df.select("k", SF2.col("ts").cast("timestamp").alias("ts"), "attr")


def _scd2_state(wh, target):
    return sorted(
        (r["k"], str(r["valid_from"]), str(r["valid_to"]), r["is_current"], r["attr"])
        for r in read_table(wh, target).collect()
    )


def test_scd2_snapshot_incremental_converges_to_batch_recompute(spark, wh):
    from edna_dbt_library_spark.operators.materializations import Scd2Config, run_scd2_snapshot
    from edna_dbt_library_spark.operators.relational import scd2_intervals

    cfg = Scd2Config(unique_key="k", event_time="ts")
    b1 = _scd2_batch(spark, [("a", "2024-01-01 00:00:00", "v1"), ("b", "2024-01-02 00:00:00", "w1")])
    b2 = _scd2_batch(spark, [("a", "2024-02-01 00:00:00", "v2")])

    inc = wh.relation("dim", "cust_inc")
    assert run_scd2_snapshot(wh, inc, b1, cfg)["action"] == "create"
    assert run_scd2_snapshot(wh, inc, b2, cfg)["action"] == "merge"

    full = wh.relation("dim", "cust_full")
    run_scd2_snapshot(wh, full, b1.unionByName(b2), cfg)
    assert _scd2_state(wh, inc) == _scd2_state(wh, full)
    # a's first version closed, second open; b untouched and open
    state = {(r[0], r[4]): r for r in _scd2_state(wh, inc)}
    assert not state[("a", "v1")][3] and state[("a", "v1")][2] == "2024-02-01 00:00:00"
    assert state[("a", "v2")][3] and state[("b", "w1")][3]


def test_scd2_snapshot_late_event_splices_retroactively(spark, wh):
    from edna_dbt_library_spark.operators.materializations import Scd2Config, run_scd2_snapshot

    cfg = Scd2Config(unique_key="k", event_time="ts")
    target = wh.relation("dim", "cust_late")
    run_scd2_snapshot(wh, target, _scd2_batch(spark, [
        ("a", "2024-01-01 00:00:00", "v1"), ("a", "2024-03-01 00:00:00", "v3")]), cfg)
    # late event lands BETWEEN the two existing versions
    run_scd2_snapshot(wh, target, _scd2_batch(spark, [("a", "2024-02-01 00:00:00", "v2")]), cfg)
    state = {r[4]: r for r in _scd2_state(wh, target)}
    assert state["v1"][2] == "2024-02-01 00:00:00"  # v1 now closes at the late event
    assert state["v2"][2] == "2024-03-01 00:00:00" and not state["v2"][3]
    assert state["v3"][3]


def test_scd2_snapshot_replay_is_idempotent_and_untouched_keys_preserved(spark, wh):
    from edna_dbt_library_spark.operators.materializations import Scd2Config, run_scd2_snapshot

    cfg = Scd2Config(unique_key="k", event_time="ts")
    target = wh.relation("dim", "cust_replay")
    b1 = _scd2_batch(spark, [("a", "2024-01-01 00:00:00", "v1"), ("b", "2024-01-01 00:00:00", "w1")])
    b2 = _scd2_batch(spark, [("a", "2024-02-01 00:00:00", "v2")])
    run_scd2_snapshot(wh, target, b1, cfg)
    run_scd2_snapshot(wh, target, b2, cfg)
    before = _scd2_state(wh, target)
    run_scd2_snapshot(wh, target, b2, cfg)  # replay
    assert _scd2_state(wh, target) == before
    # empty batch is a no-op
    r = run_scd2_snapshot(wh, target, b2.where(F.lit(False)), cfg)
    assert r["action"] == "noop" and _scd2_state(wh, target) == before


def test_snapshot_time_travel_survives_writes_and_restores(spark, tmp_path):
    """Warehouse snapshots (hardlink farm OUTSIDE the table dir): a
    version reads back bit-identically after appends, dynamic partition
    overwrites, a whole-table replace, AND a compact — the operations
    that delete the original files — and restore() rolls the live table
    back with directory operations only."""
    from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse
    from pyspark.sql import functions as F

    wh = Warehouse(spark, str(tmp_path))
    rel = wh.relation("s", "t")
    base = spark.range(6).select(
        F.col("id"),
        F.concat(F.lit("2024-01-0"), (F.col("id") % 3 + 1).cast("string")).alias("_pdate"),
        (F.col("id") * 10).alias("v"),
    )
    wh.create_as(rel, base, TableMeta(partition_by="_pdate"))
    v1 = wh.snapshot(rel, note="initial")
    rows_v1 = sorted(map(tuple, wh.read(rel).collect()))

    # append + dynamic partition overwrite mutate the live table
    wh.append(rel, base.withColumn("id", F.col("id") + 100))
    wh.overwrite_partitions(
        rel,
        spark.createDataFrame([(999, "2024-01-01", -1)], "id long, _pdate string, v long"),
    )
    v2 = wh.snapshot(rel, note="after-churn")
    assert [s["version"] for s in wh.list_snapshots(rel)] == [v1, v2]

    # whole-table replace deletes every original file
    wh.create_as(rel, base.where(F.col("id") == 0), TableMeta(partition_by="_pdate"))
    # ... and compact rewrites what's left
    wh.compact(rel, target_file_bytes=1, min_files=0)

    assert sorted(map(tuple, wh.read_version(rel, v1).collect())) == rows_v1
    assert wh.read_version(rel, v1).schema == wh.read_version(rel, v2).schema
    # v2 state: the overwrite replaced partition 2024-01-01 (dropping
    # appended id=100 with it) and landed id=999; 101 survived in -02
    assert {r["id"] for r in wh.read_version(rel, v2).collect()} >= {999, 101}
    assert 100 not in {r["id"] for r in wh.read_version(rel, v2).collect()}

    # restore: live table == snapshot v1 again, snapshots intact
    wh.restore(rel, v1)
    assert sorted(map(tuple, wh.read(rel).collect())) == rows_v1
    assert len(wh.list_snapshots(rel)) == 2
    # partition pruning still works post-restore (layout preserved)
    assert wh.partitions(rel) == ["2024-01-01", "2024-01-02", "2024-01-03"]

    # expiry keeps the newest, frees the rest
    assert wh.expire_snapshots(rel, keep_last=1) == [v1]
    assert [s["version"] for s in wh.list_snapshots(rel)] == [v2]
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        wh.read_version(rel, v1)


def test_snapshot_empty_table_and_missing(spark, tmp_path):
    from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse
    import pytest as _pytest

    wh = Warehouse(spark, str(tmp_path))
    rel = wh.relation("s", "empty")
    empty = spark.createDataFrame([], "a long, b string")
    wh.create_as(rel, empty, TableMeta())
    v = wh.snapshot(rel)
    got = wh.read_version(rel, v)
    assert got.count() == 0 and got.schema == empty.schema

    with _pytest.raises(FileNotFoundError, match="missing table"):
        wh.snapshot(wh.relation("s", "nope"))


def test_size_info_counts_underscore_partition_dirs(spark, tmp_path):
    """Regression (latent until the r6 snapshot walk caught it): the
    sidecar-pruning walks must use Spark's hiding rule — `_`-prefixed
    UNLESS it contains '=' — or every `_pdate=...` partition directory
    of an internally-partitioned table is skipped and size_bytes
    reports 0 (feeding a zero into the catalog's __TABLES__ analogue)."""
    from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse
    from pyspark.sql import functions as F

    wh = Warehouse(spark, str(tmp_path))
    rel = wh.relation("s", "sz")
    df = spark.range(10).select(
        "id", F.concat(F.lit("2024-01-0"), (F.col("id") % 2 + 1).cast("string")).alias("_pdate")
    )
    wh.create_as(rel, df, TableMeta(partition_by="_pdate"))
    info = wh.size_info(rel)
    assert info["row_count"] == 10 and info["size_bytes"] > 0
    stats = wh.partition_file_stats(rel)
    assert set(stats) == {"2024-01-01", "2024-01-02"}
    assert all(b > 0 for _n, b in stats.values())


def test_clone_is_zero_copy_and_fully_independent(spark, tmp_path):
    """clone(): hardlinked data + copied sidecars land a dev-schema twin
    of a prod table; mutating either side (overwrite partitions, replace,
    compact, meta rewrite) never leaks into the other."""
    from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse
    from pyspark.sql import functions as F
    import os
    import pytest as _pytest

    wh = Warehouse(spark, str(tmp_path))
    src = wh.relation("prod", "t")
    base = spark.range(6).select(
        F.col("id"),
        F.concat(F.lit("2024-01-0"), (F.col("id") % 3 + 1).cast("string")).alias("_pdate"),
        (F.col("id") * 10).alias("v"),
    )
    wh.create_as(src, base, TableMeta(partition_by="_pdate"))
    rows = sorted(map(tuple, wh.read(src).collect()))

    dst = wh.relation("dev", "t")
    info = wh.clone(src, dst)
    assert info["n_files"] > 0
    assert sorted(map(tuple, wh.read(dst).collect())) == rows
    # layout + meta copied: partition listing works on the clone
    assert wh.partitions(dst) == wh.partitions(src)
    # data files share inodes (zero bytes copied), meta does not
    src_files = sorted(
        os.path.join(dp, f) for dp, _, fs in os.walk(wh.path(src)) for f in fs
        if f.endswith(".parquet")
    )
    dst_files = sorted(
        os.path.join(dp, f) for dp, _, fs in os.walk(wh.path(dst)) for f in fs
        if f.endswith(".parquet")
    )
    assert [os.stat(f).st_ino for f in src_files] == [os.stat(f).st_ino for f in dst_files]
    assert os.stat(wh._meta_path(src)).st_ino != os.stat(wh._meta_path(dst)).st_ino

    # dev-side churn: overwrite a partition, then compact — prod unchanged
    wh.overwrite_partitions(
        dst, spark.createDataFrame([(999, "2024-01-01", -1)], "id long, _pdate string, v long")
    )
    wh.compact(dst, target_file_bytes=1, min_files=0)
    assert sorted(map(tuple, wh.read(src).collect())) == rows
    # prod-side replace — dev keeps its own state
    wh.create_as(src, base.where(F.col("id") == 0), TableMeta(partition_by="_pdate"))
    assert 999 in {r["id"] for r in wh.read(dst).collect()}

    # guards: existing target / missing source refuse; failure leaves no half-clone
    with _pytest.raises(FileExistsError):
        wh.clone(src, dst)
    with _pytest.raises(FileNotFoundError):
        wh.clone(wh.relation("prod", "nope"), wh.relation("dev", "nope"))
    assert not wh.exists(wh.relation("dev", "nope"))


def test_read_changes_incremental_file_diff(spark, tmp_path):
    """read_changes(): Iceberg-style incremental consumption — only the
    files ADDED after a snapshot are read, so downstream deltas are a
    file-list diff, not a table rescan."""
    from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse
    from pyspark.sql import functions as F
    import pytest as _pytest

    wh = Warehouse(spark, str(tmp_path))
    rel = wh.relation("s", "t")

    def batch(lo, hi, day):
        return spark.range(lo, hi).select(
            F.col("id"), F.lit(day).alias("_pdate"), (F.col("id") * 10).alias("v")
        )

    wh.create_as(rel, batch(0, 3, "2024-01-01"), TableMeta(partition_by="_pdate"))
    v1 = wh.snapshot(rel)
    wh.append(rel, batch(3, 6, "2024-01-02"))
    v2 = wh.snapshot(rel)
    wh.append(rel, batch(6, 8, "2024-01-02"))

    ids = lambda df: sorted(r["id"] for r in df.collect())
    assert ids(wh.read_changes(rel, v1, v2)) == [3, 4, 5]          # snapshot->snapshot
    assert ids(wh.read_changes(rel, v1)) == [3, 4, 5, 6, 7]        # snapshot->live
    assert ids(wh.read_changes(rel, v2)) == [6, 7]
    # no changes -> typed empty frame, partition column still derivable
    none = wh.read_changes(rel, v2, v2)
    assert none.count() == 0 and set(wh.read(rel).columns) == set(none.columns)
    assert "_pdate" in wh.read_changes(rel, v1, v2).columns
    with _pytest.raises(ValueError, match=">= since_version"):
        wh.read_changes(rel, v2, v1)

    # documented file-level caveat: a partition overwrite's files are new
    wh.overwrite_partitions(
        rel, spark.createDataFrame([(99, "2024-01-01", -1)], "id long, _pdate string, v long")
    )
    assert 99 in ids(wh.read_changes(rel, v2))


def test_cdc_refresh_converges_and_is_crash_idempotent(spark, tmp_path):
    """run_cdc_refresh: per-key derived table maintained off the
    changed-file feed equals a full recompute after each refresh; a
    replayed delta (crash between merge and watermark) converges to the
    same state; other consumers' snapshots survive the watermark churn."""
    from edna_dbt_library_spark.operators.materializations import (
        PartitionMergeConfig,
        PartitionSpec,
        run_cdc_refresh,
    )
    from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse

    wh = Warehouse(spark, str(tmp_path))
    src, tgt = wh.relation("s", "raw"), wh.relation("s", "clean")

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"),
            F.to_timestamp(
                F.concat(F.lit("2024-01-0"), (F.col("id") % 3 + 1).cast("string"))
            ).alias("ts"),
            (F.col("id") * 10).alias("v"),
        )

    # per-row transform: filter + derived column (CDC-safe shape)
    def transform(df):
        return df.where(F.col("v") % 20 == 0).withColumn("v2", F.col("v") * 2)

    cfg = PartitionMergeConfig(partition_by=PartitionSpec("ts"), unique_key="k")
    wh.create_as(src, batch(0, 6), TableMeta())
    keep = wh.snapshot(src, note="user-time-travel")  # an unrelated consumer

    r1 = run_cdc_refresh(wh, src, tgt, transform, cfg)
    assert r1["cdc_mode"] == "full"
    full = lambda: sorted(map(tuple, transform(wh.read(src)).select("k", "v", "v2").collect()))
    got = lambda: sorted(map(tuple, wh.read(tgt).select("k", "v", "v2").collect()))
    assert got() == full()

    # new source files; crash-sim FIRST: a run that merged the delta but
    # died before advancing the watermark…
    from edna_dbt_library_spark.operators.materializations import (
        run_incremental_partition_merge,
    )

    wh.append(src, batch(6, 12))
    run_incremental_partition_merge(
        wh, tgt, transform(wh.read_changes(src, r1["cdc_watermark"])), cfg
    )
    crashed_state = got()
    # …the rerun re-reads the SAME delta (watermark still r1's), re-merges
    # it idempotently, and only then advances the watermark
    r2 = run_cdc_refresh(wh, src, tgt, transform, cfg)
    assert r2["cdc_mode"] == "delta"
    assert got() == crashed_state == full()

    # no source change -> empty delta, state untouched
    before = got()
    r3 = run_cdc_refresh(wh, src, tgt, transform, cfg)
    assert r3["cdc_mode"] == "delta" and got() == before == full()

    # unrelated snapshot untouched; exactly one cdc watermark remains
    notes = [s["note"] for s in wh.list_snapshots(src)]
    assert "user-time-travel" in notes
    assert sum(1 for n in notes if n == f"cdc:{tgt.table_id}") == 1
    assert wh.read_version(src, keep).count() == 6


def test_expire_snapshots_protects_cdc_watermarks(spark, tmp_path):
    """A blanket expiry (e.g. the Runner's pre-write keep_last) must not
    drop another pipeline's cdc: watermark — only plain snapshots count
    toward keep_last; protect_note_prefix=None expires unconditionally."""
    from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse

    wh = Warehouse(spark, str(tmp_path))
    rel = wh.relation("s", "t")
    wh.create_as(rel, spark.range(3).select(F.col("id").alias("k")), TableMeta())
    v_old = wh.snapshot(rel, note="pre-write run-1")
    v_cdc = wh.snapshot(rel, note="cdc:dev.clean")
    v_new = wh.snapshot(rel, note="pre-write run-2")

    assert wh.expire_snapshots(rel, keep_last=1) == [v_old]
    left = {s["version"] for s in wh.list_snapshots(rel)}
    assert left == {v_cdc, v_new}  # watermark survived, newest plain kept
    # unconditional expiry drops the watermark too
    assert wh.expire_snapshots(rel, keep_last=1, protect_note_prefix=None) == [v_cdc]
    assert [s["version"] for s in wh.list_snapshots(rel)] == [v_new]


def test_cdc_refresh_concurrent_append_is_not_skipped(spark, tmp_path):
    """Files appended to the source WHILE a refresh runs must be picked
    up by the NEXT refresh: the watermark snapshot is taken before the
    delta read and the read is pinned to it, so a concurrent writer's
    files land strictly after the watermark. (Snapshotting after the
    merge would capture them unread — permanent data loss.) A failed
    refresh leaves the watermark exactly where it was."""
    from edna_dbt_library_spark.operators.materializations import (
        PartitionMergeConfig,
        PartitionSpec,
        run_cdc_refresh,
    )
    from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse

    wh = Warehouse(spark, str(tmp_path))
    src, tgt = wh.relation("s", "raw"), wh.relation("s", "clean")

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"),
            F.to_timestamp(F.lit("2024-01-01")).alias("ts"),
            (F.col("id") * 10).alias("v"),
        )

    cfg = PartitionMergeConfig(partition_by=PartitionSpec("ts"), unique_key="k")
    wh.create_as(src, batch(0, 4), TableMeta())

    appended_mid_refresh = {"done": False}

    def racing_transform(df):
        # localCheckpoint pins the delta's content BEFORE the concurrent
        # append (a lazy plan re-listing live files would mask the race)
        pinned = df.localCheckpoint(eager=True)
        if not appended_mid_refresh["done"]:
            wh.append(src, batch(4, 8))  # concurrent writer mid-refresh
            appended_mid_refresh["done"] = True
        return pinned

    r1 = run_cdc_refresh(wh, src, tgt, racing_transform, cfg)
    got = lambda: sorted(r["k"] for r in wh.read(tgt).collect())
    assert got() == [0, 1, 2, 3]  # mid-refresh rows not in THIS run…

    r2 = run_cdc_refresh(wh, src, tgt, lambda df: df, cfg)
    assert r2["cdc_mode"] == "delta"
    assert got() == list(range(8))  # …but never lost: next delta has them

    # failed refresh: watermark (and target) unchanged, no orphan snapshot
    wh.append(src, batch(8, 10))
    marks = lambda: [
        s["version"] for s in wh.list_snapshots(src) if s["note"] == f"cdc:{tgt.table_id}"
    ]
    before = marks()

    def boom(df):
        raise RuntimeError("transform failed")

    with pytest.raises(RuntimeError, match="transform failed"):
        run_cdc_refresh(wh, src, tgt, boom, cfg)
    assert marks() == before and got() == list(range(8))
    r3 = run_cdc_refresh(wh, src, tgt, lambda df: df, cfg)
    assert got() == list(range(10))


def test_read_changes_incremental_manifest_chain(spark, tmp_path):
    """Pinned-version read_changes resolves its added-file list from the
    per-snapshot delta.json chain (O(delta) metadata) — proven by
    tampering the monolithic manifests' file lists and seeing the read
    unaffected. A dropped intermediate snapshot breaks the chain and
    falls back to the full manifest diff with identical results."""
    import json as _json
    import os as _os

    from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse

    wh = Warehouse(spark, str(tmp_path))
    rel = wh.relation("s", "t")

    def batch(lo, hi, day):
        return spark.range(lo, hi).select(
            F.col("id"), F.lit(day).alias("_pdate"), (F.col("id") * 10).alias("v")
        )

    wh.create_as(rel, batch(0, 3, "2024-01-01"), TableMeta(partition_by="_pdate"))
    v1 = wh.snapshot(rel)
    wh.append(rel, batch(3, 6, "2024-01-02"))
    v2 = wh.snapshot(rel)
    wh.append(rel, batch(6, 8, "2024-01-03"))
    v3 = wh.snapshot(rel)

    ids = lambda df: sorted(r["id"] for r in df.collect())
    assert ids(wh.read_changes(rel, v1, v3)) == [3, 4, 5, 6, 7]
    assert ids(wh.read_changes(rel, v2, v3)) == [6, 7]
    assert ids(wh.read_changes(rel, v1, v1)) == []

    # tamper every monolithic manifest's file list: the chain path must
    # not even look at it (only existence is checked)
    backups = {}
    for v in (v1, v2, v3):
        mf = _os.path.join(wh._snapshots_dir(rel), f"v{v}", "manifest.json")
        backups[v] = open(mf).read()
        m = _json.loads(backups[v])
        m["files"] = ["bogus/never-read.parquet"]
        with open(mf, "w") as f:
            _json.dump(m, f)
    assert ids(wh.read_changes(rel, v1, v3)) == [3, 4, 5, 6, 7]
    for v, raw in backups.items():
        mf = _os.path.join(wh._snapshots_dir(rel), f"v{v}", "manifest.json")
        with open(mf, "w") as f:
            f.write(raw)

    # broken chain (intermediate snapshot dropped) -> full-diff fallback
    wh.drop_snapshot(rel, v2)
    assert ids(wh.read_changes(rel, v1, v3)) == [3, 4, 5, 6, 7]
    # live-target read (no to_version) still works
    assert ids(wh.read_changes(rel, v1)) == [3, 4, 5, 6, 7]


def test_stream_cdc_refresh_converges_to_batch_refresh_state(spark, tmp_path):
    """stream_cdc_refresh (streaming twin of run_cdc_refresh): drained
    under maxFilesPerTrigger=1 chopping, the streamed target state must
    equal the batch run_cdc_refresh target over the same source; a
    restarted drain after new appends processes only the new files and
    the states stay equal."""
    from edna_dbt_library_spark.operators.materializations import (
        PartitionMergeConfig,
        PartitionSpec,
        run_cdc_refresh,
    )
    from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse
    from edna_dbt_library_spark.streaming import stream_cdc_refresh

    wh_s = Warehouse(spark, str(tmp_path / "wh_stream"))
    wh_b = Warehouse(spark, str(tmp_path / "wh_batch"))

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"),
            F.to_timestamp(
                F.concat(F.lit("2024-01-0"), (F.col("id") % 3 + 1).cast("string"))
            ).alias("ts"),
            (F.col("id") * 10).alias("v"),
        )

    # per-row transform: chopping-independent (see stream_cdc_refresh doc)
    def transform(df):
        return df.where(F.col("v") % 20 == 0).withColumn("v2", F.col("v") * 2)

    cfg = PartitionMergeConfig(partition_by=PartitionSpec("ts"), unique_key="k")
    ckpt = str(tmp_path / "ckpt")

    for wh in (wh_s, wh_b):
        wh.create_as(wh.relation("s", "raw"), batch(0, 6), TableMeta())

    def drain():
        q = stream_cdc_refresh(
            wh_s,
            wh_s.relation("s", "raw"),
            wh_s.relation("s", "clean"),
            transform,
            cfg,
            checkpoint_path=ckpt,
            max_files_per_trigger=1,  # force many tiny micro-batches
        )
        q.awaitTermination(180)

    state = lambda wh: sorted(
        map(tuple, wh.read(wh.relation("s", "clean")).select("k", "v", "v2").collect())
    )

    drain()
    run_cdc_refresh(
        wh_b, wh_b.relation("s", "raw"), wh_b.relation("s", "clean"), transform, cfg
    )
    assert state(wh_s) == state(wh_b) and len(state(wh_s)) > 0

    # new source files: restarted drain picks up ONLY the new ones
    for wh in (wh_s, wh_b):
        wh.append(wh.relation("s", "raw"), batch(6, 12))
    drain()
    run_cdc_refresh(
        wh_b, wh_b.relation("s", "raw"), wh_b.relation("s", "clean"), transform, cfg
    )
    assert state(wh_s) == state(wh_b)
    assert {r[0] for r in state(wh_s)} == {0, 2, 4, 6, 8, 10}


def test_read_changes_chain_breaks_across_restore(spark, tmp_path):
    """restore() RE-ADDS previously-removed file paths, which violates
    the delta chain's path-added-at-most-once algebra: a pinned read
    spanning add -> compact-remove -> restore-re-add would silently
    drop the re-added files if the chain were trusted. restore marks
    the chain broken; the next snapshot's delta has no parent, so the
    read falls back to the exact full-manifest diff."""
    from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse

    wh = Warehouse(spark, str(tmp_path))
    rel = wh.relation("s", "t")

    def batch(lo, hi):
        return spark.range(lo, hi).select(F.col("id"), (F.col("id") * 10).alias("v"))

    wh.create_as(rel, batch(0, 3), TableMeta())
    v1 = wh.snapshot(rel)
    wh.append(rel, batch(3, 6))
    v2 = wh.snapshot(rel)
    # compact rewrites everything into new paths (removes v1+v2 paths)
    wh.compact(rel, target_file_bytes=1 << 30, min_files=1)
    wh.snapshot(rel)
    # restore re-creates v2's ORIGINAL paths — the re-add
    wh.restore(rel, v2)
    v4 = wh.snapshot(rel)

    ids = lambda df: sorted(r["id"] for r in df.collect())
    # exact answer: files in v4 not in v1 = the appended batch's paths
    assert ids(wh.read_changes(rel, v1, v4)) == [3, 4, 5]
    # the fallback was REQUIRED: the naive chain algebra over the same
    # range drops the re-added paths entirely
    naive = wh._delta_chain(rel, v1, v4)
    assert naive is None  # chain reports broken, never a wrong answer
    # chains not spanning the restore still work
    wh.append(rel, batch(6, 8))
    v5 = wh.snapshot(rel)
    assert wh._delta_chain(rel, v4, v5) is not None
    assert ids(wh.read_changes(rel, v4, v5)) == [6, 7]
