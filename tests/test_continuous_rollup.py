"""Continuous-aggregate (hypertable-rollup-style) composition: hourly
rollups maintained incrementally with incremental_partition_merge.

The pattern: the model computes per-(hour, event_type) aggregates of a
source window; the materialization upserts them keyed on (hour bucket,
event_type) with event_time = the max source ts in the bucket. Re-running
over overlapping windows replaces partial boundary buckets with their
fuller recomputation (strictly newer max-ts wins), so after any sequence
of overlapping runs the table equals the full recompute."""

import pytest
from pyspark.sql import functions as F

from edna_dbt_library_spark.operators import (
    PartitionMergeConfig,
    PartitionSpec,
    read_table,
    run_incremental_partition_merge,
)
from edna_dbt_library_spark.sources import Warehouse
from edna_dbt_library_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def hourly_rollup(events):
    return (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("bucket"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(12,2)")), 2).cast("double").alias("sum_value"),
            F.max("ts").alias("last_event_ts"),
        )
    )


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def test_incremental_hourly_rollup_converges(spark, wh):
    events = load_table(spark, SF, "events")
    target = wh.relation("analytics_curated", "events_hourly")
    cfg = PartitionMergeConfig(
        partition_by=PartitionSpec("bucket"),
        unique_key=["bucket", "event_type"],
        event_time="last_event_ts",
    )

    # three overlapping incremental windows (half-open, boundary mid-hour
    # so boundary buckets are recomputed by the next run)
    windows = [
        (None, "2024-01-10 12:30:00"),
        ("2024-01-10 11:00:00", "2024-01-20 07:45:00"),
        ("2024-01-20 00:00:00", "2024-01-30 23:59:59"),
    ]
    for lo, hi in windows:
        cond = F.col("ts") <= F.lit(hi).cast("timestamp")
        if lo:
            cond = cond & (F.col("ts") > F.lit(lo).cast("timestamp"))
        run_incremental_partition_merge(wh, target, hourly_rollup(events.where(cond)), cfg)

    got = read_table(wh, target).select("bucket", "event_type", "n_events", "sum_value")
    full = hourly_rollup(events.where(F.col("ts") <= "2024-01-30 23:59:59")).select(
        "bucket", "event_type", "n_events", "sum_value"
    )
    assert got.exceptAll(full).count() == 0
    assert full.exceptAll(got).count() == 0
    assert got.count() == full.count() > 0


def test_rollup_replay_idempotent(spark, wh):
    events = load_table(spark, SF, "events")
    target = wh.relation("analytics_curated", "events_hourly_replay")
    cfg = PartitionMergeConfig(
        partition_by=PartitionSpec("bucket"),
        unique_key=["bucket", "event_type"],
        event_time="last_event_ts",
    )
    batch = hourly_rollup(events.where(F.col("ts") <= "2024-01-15"))
    run_incremental_partition_merge(wh, target, batch, cfg)
    n1 = read_table(wh, target).count()
    run_incremental_partition_merge(wh, target, batch, cfg)  # crash-rerun
    assert read_table(wh, target).count() == n1
