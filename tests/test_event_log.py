"""Event-log subsystem tests (reference: macros/utils/log_helpers.sql):
event validation, watermark recovery fallback chain, history-load caps,
earliest-partition fallback, timestamp string helpers."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from edna_dbt_library_spark.functions.timestamps import (
    DEFAULT_WATERMARK,
    max_ts_string,
    min_ts_string,
)
from edna_dbt_library_spark.sources import Relation, TableMeta, Warehouse
from edna_dbt_library_spark.sources.event_log import (
    EVENT_LOG_SCHEMA,
    apply_history_load_limit,
    apply_history_load_limit_adjusted,
    get_earliest_partition_timestamp,
    get_last_successful_run_window_end,
    ids_for_relation,
    log_model_event,
)

TARGET = Relation(schema="analytics_curated", identifier="orders_daily", database="proj")


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"), database="proj")


def test_ids_for_relation():
    ids = ids_for_relation(TARGET, "analytics")
    assert ids.table_id == "proj.analytics_curated.orders_daily"
    assert ids.log_schema == "analytics_dbt_raw"
    assert ids.log_table == "analytics_dbt_event_log"
    assert ids.log_relation.table_id == "proj.analytics_dbt_raw.analytics_dbt_event_log"


def test_log_event_roundtrip_and_schema(spark, wh):
    ids = ids_for_relation(TARGET, "analytics")
    log_model_event(
        wh, ids, "model_run_started",
        "2024-01-01 00:00:00.000000 UTC", "2024-01-02 00:00:00.000000 UTC",
        model_name="orders_daily", message="hello 'quoted'",
    )
    df = wh.read(ids.log_relation)
    row = df.collect()[0]
    assert [f.name for f in EVENT_LOG_SCHEMA.fields] == [c for c in df.columns if c != "_pdate"]
    assert row["eventType"] == "model_run_started"
    assert row["runWindowStart"] == dt.datetime(2024, 1, 1)
    assert row["runWindowEnd"] == dt.datetime(2024, 1, 2)
    assert row["eventMessage"] == "hello 'quoted'"
    assert len(row["eventId"]) == 36


def test_log_event_invalid_type_and_empty_run(spark, wh):
    ids = ids_for_relation(TARGET, "analytics")
    with pytest.raises(ValueError, match="invalid event_type"):
        log_model_event(wh, ids, "model_run_exploded", None, None)
    log_model_event(wh, ids, "model_run_started", None, None, empty_run=True)
    assert not wh.exists(ids.log_relation)  # --empty writes nothing


def test_watermark_picks_latest_succeeded_only(spark, wh):
    ids = ids_for_relation(TARGET, "analytics")
    log_model_event(wh, ids, "model_run_succeeded", None, "2024-01-05 00:00:00.000000 UTC")
    log_model_event(wh, ids, "model_run_succeeded", None, "2024-01-07 00:00:00.000000 UTC")
    log_model_event(wh, ids, "model_run_started", None, "2024-01-09 00:00:00.000000 UTC")
    log_model_event(wh, ids, "model_run_failed", None, "2024-01-09 00:00:00.000000 UTC")
    # a succeeded run with NULL window end is skipped
    log_model_event(wh, ids, "model_run_succeeded", None, None)
    wm = get_last_successful_run_window_end(wh, ids, dev_ci=False)
    assert wm == "2024-01-07 00:00:00.000000 UTC"


def test_watermark_default_when_no_log(spark, wh):
    ids = ids_for_relation(TARGET, "analytics")
    assert get_last_successful_run_window_end(wh, ids, dev_ci=False) == DEFAULT_WATERMARK


def test_watermark_dev_ci_fallback_chain(spark, wh):
    """dev/ci: deployed-table log row wins; else the dev table's own row;
    else source earliest partition; else default
    (reference: log_helpers.sql:77-143)."""
    dev_target = Relation(schema="dbt_cloud_user_7", identifier="orders_daily", database="proj")
    ids = ids_for_relation(dev_target, "analytics")
    deployed_id = "proj.analytics_curated.orders_daily"

    # nothing logged at all -> default
    assert get_last_successful_run_window_end(
        wh, ids, deployed_table_id=deployed_id, dev_ci=True
    ) == DEFAULT_WATERMARK

    # dev table's own log row
    log_model_event(wh, ids, "model_run_succeeded", None, "2024-02-01 00:00:00.000000 UTC")
    assert get_last_successful_run_window_end(
        wh, ids, deployed_table_id=deployed_id, dev_ci=True
    ) == "2024-02-01 00:00:00.000000 UTC"

    # deployed row takes precedence once present
    prod_ids = ids_for_relation(TARGET, "analytics")
    log_model_event(wh, prod_ids, "model_run_succeeded", None, "2024-03-01 00:00:00.000000 UTC")
    assert get_last_successful_run_window_end(
        wh, ids, deployed_table_id=deployed_id, dev_ci=True
    ) == "2024-03-01 00:00:00.000000 UTC"


def test_watermark_source_partition_fallback(spark, wh):
    """No log rows + configured source table -> earliest partition
    boundary minus 1 microsecond (reference: log_helpers.sql:307-334)."""
    src = wh.relation("analytics_raw", "events_src")
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 5, 10)), (2, dt.datetime(2024, 1, 7, 10))],
        "id bigint, ts timestamp",
    ).withColumn("_pdate", F.to_date("ts"))
    wh.create_as(src, df, TableMeta(partition_by="_pdate", partition_source="ts"))

    assert get_earliest_partition_timestamp(wh, src) == "2024-01-04 23:59:59.999999 UTC"
    ids = ids_for_relation(TARGET, "analytics")
    wm = get_last_successful_run_window_end(wh, ids, dev_ci=False, source_rel=src)
    assert wm == "2024-01-04 23:59:59.999999 UTC"


def test_history_load_limit():
    start = "2024-01-01 00:00:00.000000 UTC"
    end = "2024-03-01 00:00:00.000000 UTC"
    # no cap configured -> unchanged
    assert apply_history_load_limit(None, start, end, dev_ci=False) == end
    # capped to 10 days
    assert apply_history_load_limit(10, start, end, dev_ci=False) == "2024-01-11 00:00:00.000000 UTC"
    # cap beyond end -> unchanged
    assert apply_history_load_limit(90, start, end, dev_ci=False) == end
    # dev/ci clamps to 1 day
    assert apply_history_load_limit(90, start, end, dev_ci=True) == "2024-01-02 00:00:00.000000 UTC"
    # dev/ci override
    assert apply_history_load_limit(90, start, end, 5, dev_ci=True) == "2024-01-06 00:00:00.000000 UTC"
    # datetime window_end accepted
    got = apply_history_load_limit(None, start, dt.datetime(2024, 2, 1), dev_ci=False)
    assert got == "2024-02-01 00:00:00.000000 UTC"


def test_history_load_limit_adjusted_table_window_end():
    start = "2024-01-01 00:00:00.000000 UTC"
    end = "2024-03-01 00:00:00.000000 UTC"
    got = apply_history_load_limit_adjusted(
        30, start, end, table_window_end="2024-01-15 00:00:00.000000 UTC", dev_ci=False
    )
    assert got == "2024-01-15 00:00:00.000000 UTC"


def test_hook_wrappers_roundtrip(spark, wh):
    """Pre-hook resolves the window from the log; post-hook records the
    success event the next pre-hook resumes from
    (reference: log_helpers.sql:165-210)."""
    from edna_dbt_library_spark.sources.event_log import (
        log_model_run_started_pre_hook,
        log_model_run_succeeded_post_hook,
    )

    ids = ids_for_relation(TARGET, "analytics")
    log_model_event(wh, ids, "model_run_succeeded", None, "2024-01-05 00:00:00.000000 UTC")
    start, end = log_model_run_started_pre_hook(
        wh, TARGET, "analytics", max_history_load_days=3, dev_ci=False
    )
    assert start == "2024-01-05 00:00:00.000000 UTC"
    assert end == "2024-01-08 00:00:00.000000 UTC"  # capped at start + 3 days
    log_model_run_succeeded_post_hook(
        wh, TARGET, "analytics", run_window_start=start, run_window_end=end, dev_ci=False
    )
    wm = get_last_successful_run_window_end(wh, ids, dev_ci=False)
    assert wm == end


def test_min_max_ts_string_helpers():
    ts = ["2024-01-02 00:00:00.000000 UTC", "2024-01-01 05:00:00.123456 UTC", None, "", "None"]
    assert min_ts_string(ts) == "2024-01-01 05:00:00.123456 UTC"
    assert max_ts_string(ts) == "2024-01-02 00:00:00.000000 UTC"
    assert min_ts_string([None, ""]) is None
