"""Append-only run-event log + watermark recovery.

Parity target: the reference's logging/bookkeeping subsystem
(macros/utils/log_helpers.sql). One row per model-run event
(started/succeeded/failed); the latest successful run's ``runWindowEnd``
is the incremental watermark the next run resumes from.

Scale notes: the log table is tiny relative to data tables but grows
forever; it is day-partitioned on ``insertTime`` so watermark reads prune
to recent partitions, and the top-1 read is expressed as max() (a partial
aggregate, no global sort).
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from edna_dbt_library_spark.functions.timestamps import (
    DEFAULT_WATERMARK,
    fmt_ts,
    minus_microsecond,
    parse_ts,
)
from edna_dbt_library_spark.sources.warehouse import Relation, TableMeta, Warehouse

ALLOWED_EVENT_TYPES = ("model_run_started", "model_run_succeeded", "model_run_failed")

# Column order and names from the reference's INSERT
# (macros/utils/log_helpers.sql:46-73); see FIXTURES.md §B.
EVENT_LOG_SCHEMA = T.StructType(
    [
        T.StructField("eventId", T.StringType()),
        T.StructField("eventTimestamp", T.TimestampType()),
        T.StructField("eventType", T.StringType()),
        T.StructField("bigQueryProjectId", T.StringType()),
        T.StructField("bigQueryDatasetId", T.StringType()),
        T.StructField("bigQueryTableId", T.StringType()),
        T.StructField("dbtModelName", T.StringType()),
        T.StructField("dbtNodeUniqueId", T.StringType()),
        T.StructField("dbtInvocationId", T.StringType()),
        T.StructField("dbtInvocationContext", T.StringType()),
        T.StructField("dbtJobId", T.StringType()),
        T.StructField("dbtRunId", T.StringType()),
        T.StructField("dbtRunReasonCategory", T.StringType()),
        T.StructField("dbtRunReason", T.StringType()),
        T.StructField("dbtGitSha", T.StringType()),
        T.StructField("runWindowStart", T.TimestampType()),
        T.StructField("runWindowEnd", T.TimestampType()),
        T.StructField("eventMessage", T.StringType()),
        T.StructField("insertTime", T.TimestampType()),
    ]
)


@dataclass(frozen=True)
class RelationIds:
    """Derived ids for a relation (reference: log_helpers.sql:2-18):
    the event-log table lives at ``{domain}_dbt_raw.{domain}_dbt_event_log``
    in the same database."""

    domain: str
    project_id: str
    dataset_id: str
    table_id: str
    log_schema: str
    log_table: str

    @property
    def log_relation(self) -> Relation:
        return Relation(schema=self.log_schema, identifier=self.log_table, database=self.project_id)


def ids_for_relation(relation: Relation, domain: str) -> RelationIds:
    return RelationIds(
        domain=domain,
        project_id=relation.database,
        dataset_id=relation.schema,
        table_id=f"{relation.database}.{relation.schema}.{relation.identifier}",
        log_schema=f"{domain}_dbt_raw",
        log_table=f"{domain}_dbt_event_log",
    )


def cloud_env_values() -> dict[str, str | None]:
    """Optional CI/cloud environment metadata → NULLable literals
    (reference: log_helpers.sql:146-162)."""

    def get(name: str) -> str | None:
        v = os.environ.get(name, "")
        return v if v else None

    return {
        "invocation_context": get("DBT_CLOUD_INVOCATION_CONTEXT"),
        "job_id": get("DBT_CLOUD_JOB_ID"),
        "run_id": get("DBT_CLOUD_RUN_ID"),
        "run_reason_cat": get("DBT_CLOUD_RUN_REASON_CATEGORY"),
        "run_reason": get("DBT_CLOUD_RUN_REASON"),
        "git_sha": get("DBT_CLOUD_GIT_SHA"),
    }


def invocation_context() -> str:
    return (os.environ.get("DBT_CLOUD_INVOCATION_CONTEXT", "") or "").lower()


def is_dev_ci() -> bool:
    return invocation_context() in ("dev", "ci")


def log_model_event(
    wh: Warehouse,
    ids: RelationIds,
    event_type: str,
    window_start: str | None,
    window_end: str | None,
    *,
    model_name: str = "",
    node_unique_id: str = "",
    invocation_id: str = "",
    event_ts: str | None = None,
    message: str | None = None,
    empty_run: bool = False,
) -> None:
    """Append one event row (reference: log_helpers.sql:21-74).

    ``empty_run`` mirrors the ``--empty`` short-circuit (:23-26): nothing is
    written. Timestamps are canonical '%Y-%m-%d %H:%M:%S.%f UTC' strings.
    """
    if empty_run:
        return
    if event_type not in ALLOWED_EVENT_TYPES:
        raise ValueError(
            f"log_model_event: invalid event_type '{event_type}' (allowed: {ALLOWED_EVENT_TYPES})"
        )
    cloud = cloud_env_values()
    now = datetime.now(timezone.utc).replace(tzinfo=None)
    row = (
        str(uuid.uuid4()),
        parse_ts(event_ts) if event_ts else now,
        event_type,
        ids.project_id,
        ids.dataset_id,
        ids.table_id,
        model_name,
        node_unique_id,
        invocation_id,
        cloud["invocation_context"],
        cloud["job_id"],
        cloud["run_id"],
        cloud["run_reason_cat"],
        cloud["run_reason"],
        cloud["git_sha"],
        parse_ts(window_start) if window_start else None,
        parse_ts(window_end) if window_end else None,
        message,
        now,
    )
    df = wh.spark.createDataFrame([row], EVENT_LOG_SCHEMA).withColumn(
        "_pdate", F.to_date("insertTime")
    )
    log_rel = ids.log_relation
    if not wh.exists(log_rel):
        wh.create_as(log_rel, df, TableMeta(partition_by="_pdate", partition_source="insertTime"))
    else:
        wh.append(log_rel, df)


def _top1_window_end(wh: Warehouse, log_rel: Relation, table_id: str) -> str | None:
    """Latest runWindowEnd among successful runs of ``table_id``
    (reference: log_helpers.sql:100-106 — QUALIFY ROW_NUMBER()=1 over
    runWindowEnd DESC ≡ max())."""
    if not wh.exists(log_rel):
        return None
    row = (
        wh.read(log_rel)
        .where(
            (F.col("bigQueryTableId") == table_id)
            & (F.col("eventType") == "model_run_succeeded")
            & F.col("runWindowEnd").isNotNull()
        )
        .agg(F.max("runWindowEnd").alias("we"))
        .collect()[0]
    )
    return fmt_ts(row["we"]) if row["we"] is not None else None


def get_earliest_partition_timestamp(wh: Warehouse, rel: Relation) -> str | None:
    """Earliest partition boundary − 1 μs (reference:
    log_helpers.sql:307-334). Partition ids come from the directory
    listing — no data scan."""
    parts = [p for p in wh.partitions(rel) if p not in ("__HIVE_DEFAULT_PARTITION__",)]
    if not parts:
        return None
    earliest = min(parts)
    try:
        dt = datetime.strptime(earliest, "%Y-%m-%d")
    except ValueError:
        return None
    return fmt_ts(minus_microsecond(dt))


def get_last_successful_run_window_end(
    wh: Warehouse,
    ids: RelationIds,
    *,
    deployed_table_id: str | None = None,
    dev_ci: bool | None = None,
    source_rel: Relation | None = None,
    default: str = DEFAULT_WATERMARK,
) -> str:
    """Watermark recovery with the reference's fallback chain
    (log_helpers.sql:77-143):

    1. log row for the *deployed* table id (prod naming) — in dev/ci the
       deployed id differs from the target id;
    2. (dev/ci only) log row for the dev/ci table id itself;
    3. the source table's earliest partition boundary − 1 μs;
    4. the 1900-01-01 default.
    """
    dev_ci = is_dev_ci() if dev_ci is None else dev_ci
    log_rel = ids.log_relation
    primary_id = deployed_table_id if (dev_ci and deployed_table_id) else ids.table_id
    ts = _top1_window_end(wh, log_rel, primary_id)
    if ts is None and dev_ci:
        ts = _top1_window_end(wh, log_rel, ids.table_id)
    if ts is None and source_rel is not None:
        ts = get_earliest_partition_timestamp(wh, source_rel)
    return ts or default


def log_model_run_started_pre_hook(
    wh: Warehouse,
    relation: Relation,
    domain: str,
    *,
    message: str | None = None,
    max_history_load_days: int | None = None,
    run_window_start: str | None = None,
    run_window_end: str | None = None,
    max_history_load_days_dev_ci: int | None = None,
    table_window_end: str | None = None,
    model_name: str = "",
    dev_ci: bool | None = None,
) -> tuple[str, str]:
    """Pre-hook wrapper: resolve window bounds then log the started event
    (reference: log_helpers.sql:165-188). Returns (start, end) so the
    caller can reuse the resolved window."""
    started_ts = fmt_ts(datetime.now(timezone.utc).replace(tzinfo=None))
    ids = ids_for_relation(relation, domain)
    if not run_window_start:
        run_window_start = get_last_successful_run_window_end(wh, ids, dev_ci=dev_ci)
    if not run_window_end:
        run_window_end = apply_history_load_limit_adjusted(
            max_history_load_days,
            run_window_start,
            datetime.now(timezone.utc).replace(tzinfo=None),
            max_history_load_days_dev_ci,
            table_window_end,
            dev_ci=dev_ci,
        )
    log_model_event(
        wh, ids, "model_run_started", run_window_start, run_window_end,
        model_name=model_name or relation.identifier, event_ts=started_ts, message=message,
    )
    return run_window_start, run_window_end


def log_model_run_succeeded_post_hook(
    wh: Warehouse,
    relation: Relation,
    domain: str,
    *,
    message: str | None = None,
    max_history_load_days: int | None = None,
    run_window_start: str | None = None,
    run_window_end: str | None = None,
    max_history_load_days_dev_ci: int | None = None,
    table_window_end: str | None = None,
    model_name: str = "",
    dev_ci: bool | None = None,
) -> tuple[str, str]:
    """Post-hook wrapper (reference: log_helpers.sql:190-210)."""
    ids = ids_for_relation(relation, domain)
    if not run_window_start:
        run_window_start = get_last_successful_run_window_end(wh, ids, dev_ci=dev_ci)
    if not run_window_end:
        run_window_end = apply_history_load_limit_adjusted(
            max_history_load_days,
            run_window_start,
            datetime.now(timezone.utc).replace(tzinfo=None),
            max_history_load_days_dev_ci,
            table_window_end,
            dev_ci=dev_ci,
        )
    log_model_event(
        wh, ids, "model_run_succeeded", run_window_start, run_window_end,
        model_name=model_name or relation.identifier, message=message,
    )
    return run_window_start, run_window_end


def apply_history_load_limit(
    max_history_load_days: int | None,
    window_start: str | None,
    window_end: str | datetime,
    max_history_load_days_dev_ci: int | None = None,
    *,
    dev_ci: bool | None = None,
) -> str:
    """Cap ``window_end`` at ``window_start + max_days``; dev/ci clamps to
    1 day unless overridden (reference: log_helpers.sql:213-238)."""
    if isinstance(window_end, datetime):
        window_end_str = fmt_ts(window_end)
    else:
        window_end_str = window_end
    if not (max_history_load_days or max_history_load_days_dev_ci):
        return window_end_str
    dev_ci = is_dev_ci() if dev_ci is None else dev_ci
    load_days = int(max_history_load_days or 0)
    if dev_ci:
        load_days = int(max_history_load_days_dev_ci) if max_history_load_days_dev_ci else 1
    if load_days > 0 and window_start:
        from datetime import timedelta

        max_load_end = parse_ts(window_start) + timedelta(days=load_days)
        if max_load_end < parse_ts(window_end_str):
            return fmt_ts(max_load_end)
    return window_end_str


def apply_history_load_limit_adjusted(
    max_history_load_days: int | None,
    window_start: str | None,
    window_end: str | datetime,
    max_history_load_days_dev_ci: int | None = None,
    table_window_end: str | None = None,
    *,
    dev_ci: bool | None = None,
) -> str:
    """Additionally cap at a configured ``table_window_end``
    (reference: log_helpers.sql:241-252)."""
    from edna_dbt_library_spark.functions.timestamps import min_ts_string

    calculated = apply_history_load_limit(
        max_history_load_days, window_start, window_end, max_history_load_days_dev_ci, dev_ci=dev_ci
    )
    if table_window_end:
        return min_ts_string([calculated, table_window_end]) or calculated
    return calculated
