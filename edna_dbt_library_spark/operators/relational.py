"""Relational idioms from the reference's generated SQL (§2E of SURVEY.md),
packaged as DataFrame combinators.

Each helper is a thin, declarative composition — Catalyst sees through all
of them (predicate pushdown, partial aggregation, window exec), so there is
nothing imperative to schedule.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top1_per_key(df: DataFrame, keys: Sequence[str], order_by: Sequence[Column]) -> DataFrame:
    """Top-1-per-group via ROW_NUMBER() = 1 — the reference's watermark
    recovery idiom ``QUALIFY ROW_NUMBER() OVER (ORDER BY .. DESC) = 1``
    (reference: macros/utils/log_helpers.sql:100-106).

    ``order_by`` must be a *total* order within each key group for
    deterministic results (add a unique tiebreaker column).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def latest_by_key(
    df: DataFrame,
    keys: Sequence[str],
    event_time: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Keep the most recent row per unique key — the state an
    ``incremental_partition_merge`` target converges to under the
    ``S.event_time > T.event_time`` recency rule
    (reference: macros/materialization/incremental_partition_merge.sql:116-119).
    """
    order = [F.col(event_time).desc()] + [F.col(t).desc() for t in tiebreakers]
    return top1_per_key(df, keys, order)


def ordered_string_agg(
    df: DataFrame,
    group_keys: Sequence[str],
    value: str,
    sep: str = ",",
    descending: bool = False,
    alias: str = "agg",
) -> DataFrame:
    """Deterministic ordered string aggregation — BigQuery's
    ``STRING_AGG(x, sep ORDER BY x)`` (reference:
    macros/utils/binary_conversions.sql:69). ``collect_list`` order is
    nondeterministic under parallelism, so the sort happens *after*
    collection via array_sort — stable at any partition count.
    """
    arr = F.array_sort(F.collect_list(F.col(value)))
    if descending:
        arr = F.reverse(arr)
    return df.groupBy(*group_keys).agg(F.concat_ws(sep, arr).alias(alias))


def window_filter(df: DataFrame, ts_col: str, lower_exclusive: str | None, upper_inclusive: str) -> DataFrame:
    """Half-open run-window filter ``(prev_end, current_end]`` — the
    incremental-scan predicate (reference:
    macros/materialization/incremental_log.sql:53-60). Expressed as a plain
    filter so Catalyst pushes it into the parquet scan (min/max row-group
    skipping + partition pruning at scale).

    When the loader retained a raw epoch-nanos column (``_{ts_col}_ns``,
    see sources.tables.load_table) a *superset* range on that raw long is
    ANDed in: the raw predicate is scan-pushable (row-group skipping on a
    100 TB table), while the exact predicate on the converted timestamp
    keeps the boundary semantics bit-exact.
    """
    import datetime as _dt

    c = F.col(ts_col).try_cast("timestamp")
    cond = c <= F.lit(upper_inclusive).cast("timestamp")
    if lower_exclusive is not None:
        cond = cond & (c > F.lit(lower_exclusive).cast("timestamp"))

    raw = f"_{ts_col}_ns"
    if raw in df.columns:
        def _epoch_us(s: str) -> int:
            dt = _dt.datetime.fromisoformat(s.replace(" UTC", ""))
            return int(dt.replace(tzinfo=_dt.timezone.utc).timestamp() * 1_000_000)

        # converted_us = floor(ns/1000), so converted <= hi  <=>  ns <= hi_us*1000 + 999
        # and converted > lo  <=>  ns >= (lo_us+1)*1000  =>  ns > lo_us*1000 + 999
        cond = cond & (F.col(raw) <= F.lit(_epoch_us(upper_inclusive) * 1000 + 999))
        if lower_exclusive is not None:
            cond = cond & (F.col(raw) > F.lit(_epoch_us(lower_exclusive) * 1000 + 999))
    return df.where(cond)


def distinct_partition_dates(df: DataFrame, partition_field: str) -> DataFrame:
    """SELECT DISTINCT DATE(pf) — touched-partition discovery
    (reference: macros/utils/partition_helpers.sql:18-21)."""
    return df.select(F.to_date(F.col(partition_field)).alias("part_date")).distinct()


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_minutes: int = 30,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to the
    previous event exceeds ``gap_minutes``. Two stacked windows over the
    same (user, ts) ordering — one shuffle, both windows share the sort.
    Pass ``tiebreakers`` (e.g. the event id) for a total order when
    timestamps can collide."""
    w = Window.partitionBy(user_col).orderBy(ts_col, *tiebreakers)
    gap = F.col(ts_col).cast("double") - F.lag(F.col(ts_col).cast("double")).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0)
    return df.withColumn("__new_session", is_new).withColumn(
        "session_seq", F.sum("__new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).drop("__new_session")
