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
            # Integer arithmetic, NOT float timestamp()*1e6: the float ulp
            # at ~2026 epoch seconds is ~0.45 us, so multiply-then-truncate
            # can land one microsecond low and silently exclude a row at
            # the inclusive window end (which the next run's exclusive
            # lower bound then skips forever).
            dt = _dt.datetime.fromisoformat(s.replace(" UTC", ""))
            dt = dt.replace(tzinfo=_dt.timezone.utc)
            epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
            return (dt - epoch) // _dt.timedelta(microseconds=1)

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


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    *,
    direction: str = "backward",
    tolerance_seconds: int | None = None,
    right_tiebreakers: Sequence[str] = (),
    matched_ts: str | None = None,
) -> DataFrame:
    """As-of (temporal) join: for every left row attach the payload of the
    right row with the greatest ``right_ts`` <= ``left_ts`` within the same
    ``keys`` group (``direction='backward'``, inclusive; ``'forward'``
    mirrors to the smallest ``right_ts`` >= ``left_ts``). Left rows with no
    match keep NULL payload (left-outer semantics).

    Spark has no ASOF JOIN; the naive encoding (inequality join + top-1)
    materialises an O(left x right) intermediate per key. This instead uses
    the union + ordered-window formulation: tag both sides, union them, and
    take ``last(payload, ignorenulls)`` over a single (keys)-partitioned
    sort — ONE shuffle, no join blow-up, linear in |left| + |right|, and
    AQE-splittable per key group. The payload travels as one struct so all
    matched columns come from the SAME right row even when payload columns
    contain NULLs.

    Determinism: right rows sort before left rows at equal timestamps (so
    an equal-timestamp right row matches, per standard as-of semantics),
    and ties between right rows at the same timestamp are broken by
    ``right_tiebreakers`` (last wins — i.e. the greatest tiebreaker value).
    Pass a unique right-side column there for reproducible output.

    ``tolerance_seconds`` nulls out matches farther than the tolerance from
    ``left_ts`` — equivalent to restricting the match window, since the
    as-of match is the nearest right row by construction.

    ``payload`` column names must not collide with left columns (alias
    first). If ``matched_ts`` is given, the matched right timestamp is
    emitted under that name.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    keys = list(keys)
    payload = list(payload)
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"payload columns collide with left columns: {sorted(clash)}")

    packed = F.struct(F.col(right_ts).alias("__mts"), *[F.col(c) for c in payload])
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ord_ts"),
        F.lit(0).alias("__side"),
        *[F.col(t).alias(f"__tb{i}") for i, t in enumerate(right_tiebreakers)],
        packed.alias("__r"),
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__ord_ts"),
        F.lit(1).alias("__side"),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    ts_ord = F.col("__ord_ts").asc() if direction == "backward" else F.col("__ord_ts").desc()
    order = [ts_ord, F.col("__side").asc()] + [
        F.col(f"__tb{i}").asc() for i in range(len(right_tiebreakers))
    ]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = F.last("__r", ignorenulls=True).over(w)
    out = u.withColumn("__m", m).where(F.col("__side") == 1)

    if tolerance_seconds is not None:
        lts, mts = F.col(left_ts).cast("double"), F.col("__m.__mts").cast("double")
        dist = (lts - mts) if direction == "backward" else (mts - lts)
        out = out.withColumn(
            "__m", F.when(dist <= F.lit(float(tolerance_seconds)), F.col("__m"))
        )

    cols = [F.col(c) for c in left.columns]
    if matched_ts is not None:
        cols.append(F.col("__m.__mts").alias(matched_ts))
    cols += [F.col(f"__m.{c}").alias(c) for c in payload]
    return out.select(*cols)


def range_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    keys: Sequence[str] = (),
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Range (interval-overlap) join: every (point, interval) pair with
    ``start_ts <= point_ts < end_ts`` and equal ``keys`` — the attribution
    / validity-window join Spark would otherwise plan as a nested-loop or
    per-key explosion.

    Bucketed equi-join formulation: each interval is exploded to the
    fixed-width time buckets it covers (``sequence`` + ``explode``), each
    point is assigned its single containing bucket, and the join runs as a
    plain HASH join on (keys..., bucket) with the exact range predicate as
    a post-filter. Because a point lives in exactly ONE bucket, a pair can
    match in at most one bucket — no duplicate elimination needed. Work
    scales as |points| + |intervals| * ceil(span / bucket) instead of
    |points| x |intervals| per key; pick ``bucket_seconds`` near the
    typical interval span to keep the explosion factor small at 100 TB.

    Column sets of the two inputs must be disjoint apart from ``keys``
    (alias first). Inner-join semantics: unmatched points are dropped.
    """
    keys = list(keys)
    bucket_us = int(bucket_seconds) * 1_000_000

    def _bucket_of_us(us: Column) -> Column:
        # exact floor-div in long arithmetic: us - pmod(us, b) is a multiple
        # of b, so the double division below is exact (no rounding at the
        # bucket boundary, which F.floor(us / b) cannot guarantee)
        return ((us - F.pmod(us, F.lit(bucket_us))) / F.lit(bucket_us)).cast("long")

    def _bucket(c: Column) -> Column:
        return _bucket_of_us(F.unix_micros(c))

    # exclusive end: the last covered bucket is the one containing end - 1 us
    end_bucket = _bucket_of_us(F.unix_micros(F.col(end_ts)) - 1)
    # The interval side's join columns are RENAMED (not referenced through
    # df[col]): when both inputs derive from the same DataFrame (a
    # self-join, e.g. click->purchase attribution over one events scan),
    # pt[k] == iv[k] is a same-origin attribute pair that Spark only
    # resolves through its dataset-id disambiguation heuristic (and warns
    # "trivially true equals predicate"). Disjoint names need no heuristic.
    iv = intervals.withColumn(
        "__rbucket", F.explode(F.sequence(_bucket(F.col(start_ts)), end_bucket))
    ).select(
        *[F.col(k).alias(f"__rk{i}") for i, k in enumerate(keys)],
        "__rbucket",
        *[F.col(c) for c in intervals.columns if c not in keys],
    )
    pt = points.withColumn("__bucket", _bucket(F.col(point_ts)))
    cond = [F.col(f"__rk{i}") == F.col(k) for i, k in enumerate(keys)] + [
        F.col("__bucket") == F.col("__rbucket")
    ]
    joined = pt.join(iv, cond, "inner").where(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
    )
    out_cols = [F.col(c) for c in points.columns] + [
        F.col(c) for c in intervals.columns if c not in keys
    ]
    return joined.select(*out_cols)


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


def scd2_intervals(
    df: DataFrame,
    keys: Sequence[str],
    event_time: str,
    tiebreakers: Sequence[str] = (),
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> DataFrame:
    """Slowly-changing-dimension (type 2) history from a change stream:
    each row becomes a version valid over ``[event_time, next event_time)``
    for its key; the last version per key is open (``valid_to`` NULL,
    ``is_current`` true).

    The reference tracks only latest-state upserts (its recency-guarded
    MERGE, macros/materialization/incremental_partition_merge.sql:116-119);
    SCD2 is the history-preserving counterpart every warehouse needs
    (dbt's own `snapshot` materialization computes exactly this). One
    window (``lead`` over the per-key event order) — a single shuffle on
    the key, no self-join; ``order`` must be total per key, so pass
    ``tiebreakers`` when event times can tie.
    """
    order = [F.col(event_time).asc()] + [F.col(t).asc() for t in tiebreakers]
    w = Window.partitionBy(*keys).orderBy(*order)
    nxt = F.lead(event_time).over(w)
    return df.select(
        "*",
        F.col(event_time).alias(valid_from),
        nxt.alias(valid_to),
        nxt.isNull().alias(current_flag),
    )


def topk_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-k-per-group via ROW_NUMBER() <= k — the generalization of
    ``top1_per_key`` (reference watermark idiom, log_helpers.sql:100-106)
    used for per-group leaderboards and candidate pruning.

    One shuffle on the keys; Spark's WindowGroupLimit pushes the k-limit
    into the sort so no group ever materializes more than k rows on the
    reduce side. ``order_by`` must be a total order per group (unique
    tiebreaker) for deterministic membership and ranks.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )
