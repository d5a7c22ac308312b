"""Time-series surface: time-bucket resampling, dense gap-fill, LOCF,
exact-integer linear interpolation and multi-grain rollup.

Extension beyond the reference surface: the reference's event models
aggregate only by DAY partition inside the incremental window
(/root/reference/macros/materialization/incremental_log.sql:1-40 —
the per-run GROUP BY over the loaded window); this module gives the
engine the hypertable / continuous-aggregate shape (TimescaleDB
``time_bucket`` + ``time_bucket_gapfill`` semantics, Flink's windowed
fill) as plain DataFrame algebra, so a user of the reference gets the
regularized series its downstream dashboards compute by hand.

Design rules (the repo-wide exactness contract):

* Bucket indexes are EXACT integer epochs: ``unix_micros(ts) div
  bucket_us`` — never a float division (a double quotient can land one
  above the true floor on large operands; see pagerank_int). Epochs in
  the fixtures are positive, so ``div`` == floor on both engines.
* Values travel as exact integer units (cents/milli-units); the
  linear interpolation rounds HALF-UP in pure integer arithmetic with
  the ``(2S + N) div (2N)`` idiom (non-negative S), so every filled
  value is bit-identical on any partitioning and replays in DuckDB.

Scale shape: the dense grid is ``sequence(min_bucket, max_bucket)``
per key — its size is bounded by the series' time RANGE over the
bucket width, never by the event count; the fill join shuffles
(key, bucket) rows once, and both LOCF and interpolation are one
window pass per key ordered by bucket (a single shuffle shared by
Spark's WindowExec). Nothing here touches the raw event rows after
the initial resample aggregation, which map-side combines.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

HOUR_US = 3_600_000_000
DAY_US = 24 * HOUR_US

__all__ = [
    "HOUR_US",
    "DAY_US",
    "time_bucket",
    "resample_sum",
    "gap_fill",
    "locf",
    "interpolate_linear",
    "rollup_buckets",
    "sliding_agg",
    "finite_difference",
]


def time_bucket(df: DataFrame, ts_col: str, bucket_us: int = HOUR_US, out: str = "bucket") -> DataFrame:
    """Add an exact integer bucket index: floor(epoch_us / bucket_us).

    Projects the micros first, then applies integral ``div`` — the
    quotient never goes through a double (DuckDB replay:
    ``epoch_us(ts) // bucket_us``)."""
    return df.withColumn("_us", F.unix_micros(F.col(ts_col))).withColumn(
        out, F.expr(f"_us div {int(bucket_us)}")
    ).drop("_us")


def resample_sum(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    units_col: Column | str,
    bucket_us: int = HOUR_US,
    out: str = "v",
) -> DataFrame:
    """Regularize a raw event stream to one row per (keys, bucket):
    exact-integer sum of ``units_col`` (cents / milli-units — the
    caller quantizes) plus the observation count ``n``. The groupBy
    map-side combines, so the shuffle carries one row per occupied
    bucket, not per event."""
    units = F.col(units_col) if isinstance(units_col, str) else units_col
    return (
        time_bucket(df, ts_col, bucket_us)
        .groupBy(*keys, "bucket")
        .agg(
            F.sum(units).cast("long").alias(out),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )


def gap_fill(df: DataFrame, keys: Sequence[str], bucket_col: str = "bucket") -> DataFrame:
    """Densify a resampled series: one row for EVERY bucket between each
    key's first and last observed bucket (TimescaleDB
    ``time_bucket_gapfill``). Missing buckets carry NULL measures and
    ``observed = false``; the measure columns are then filled by
    :func:`locf` or :func:`interpolate_linear`.

    The grid is built per key from its own [min, max] bucket —
    ``sequence`` + ``posexplode``-free explode, sized by the time range
    (a year of hours is 8.8k rows per key) regardless of event volume.
    The left join back to the actuals is an equi-join on (keys, bucket)
    and AQE broadcasts whichever side is small."""
    keys = list(keys)
    grid = (
        df.groupBy(*keys)
        .agg(F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi"))
        .select(*keys, F.explode(F.sequence("_lo", "_hi")).alias(bucket_col))
    )
    return (
        grid.join(
            df.withColumn("_obs", F.lit(1)), keys + [bucket_col], "left"
        )
        .withColumn("observed", F.col("_obs").isNotNull())
        .drop("_obs")
    )


def _series_window(keys: Sequence[str], bucket_col: str) -> Window:
    return Window.partitionBy(*keys).orderBy(bucket_col)


def locf(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    bucket_col: str = "bucket",
    out: str | None = None,
) -> DataFrame:
    """Last-observation-carried-forward over the dense grid: each NULL
    measure takes the latest non-NULL value at or before its bucket
    (one window pass per key; DuckDB replay: ``last_value(x IGNORE
    NULLS)`` over the same frame)."""
    w = (
        _series_window(keys, bucket_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out or value_col, F.last(value_col, ignorenulls=True).over(w))


def interpolate_linear(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    bucket_col: str = "bucket",
    out: str | None = None,
) -> DataFrame:
    """Linear interpolation of NULL measures between their nearest
    observed anchors, in EXACT integer arithmetic: for a gap bucket h
    between anchors (h0, v0) and (h1, v1),

        S = v0·(h1 − h) + v1·(h − h0),  N = h1 − h0,
        filled = sign(S) · ((2·|S| + N) div (2·N))   # HALF-UP

    — the floor((2S+N)/(2N)) idiom (operators/retrieval.py
    lm_cross_entropy) with the SIGN-SPLIT from sliding_agg (Spark's
    ``div`` truncates toward zero while DuckDB's ``//`` floors, so a
    negative numerator must go through ``abs`` and re-negate — the
    pagerank_int rule), so the filled value is the half-away-from-zero
    rounding of the true rational interpolant for signed integer
    values too, with no float in the path and the DuckDB oracle
    replaying it digit for digit. Values must be integers (quantized
    units — signed measures are fine); observed rows pass through
    verbatim, NULLs outside any anchor pair (before the first / after
    the last observation) stay NULL — gap_fill grids start and end on
    observations, so none arise there. Two anchor lookups share one
    window ordering (a single sort per key)."""
    o = out or value_col
    back = (
        _series_window(keys, bucket_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    fwd = _series_window(keys, bucket_col).rowsBetween(1, Window.unboundedFollowing)
    v = F.col(value_col)
    anchored = (
        df.withColumn("_ab", F.when(v.isNotNull(), F.col(bucket_col)))
        .withColumn("_pv", F.last(value_col, ignorenulls=True).over(back))
        .withColumn("_ph", F.last("_ab", ignorenulls=True).over(back))
        .withColumn("_nv", F.first(value_col, ignorenulls=True).over(fwd))
        .withColumn("_nh", F.first("_ab", ignorenulls=True).over(fwd))
    )
    h = F.col(bucket_col)
    filled = anchored.withColumn(
        "_s", F.col("_pv") * (F.col("_nh") - h) + F.col("_nv") * (h - F.col("_ph"))
    ).withColumn("_n", F.col("_nh") - F.col("_ph"))
    mag = F.expr("(2 * abs(_s) + _n) div (2 * _n)")
    return (
        filled.withColumn(
            o,
            F.when(v.isNotNull(), v).otherwise(
                F.when(F.col("_s") >= 0, mag).otherwise(-mag).cast("long")
            ),
        )
        .drop("_ab", "_pv", "_ph", "_nv", "_nh", "_s", "_n")
    )


def sliding_agg(
    df: DataFrame,
    keys: Sequence[str],
    window_buckets: int,
    bucket_col: str = "bucket",
    value_col: str = "v",
    count_col: str = "n",
) -> DataFrame:
    """Trailing sliding-window aggregate over a SPARSE resampled series:
    for each observed bucket h, the sum/count/exact mean of the last
    ``window_buckets`` buckets (h − W + 1 .. h], counting absent buckets
    as zero observations.

    The frame is a RANGE frame over the integer bucket index — Spark's
    WindowExec walks the value range directly, so gaps cost nothing and
    the series is never densified (the gap_fill grid would multiply the
    row count by the duty cycle's inverse just to aggregate zeros; a
    24h window over a 1%-occupied sensor series stays 1%-sized here).
    One window pass per key — shares the sort shape of locf/interp.

    ``mean_milli`` is the window mean in EXACT milli-units: HALF-UP of
    1000·S/N with the sign-split (2|S|·1000 + N) div (2N) idiom (S may
    be negative for signed measures), so it replays in DuckDB digit for
    digit — never a double division."""
    w = (
        _series_window(keys, bucket_col)
        .rangeBetween(-(int(window_buckets) - 1), 0)
    )
    out = df.withColumn("_ws", F.sum(value_col).over(w).cast("long")).withColumn(
        "_wn", F.sum(count_col).over(w).cast("long")
    )
    mag = F.expr("(2 * abs(_ws) * 1000 + _wn) div (2 * _wn)")
    return (
        out.withColumn(
            "mean_milli",
            F.when(F.col("_ws") >= 0, mag).otherwise(-mag).cast("long"),
        )
        .withColumnRenamed("_ws", "window_v")
        .withColumnRenamed("_wn", "window_n")
    )


def finite_difference(
    df: DataFrame,
    keys: Sequence[str],
    bucket_col: str = "bucket",
    value_col: str = "v",
) -> DataFrame:
    """First difference and exact rate-of-change between CONSECUTIVE
    OBSERVED buckets of a sparse series: ``delta_v`` = v − lag(v),
    ``delta_b`` = bucket − lag(bucket) (the gap length rides along —
    downstream can discount stale anchors), and ``rate_milli`` =
    HALF-UP(1000·delta_v / delta_b) in exact signed-integer arithmetic
    (the same sign-split div idiom as sliding_agg). First row per key
    carries NULLs. One lag window pass — no densify, no self-join."""
    w = _series_window(keys, bucket_col)
    out = (
        df.withColumn("_pv", F.lag(value_col).over(w))
        .withColumn("_pb", F.lag(bucket_col).over(w))
        .withColumn("delta_v", F.col(value_col) - F.col("_pv"))
        .withColumn("delta_b", F.col(bucket_col) - F.col("_pb"))
    )
    mag = F.expr("(2 * abs(delta_v) * 1000 + delta_b) div (2 * delta_b)")
    return out.withColumn(
        "rate_milli",
        F.when(F.col("delta_v") >= 0, mag).otherwise(-mag).cast("long"),
    ).drop("_pv", "_pb")


def rollup_buckets(
    df: DataFrame,
    keys: Sequence[str],
    factor: int,
    bucket_col: str = "bucket",
    sum_cols: Sequence[str] = ("v", "n"),
) -> DataFrame:
    """Re-aggregate a fine-grain series to a coarser grain (hour → day
    is ``factor=24``): the continuous-aggregate ladder — coarse grains
    derive from the fine partials, never from the raw events, so the
    daily rollup of a year costs 8.8k rows per key. Exact because the
    measures are integer sums (associative regrouping is the test)."""
    coarse = F.expr(f"{bucket_col} div {int(factor)}")
    return (
        df.withColumn("_cb", coarse)
        .groupBy(*keys, "_cb")
        .agg(*[F.sum(c).cast("long").alias(c) for c in sum_cols])
        .withColumnRenamed("_cb", bucket_col)
    )
