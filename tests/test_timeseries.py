"""Time-series surface (operators/timeseries.py): hand-vector and
property gates for bucketing, gap-fill, LOCF, exact-integer linear
interpolation and the rollup ladder — plus the shuffle-count contract
(resample map-side combines; LOCF and interpolation share ONE sort per
key)."""

from pyspark.sql import functions as F

from edna_dbt_library_spark.operators.timeseries import (
    DAY_US,
    HOUR_US,
    finite_difference,
    gap_fill,
    interpolate_linear,
    locf,
    resample_sum,
    rollup_buckets,
    sliding_agg,
    time_bucket,
)


def _series(spark, rows):
    """rows: (user_id, bucket, v, n) — a pre-resampled sparse series."""
    return spark.createDataFrame(
        rows, "user_id long, bucket long, v long, n long"
    )


def test_time_bucket_exact_floor(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:59:59.999999",), ("2024-01-01 01:00:00.000000",)],
        "s string",
    ).select(F.col("s").cast("timestamp").alias("ts"))
    got = [r["bucket"] for r in time_bucket(df, "ts", HOUR_US).collect()]
    # 2024-01-01T00 is hour 473352 since the epoch
    assert got == [473352, 473353]


def test_resample_sum_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00", 150),
            (1, "2024-01-01 00:50:00", 250),
            (1, "2024-01-01 02:00:00", 100),
            (2, "2024-01-01 00:00:00", 7),
        ],
        "user_id long, s string, cents long",
    ).select("user_id", F.col("s").cast("timestamp").alias("ts"), "cents")
    got = {
        (r["user_id"], r["bucket"]): (r["v"], r["n"])
        for r in resample_sum(df, ["user_id"], "ts", "cents").collect()
    }
    assert got == {
        (1, 473352): (400, 2),
        (1, 473354): (100, 1),
        (2, 473352): (7, 1),
    }


def test_gap_fill_dense_grid_per_key(spark):
    sparse = _series(spark, [(1, 10, 100, 1), (1, 13, 400, 2), (2, 5, 7, 1)])
    dense = gap_fill(sparse, ["user_id"]).collect()
    by_user = {}
    for r in dense:
        by_user.setdefault(r["user_id"], []).append(r)
    assert sorted(r["bucket"] for r in by_user[1]) == [10, 11, 12, 13]
    assert sorted(r["bucket"] for r in by_user[2]) == [5]
    gaps = {r["bucket"]: r for r in by_user[1]}
    assert gaps[11]["v"] is None and not gaps[11]["observed"]
    assert gaps[10]["v"] == 100 and gaps[10]["observed"]


def test_locf_carries_forward(spark):
    sparse = _series(spark, [(1, 10, 100, 1), (1, 13, 400, 2)])
    filled = locf(gap_fill(sparse, ["user_id"]), ["user_id"], "v")
    got = {r["bucket"]: r["v"] for r in filled.collect()}
    assert got == {10: 100, 11: 100, 12: 100, 13: 400}


def test_interpolate_linear_exact_half_up(spark):
    # anchors (10, 100) and (13, 400): exact interpolation 200, 300
    sparse = _series(spark, [(1, 10, 100, 1), (1, 13, 400, 2)])
    filled = interpolate_linear(gap_fill(sparse, ["user_id"]), ["user_id"], "v")
    got = {r["bucket"]: r["v"] for r in filled.collect()}
    assert got == {10: 100, 11: 200, 12: 300, 13: 400}
    # non-integral interpolant rounds HALF-UP: anchors (0, 0) and (3, 1)
    # -> true values 1/3, 2/3 -> 0, 1; anchors (0,0),(2,1) -> 1/2 -> 1
    s2 = _series(spark, [(1, 0, 0, 1), (1, 3, 1, 1), (2, 0, 0, 1), (2, 2, 1, 1)])
    f2 = interpolate_linear(gap_fill(s2, ["user_id"]), ["user_id"], "v")
    got2 = {(r["user_id"], r["bucket"]): r["v"] for r in f2.collect()}
    assert got2[(1, 1)] == 0 and got2[(1, 2)] == 1
    assert got2[(2, 1)] == 1  # exact .5 rounds up


def test_interpolate_passes_observed_verbatim(spark):
    sparse = _series(spark, [(1, 0, 5, 1), (1, 1, 999, 1), (1, 4, 11, 1)])
    filled = interpolate_linear(gap_fill(sparse, ["user_id"]), ["user_id"], "v")
    got = {r["bucket"]: r["v"] for r in filled.collect()}
    assert got[1] == 999  # observed outlier untouched by the anchors


def test_interpolation_recovers_linear_series(spark):
    # property: sampling a perfectly linear integer series at a few
    # buckets and interpolating recovers EVERY dropped point exactly
    full = [(1, h, 17 * h + 3, 1) for h in range(0, 25)]
    kept = [row for row in full if row[1] in (0, 6, 12, 24)]
    filled = interpolate_linear(
        gap_fill(_series(spark, kept), ["user_id"]), ["user_id"], "v"
    )
    got = {r["bucket"]: r["v"] for r in filled.collect()}
    assert got == {h: 17 * h + 3 for h in range(0, 25)}


def test_interpolate_signed_values_half_away(spark):
    # negative anchors (ADVICE r10 #4): Spark's div truncates toward
    # zero while DuckDB's // floors, so a negative numerator must go
    # through the sign-split — anchors (0,-1),(3,-2): true -4/3, -5/3
    # -> half-away -1, -2; anchors (0,0),(2,-1): exact -1/2 -> -1
    s = _series(
        spark, [(1, 0, -1, 1), (1, 3, -2, 1), (2, 0, 0, 1), (2, 2, -1, 1)]
    )
    f = interpolate_linear(gap_fill(s, ["user_id"]), ["user_id"], "v")
    got = {(r["user_id"], r["bucket"]): r["v"] for r in f.collect()}
    assert got[(1, 1)] == -1 and got[(1, 2)] == -2
    assert got[(2, 1)] == -1  # exact -.5 rounds away from zero


def test_rollup_ladder_associative(spark):
    # hour -> day rollup from partials == direct day aggregation
    rows = [(1, h, (h * 31) % 97, 1) for h in range(0, 72)] + [
        (2, h, h, 2) for h in range(20, 30)
    ]
    hourly = _series(spark, rows)
    day = rollup_buckets(hourly, ["user_id"], 24)
    got = {(r["user_id"], r["bucket"]): (r["v"], r["n"]) for r in day.collect()}
    expect = {}
    for u, h, v, n in rows:
        k = (u, h // 24)
        pv, pn = expect.get(k, (0, 0))
        expect[k] = (pv + v, pn + n)
    assert got == expect


def test_sliding_agg_range_frame_skips_gaps(spark):
    # sparse buckets 0, 2, 30: a 24-bucket trailing window at 2 sees
    # {0, 2}; at 30 only {30} (0 and 2 fell out of range) — no densify
    sparse = _series(spark, [(1, 0, 10, 1), (1, 2, 20, 2), (1, 30, 5, 1)])
    got = {
        r["bucket"]: (r["window_v"], r["window_n"], r["mean_milli"])
        for r in sliding_agg(sparse, ["user_id"], 24).collect()
    }
    # mean_milli = HALF-UP(1000 * S / N)
    assert got[0] == (10, 1, 10000)
    assert got[2] == (30, 3, 10000)
    assert got[30] == (5, 1, 5000)


def test_finite_difference_rates_signed_half_up(spark):
    sparse = _series(spark, [(1, 0, 100, 1), (1, 4, 106, 1), (1, 7, 100, 1)])
    got = {
        r["bucket"]: (r["delta_v"], r["delta_b"], r["rate_milli"])
        for r in finite_difference(sparse, ["user_id"]).collect()
    }
    assert got[0] == (None, None, None)
    # +6 over 4 buckets -> 1500 milli/bucket exactly
    assert got[4] == (6, 4, 1500)
    # -6 over 3 buckets -> -2000 exactly; and .5 rounds away from zero:
    assert got[7] == (-6, 3, -2000)
    s2 = _series(spark, [(2, 0, 0, 1), (2, 2, 1, 1), (3, 0, 0, 1), (3, 2, -1, 1)])
    got2 = {
        (r["user_id"], r["bucket"]): r["rate_milli"]
        for r in finite_difference(s2, ["user_id"]).collect()
    }
    assert got2[(2, 2)] == 500
    assert got2[(3, 2)] == -500


def test_fill_plan_single_window_pass(spark):
    """All four interpolation anchor lookups (prev/next value and
    bucket) must FUSE into one Window node over one sort — a second
    window pass per anchor would double the series' sort cost at
    scale. (The gap-fill join's own exchanges are separate and may be
    broadcast-demoted by AQE at real sizes.)"""
    sparse = _series(spark, [(1, 10, 100, 1), (1, 13, 400, 2)])
    plan = interpolate_linear(
        gap_fill(sparse, ["user_id"]), ["user_id"], "v"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("+- Window ") == 1
    window_part = plan.split("+- Window ")[1]
    for alias in ("_pv", "_ph", "_nv", "_nh"):
        assert alias in window_part.split("+- Sort")[0]
