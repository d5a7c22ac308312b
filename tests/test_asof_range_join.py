"""As-of (temporal) join and bucketed range (interval) join.

Both are custom operators Spark lacks natively; the implementations are
shuffle-minimal re-expressions (union+window / bucketed equi-join), so
these tests pin down the exact match semantics: boundary inclusivity,
tie-breaking, tolerance, direction, and the no-duplicate guarantee of
the bucketing scheme.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from edna_dbt_library_spark.operators.relational import asof_join, range_interval_join

UTC = dt.timezone.utc


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _trades(spark):
    rows = [
        (1, "A", _ts("2024-01-01 10:00:00")),
        (2, "A", _ts("2024-01-01 10:05:00")),
        (3, "A", _ts("2024-01-01 09:00:00")),  # before any quote
        (4, "B", _ts("2024-01-01 10:00:00")),  # key with no quotes
    ]
    return spark.createDataFrame(rows, "trade_id bigint, sym string, ts timestamp")


def _quotes(spark):
    rows = [
        (10, "A", _ts("2024-01-01 09:59:00"), 100.0),
        (11, "A", _ts("2024-01-01 10:00:00"), 101.0),  # equal-ts: must win at 10:00
        (12, "A", _ts("2024-01-01 10:04:00"), 102.0),
    ]
    return spark.createDataFrame(rows, "quote_id bigint, sym string, qts timestamp, px double")


def test_asof_backward_basic_and_boundaries(spark):
    got = {
        r["trade_id"]: (r["quote_id"], r["px"])
        for r in asof_join(
            _trades(spark), _quotes(spark), ["sym"], "ts", "qts",
            ["quote_id", "px"], right_tiebreakers=["quote_id"],
        ).collect()
    }
    assert got[1] == (11, 101.0)  # equal timestamp is inclusive
    assert got[2] == (12, 102.0)  # latest at-or-before 10:05
    assert got[3] == (None, None)  # nothing at-or-before -> null payload
    assert got[4] == (None, None)  # key with no right rows


def test_asof_forward_direction(spark):
    got = {
        r["trade_id"]: r["quote_id"]
        for r in asof_join(
            _trades(spark), _quotes(spark), ["sym"], "ts", "qts",
            ["quote_id"], direction="forward", right_tiebreakers=["quote_id"],
        ).collect()
    }
    assert got[3] == 10  # earliest at-or-after 09:00
    assert got[1] == 11  # equal timestamp still inclusive going forward
    assert got[2] is None  # no quote at/after 10:05


def test_asof_tolerance_nulls_stale_matches(spark):
    got = {
        r["trade_id"]: r["quote_id"]
        for r in asof_join(
            _trades(spark), _quotes(spark), ["sym"], "ts", "qts",
            ["quote_id"], tolerance_seconds=30, right_tiebreakers=["quote_id"],
        ).collect()
    }
    assert got[1] == 11  # 0s away: kept
    assert got[2] is None  # nearest is 60s away > 30s tolerance


def test_asof_tie_on_right_ts_takes_max_tiebreaker(spark):
    quotes = spark.createDataFrame(
        [(20, "A", _ts("2024-01-01 09:59:00")), (21, "A", _ts("2024-01-01 09:59:00"))],
        "quote_id bigint, sym string, qts timestamp",
    )
    trades = spark.createDataFrame(
        [(1, "A", _ts("2024-01-01 10:00:00"))], "trade_id bigint, sym string, ts timestamp"
    )
    [r] = asof_join(
        trades, quotes, ["sym"], "ts", "qts", ["quote_id"], right_tiebreakers=["quote_id"]
    ).collect()
    assert r["quote_id"] == 21


def test_asof_matched_ts_and_collision_guard(spark):
    [r] = asof_join(
        _trades(spark).where("trade_id = 2"), _quotes(spark), ["sym"], "ts", "qts",
        ["px"], right_tiebreakers=["quote_id"], matched_ts="quote_ts",
    ).collect()
    assert r["quote_ts"] == _ts("2024-01-01 10:04:00")
    with pytest.raises(ValueError, match="collide"):
        asof_join(_trades(spark), _quotes(spark), ["sym"], "ts", "qts", ["ts"])


def test_asof_plan_has_no_join(spark):
    plan = asof_join(
        _trades(spark), _quotes(spark), ["sym"], "ts", "qts", ["px"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # single-shuffle window formulation, no join blow-up


def _points(spark):
    rows = [
        (1, "u1", _ts("2024-01-01 10:00:00")),  # == start: included
        (2, "u1", _ts("2024-01-01 11:59:59")),  # inside, last bucket
        (3, "u1", _ts("2024-01-01 12:00:00")),  # == end: excluded
        (4, "u2", _ts("2024-01-01 10:30:00")),  # right time, wrong key
        (5, "u1", _ts("2024-01-03 10:30:00")),  # far outside
    ]
    return spark.createDataFrame(rows, "pid bigint, user string, pts timestamp")


def _intervals(spark):
    rows = [(100, "u1", _ts("2024-01-01 10:00:00"), _ts("2024-01-01 12:00:00"))]
    return spark.createDataFrame(rows, "iid bigint, user string, s timestamp, e timestamp")


def test_range_join_boundaries_and_keys(spark):
    got = sorted(
        (r["pid"], r["iid"])
        for r in range_interval_join(
            _points(spark), _intervals(spark), "pts", "s", "e", keys=["user"],
            bucket_seconds=1800,
        ).collect()
    )
    assert got == [(1, 100), (2, 100)]


def test_range_join_no_duplicates_across_buckets(spark):
    # interval spans many buckets; each matching point must appear exactly once
    res = range_interval_join(
        _points(spark), _intervals(spark), "pts", "s", "e", keys=["user"],
        bucket_seconds=60,  # 120 buckets covered
    ).collect()
    assert sorted((r["pid"], r["iid"]) for r in res) == [(1, 100), (2, 100)]


def test_range_join_unkeyed_and_exact_end_bucket(spark):
    # end lands exactly on a bucket edge: the edge bucket must NOT be covered
    points = _points(spark).drop("user")
    intervals = _intervals(spark).drop("user")
    res = range_interval_join(points, intervals, "pts", "s", "e", bucket_seconds=3600)
    got = sorted((r["pid"], r["iid"]) for r in res.collect())
    assert got == [(1, 100), (2, 100), (4, 100)]  # no key: u2's point now matches


def test_range_join_plan_is_hash_join(spark):
    plan = range_interval_join(
        _points(spark), _intervals(spark), "pts", "s", "e", keys=["user"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_scd2_intervals_partition_timeline(spark):
    from edna_dbt_library_spark.operators.relational import scd2_intervals

    rows = [
        ("u1", 1, "2024-01-01 00:00:00"),
        ("u1", 2, "2024-01-03 00:00:00"),
        ("u1", 3, "2024-01-07 00:00:00"),
        ("u2", 4, "2024-02-01 00:00:00"),
    ]
    df = spark.createDataFrame(rows, "k string, id long, ts string").select(
        "k", "id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = scd2_intervals(df, ["k"], "ts", tiebreakers=["id"]).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    for k, versions in by_key.items():
        versions.sort(key=lambda r: r["valid_from"])
        # consecutive versions chain exactly; only the last is open
        for a, b in zip(versions, versions[1:]):
            assert a["valid_to"] == b["valid_from"] and not a["is_current"]
        assert versions[-1]["valid_to"] is None and versions[-1]["is_current"]
    assert len(by_key["u1"]) == 3 and len(by_key["u2"]) == 1


def test_scd2_intervals_tiebreaker_orders_equal_timestamps(spark):
    from edna_dbt_library_spark.operators.relational import scd2_intervals

    rows = [("u", 2, "2024-01-01 00:00:00"), ("u", 1, "2024-01-01 00:00:00")]
    df = spark.createDataFrame(rows, "k string, id long, ts string").select(
        "k", "id", F.col("ts").cast("timestamp").alias("ts")
    )
    out = sorted(scd2_intervals(df, ["k"], "ts", tiebreakers=["id"]).collect(), key=lambda r: r["id"])
    assert not out[0]["is_current"] and out[1]["is_current"]  # id breaks the tie


def test_topk_per_key_membership_rank_and_group_limit(spark):
    from edna_dbt_library_spark.operators.relational import topk_per_key

    df = spark.range(100).select(
        (F.col("id") % 5).alias("g"), F.col("id").alias("v")
    )
    out = topk_per_key(df, ["g"], [F.col("v").desc()], 3)
    rows = out.collect()
    assert len(rows) == 15 and all(r["rank"] in (1, 2, 3) for r in rows)
    top_g0 = sorted(r["v"] for r in rows if r["g"] == 0)
    assert top_g0 == [85, 90, 95]
    # the k-limit is pushed into the window sort
    assert "WindowGroupLimit" in out._jdf.queryExecution().executedPlan().toString()
