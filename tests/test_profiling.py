"""Column profiling (operators/profiling.py): hand-checked stats,
null/all-null edges, native-type min/max, approx-vs-exact distinct,
and the single-scan plan shape."""

import re

import pytest
from pyspark.sql import functions as F

from edna_dbt_library_spark.operators.profiling import profile_columns


def _df(spark):
    rows = [
        (1, "a", 10.0),
        (2, "b", None),
        (3, "a", None),
        (None, "a", None),
    ]
    return spark.createDataFrame(rows, "k long, s string, x double")


def test_profile_hand_check(spark):
    prof = {r["column"]: r for r in profile_columns(_df(spark), exact=True).collect()}
    assert set(prof) == {"k", "s", "x"}
    k = prof["k"]
    assert (k["n_rows"], k["n_nulls"], k["null_frac"], k["n_distinct"]) == (4, 1, 0.25, 3)
    # native-typed min/max: longs compare numerically, rendered as strings
    assert (k["min_value"], k["max_value"]) == ("1", "3")
    s = prof["s"]
    assert (s["n_distinct"], s["top_value"], s["top_value_count"]) == (2, "a", 3)
    x = prof["x"]
    assert (x["n_nulls"], x["null_frac"], x["top_value"], x["top_value_count"]) == (
        3,
        0.75,
        "10.0",
        1,
    )


def test_profile_native_numeric_ordering(spark):
    """String min of [9, 10] would be '10'; the profile must say 9."""
    df = spark.createDataFrame([(9,), (10,)], "v long")
    r = profile_columns(df, exact=True).collect()[0]
    assert (r["min_value"], r["max_value"]) == ("9", "10")


def test_profile_all_null_column(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "k long, dead string")
    r = {x["column"]: x for x in profile_columns(df, ["dead"], exact=True).collect()}["dead"]
    assert (r["n_nulls"], r["null_frac"], r["n_distinct"]) == (2, 1.0, 0)
    assert r["min_value"] is None and r["top_value"] is None and r["top_value_count"] == 0


def test_profile_top_value_tie_breaks_on_value(spark):
    df = spark.createDataFrame([("b",), ("a",)], "v string")
    r = profile_columns(df, exact=True).collect()[0]
    assert (r["top_value"], r["top_value_count"]) == ("a", 1)


def test_profile_unknown_column_raises(spark):
    with pytest.raises(ValueError):
        profile_columns(_df(spark), ["nope"])


def test_profile_approx_close_to_exact(spark):
    df = spark.range(5000).select(F.col("id").alias("k"), (F.col("id") % 97).alias("m"))
    got = {r["column"]: r["n_distinct"] for r in profile_columns(df).collect()}
    assert got["m"] == pytest.approx(97, rel=0.05)
    assert got["k"] == pytest.approx(5000, rel=0.1)  # default rsd is 0.05, ~2 sigma


def test_profile_scalar_stats_are_one_scan(spark):
    """The wide agg must be ONE aggregate over one scan (map-side
    combinable), not one job per column: a single Aggregate in the
    optimized plan of the scalar-profile half."""
    from edna_dbt_library_spark.operators.profiling import profile_columns as pc

    df = _df(spark)
    plan = pc(df, exact=False)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    # the dominant-value branch adds its own shuffle; the scalar branch
    # must not shuffle more than the final single-row aggregation
    exch = len(re.findall(r"(?<!Broadcast)(?<!Reused)Exchange (hash|range|Single)", plan))
    assert exch <= 4, plan


def test_stream_column_profiles_time_series(spark, tmp_path):
    """Profiling composes with Structured Streaming: each micro-batch
    lands one profile row per column in its own batch subdir (replay
    rewrites, never double-counts), and the history read surfaces the
    drift — a batch of nulls shows up as its own null_frac=1.0 row."""
    from edna_dbt_library_spark.streaming import (
        read_profile_history,
        stream_column_profiles,
    )

    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string").coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    spark.createDataFrame([(3, None), (4, None)], "k long, v string").coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    stream = spark.readStream.schema("k long, v string").option(
        "maxFilesPerTrigger", 1
    ).parquet(str(src))
    q = stream_column_profiles(
        stream, ["k", "v"], str(tmp_path / "store"), str(tmp_path / "cp")
    )
    q.awaitTermination(120)

    hist = read_profile_history(spark, str(tmp_path / "store")).collect()
    by_batch = {}
    for r in hist:
        by_batch.setdefault(r["batch"], {})[r["column"]] = r
    assert len(by_batch) == 2
    fracs = sorted(b["v"]["null_frac"] for b in by_batch.values())
    assert fracs == [0.0, 1.0]  # the all-null batch is its own visible row
    for b in by_batch.values():
        assert b["k"]["n_rows"] == 2 and b["k"]["n_nulls"] == 0


# ---------------------------------------------------------------------------
# Profile drift gate (profiling.profile_drift / enforce_profile_drift)


def _drift_fixtures(spark):
    from edna_dbt_library_spark.sources.tables import load_table

    base = load_table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    return base


def test_profile_drift_clean_batch_passes(spark):
    from edna_dbt_library_spark.operators.profiling import (
        enforce_profile_drift,
        profile_columns,
        profile_drift,
    )

    base = _drift_fixtures(spark)
    # a different (but same-distribution) slice of the same table
    b = profile_columns(base.where(F.col("o_orderkey") % 2 == 0), exact=True)
    c = profile_columns(base.where(F.col("o_orderkey") % 2 == 1), exact=True)
    assert profile_drift(b, c).count() == 0
    enforce_profile_drift(b, c)  # must not raise


def test_profile_drift_gate_fails_injected_bad_batch(spark):
    """An injected drifted batch — status NULLed on 40% of rows and a
    collapsed (constant) price column — must fail the gate with the
    right (column, metric) rows; the clean columns stay silent."""
    import pytest as _pytest

    from edna_dbt_library_spark.operators.profiling import (
        enforce_profile_drift,
        profile_columns,
        profile_drift,
    )
    from edna_dbt_library_spark.plans.contracts import ContractError

    base = _drift_fixtures(spark)
    drifted = base.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 < 2, F.lit(None).cast("string"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        F.lit(42.0).alias("o_totalprice"),  # cardinality collapse + dominant value
    )
    b = profile_columns(base, exact=True)
    c = profile_columns(drifted, exact=True)
    v = {(r["column"], r["metric"]) for r in profile_drift(b, c).collect()}
    assert ("o_orderstatus", "null_frac") in v
    assert ("o_totalprice", "distinct_frac") in v
    assert ("o_totalprice", "top_frac") in v
    assert not any(col == "o_orderkey" for col, _m in v)
    with _pytest.raises(ContractError, match="o_totalprice.distinct_frac"):
        enforce_profile_drift(b, c)


def test_profile_drift_column_set_changes(spark):
    from edna_dbt_library_spark.operators.profiling import profile_columns, profile_drift

    base = _drift_fixtures(spark)
    b = profile_columns(base, exact=True)
    c = profile_columns(base.drop("o_totalprice").withColumn("extra", F.lit(1)), exact=True)
    v = {(r["column"], r["metric"]) for r in profile_drift(b, c).collect()}
    assert ("o_totalprice", "missing_column") in v
    assert ("extra", "new_column") in v


def test_profile_drift_baselines_transfer_across_batch_sizes(spark):
    """All drift metrics are ratios of n_rows, so a baseline profiled on
    a 10x larger corpus gates a small batch without false alarms."""
    from edna_dbt_library_spark.operators.profiling import profile_columns, profile_drift

    base = _drift_fixtures(spark)
    b = profile_columns(base, exact=True)  # full table baseline
    c = profile_columns(base.where(F.col("o_orderkey") % 10 == 3), exact=True)
    ok = profile_drift(b, c).where(F.col("metric") == "null_frac")
    assert ok.count() == 0


def test_group_zscore_outliers_planted_anomaly(spark):
    from edna_dbt_library_spark.operators.profiling import group_zscore_outliers

    rows = [(i, "a", float(v)) for i, v in enumerate([10, 11, 9, 10, 12, 10, 11, 9, 10, 500])]
    rows += [(100 + i, "b", 5.0) for i in range(5)]  # zero variance: no output
    rows += [(200, "c", 1.0)]  # n < 2: no output
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    out = group_zscore_outliers(df, "value", ["event_type"], 2.5)
    got = out.collect()
    assert [r["event_id"] for r in got] == [9]  # only the planted spike
    assert got[0]["zscore"] > 2.5
    assert out.columns == ["event_id", "event_type", "value", "zscore"]
    # deterministic under repartitioning
    again = group_zscore_outliers(df.repartition(7), "value", ["event_type"], 2.5).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
    # plan: stats broadcast back, corpus never shuffles for the join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
