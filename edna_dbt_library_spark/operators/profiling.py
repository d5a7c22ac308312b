"""Column profiling: the pre-publish data-quality summary a contract
gate runs on every batch (null rates, cardinalities, ranges, dominant
values) — the operational companion of plans/contracts.py's schema
validation, which checks SHAPE; this checks CONTENT.

Scale design: ONE full scan total for the scalar profile — every
per-column statistic (null count, min, max, distinct) is an aggregate
expression in a single wide ``agg`` (all map-side combinable; the
one-row result is un-pivoted back to one row per column with
``stack``, staying fully lazy). Dominant values take one more pass:
all profiled columns explode into (column, value) pairs and share a
single groupBy shuffle + per-column top-1 window, instead of one
groupBy job per column.

Distinct counts: ``exact=False`` (default) uses Spark's built-in
HyperLogLog++ ``approx_count_distinct`` — the only sane choice at
corpus scale. ``exact=True`` switches to real COUNT(DISTINCT) for
gate/oracle use (the cross-engine hash gate can't replay Spark's HLL++
register layout; the library's own mergeable HLL sketch lives in
operators/sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = False,
) -> DataFrame:
    """Per-column profile: (column, n_rows, n_nulls, null_frac,
    n_distinct, min_value, max_value, top_value, top_value_count).

    min/max compute on the NATIVE type (string min of numerics would
    order lexicographically) and cast to string after. top_value is the
    most frequent non-null value, ties broken on the value string
    ascending; all-null columns profile with NULL top_value."""
    cols = columns or df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")

    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nulls_{c}"))
        aggs.append(
            (F.count_distinct(F.col(c)) if exact else F.approx_count_distinct(c)).alias(
                f"_dist_{c}"
            )
        )
        aggs.append(F.min(F.col(c)).cast("string").alias(f"_min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"_max_{c}"))
    wide = df.agg(*aggs)

    stack_args = []
    for c in cols:
        stack_args += [
            F.lit(c),
            F.col(f"_nulls_{c}"),
            F.col(f"_dist_{c}"),
            F.col(f"_min_{c}"),
            F.col(f"_max_{c}"),
        ]
    profile = wide.select(
        F.col("_n").alias("n_rows"),
        F.stack(
            F.lit(len(cols)), *stack_args
        ).alias("column", "n_nulls", "n_distinct", "min_value", "max_value"),
    ).select(
        "column",
        "n_rows",
        "n_nulls",
        F.round(F.col("n_nulls") / F.col("n_rows"), 6).alias("null_frac"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        "min_value",
        "max_value",
    )

    # dominant value: ONE scan (explode an array of (column, value)
    # structs — an n-way union would re-scan the input per column) and
    # one shared groupBy shuffle for every profiled column
    pairs = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("column"), F.col(c).cast("string").alias("value")
                        )
                        for c in cols
                    ]
                )
            ).alias("p")
        )
        .select("p.column", "p.value")
        .where(F.col("value").isNotNull())
    )
    counts = pairs.groupBy("column", "value").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("column").orderBy(F.col("cnt").desc(), F.col("value").asc())
    top = (
        counts.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select("column", F.col("value").alias("top_value"), F.col("cnt").alias("top_value_count"))
    )
    return profile.join(top, "column", "left").select(
        "column",
        "n_rows",
        "n_nulls",
        "null_frac",
        "n_distinct",
        "min_value",
        "max_value",
        "top_value",
        F.coalesce(F.col("top_value_count"), F.lit(0)).alias("top_value_count"),
    )
