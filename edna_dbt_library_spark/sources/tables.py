"""Loaders for the driver-provided parquet fixtures (TESTDATA.md).

The fixtures carry parquet TIMESTAMP(NANOS) columns, which Spark's parquet
reader rejects outright; with ``spark.sql.legacy.parquet.nanosAsLong`` they
arrive as epoch-nano longs and are converted here to microsecond
TimestampType (truncation — the same thing DuckDB's ``::TIMESTAMP`` cast
does, so oracle comparisons line up).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from edna_dbt_library_spark.functions.timestamps import ts_ns_to_timestamp

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Fixture columns stored as parquet TIMESTAMP(NANOS) (FIXTURES.md §A).
TIMESTAMP_NS_COLUMNS: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


def raw_ns_col(c: str) -> str:
    """Name of the retained raw epoch-nanos column for timestamp ``c``."""
    return f"_{c}_ns"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing nano timestamps to TimestampType.

    The raw epoch-nanos long survives as ``_{col}_ns``: predicates on the
    *converted* timestamp cannot reach the parquet scan (Catalyst won't
    invert the div-1000 expression), so window filters additionally apply a
    superset range on the raw column — that one pushes down to row-group
    min/max skipping, which is the entire incremental-scan story at scale
    (see operators.relational.window_filter)."""
    # runtime-settable confs the queries depend on, pinned here because the
    # driver may hand us a session built without them: nanos-as-long for
    # the TIMESTAMP(NANOS) fixtures, UTC so date_format/window literals
    # agree with the (timezone-naive) oracle engine.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Fixture generations vary: TIMESTAMP(NANOS) (handled below) vs
    # TIMESTAMP(MICROS) without the UTC-adjusted flag, which Spark 4 would
    # otherwise infer as TIMESTAMP_NTZ — a type unix_micros()/window()
    # reject. Read naive parquet timestamps as plain TimestampType; with
    # the UTC session zone the instant semantics are identical (and match
    # DuckDB's naive reading of the same files).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for c in TIMESTAMP_NS_COLUMNS.get(name, ()):
        if dtypes.get(c) == "bigint":
            from pyspark.sql import functions as F

            df = df.withColumn(raw_ns_col(c), F.col(c)).withColumn(c, ts_ns_to_timestamp(c))
    return df


def strip_raw_ns_cols(df: DataFrame) -> DataFrame:
    """Drop the loader's internal ``_{col}_ns`` pushdown companions (only
    where the converted base column exists). Materializations and contract
    checks call this so engine-internal columns never leak into user
    tables or schema contracts."""
    internal = [
        c for c in df.columns
        if c.startswith("_") and c.endswith("_ns") and c[1:-3] in df.columns
    ]
    return df.drop(*internal) if internal else df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture as a temp view (for spark.sql queries)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
