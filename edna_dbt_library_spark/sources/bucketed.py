"""Bucketed tables: shuffle-free co-located joins.

BigQuery clusters; Spark's equivalent for *join co-location* is bucketing:
both sides pre-hashed into the same number of buckets on the join key, so
a join needs no exchange at all — the per-bucket files line up. At 100 TB
this converts the biggest fact-fact join shuffle into a metadata no-op;
the price is paid once at write time.

Bucketing needs the session catalog (bucket metadata lives in the table
definition, not the files), so these are managed ``saveAsTable`` tables
under ``spark.sql.warehouse.dir``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def create_bucketed_table(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
) -> DataFrame:
    """CREATE TABLE ... CLUSTERED BY (cols) INTO n BUCKETS [SORTED BY].
    Sorting within buckets additionally enables shuffle-AND-sort-free
    sort-merge joins."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    writer = df.write.format("parquet").mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)
    return spark.table(name)


def join_is_shuffle_free(joined: DataFrame) -> bool:
    """True when the executed plan contains no Exchange — the co-located
    bucketed-join success criterion (used by tests and plan audits)."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan
