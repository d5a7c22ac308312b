"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` but every conf here is
chosen to also be the right default on a large multi-executor cluster:
AQE handles runtime re-planning and skew, dynamic partition overwrite makes
the partition-merge materialization rewrite only touched partitions, and
the UTC session timezone pins timestamp semantics to the reference's
(BigQuery is UTC-only).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "edna-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # BigQuery timestamps are UTC; pin the session so formatting matches.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime partition coalescing + skew-join splitting. At 100 TB
        # these replace hand-tuned shuffle partition counts.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Partition-merge rewrites only the touched partitions of the target
        # (the parquet analogue of the reference's partition-pruned MERGE,
        # reference: macros/materialization/incremental_partition_merge.sql:239-252).
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # Driver fixtures carry parquet TIMESTAMP(NANOS) which Spark cannot
        # map to TimestampType; read as epoch-nanos longs and convert in the
        # loaders (sources/tables.py).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Arrow for any toPandas()/createDataFrame boundary (driver compare).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
