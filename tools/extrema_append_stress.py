#!/usr/bin/env python
"""Extrema-view APPEND-ONLY fast-path stress (r12 verdict missing #5,
closed in r13): maintain SELECT grp, min(v), max(v) FROM src GROUP BY
grp over sources whose GROUP HISTORY DEPTH varies (same group count,
more rows per group), drive the SAME absolute append-only window at
every depth, and time one sync each.

The claim under test: an append-only window (no σ-admitted deletes)
takes the merge fast path — greatest/least(stored, window partials)
against a touched-group target probe — whose cost is INDEPENDENT of
the groups' history size (the touched groups' source rows are never
rescanned). The control arm adds ONE delete to the same window: the
slow path's touched-group recompute has to re-aggregate every touched
group's history, so its cost GROWS with depth — the exact term the
fast path removes for the production-common append-only shape.

Redirect stdout to a file; the RESULT lines are paste-ready for
PLAN_AUDIT.md's stress section (tools/plan_audit.py STRESS_SECTION).
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from edna_dbt_library_spark.operators.materializations import (
    run_incremental_extrema_view,
)
from edna_dbt_library_spark.session import get_spark
from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse

GROUPS = int(os.environ.get("XSTRESS_GROUPS", 50_000))
DEPTHS = [int(d) for d in os.environ.get("XSTRESS_DEPTHS", "8,64,256").split(",")]
WINDOW_ROWS = 20_000  # same absolute append at every depth
TASKS = 32
AGGS = {"lo": ("min", "v"), "hi": ("max", "v")}


def _rows(spark, lo: int, hi: int):
    return (
        spark.range(lo, hi)
        .withColumn("grp", ((F.col("id") * 2654435761) % GROUPS).cast("long"))
        .withColumn("v", (F.col("id") % 1_000_003).cast("long"))
        .withColumn("rid", F.col("id"))
        .drop("id")
    )


def one_depth(spark, depth: int) -> None:
    n = GROUPS * depth
    root = tempfile.mkdtemp(prefix="edna_xstress_")
    try:
        wh = Warehouse(spark, root)
        src = wh.relation("stress", "events")
        tgt = wh.relation("stress", "extrema")
        wh.create_as(src, _rows(spark, 0, n).repartition(TASKS), TableMeta())
        s = run_incremental_extrema_view(wh, src, tgt, ["grp"], AGGS)
        assert s["mode"] == "full"

        # append-only windows (min-of-two: first carries warm-up)
        t_fast = None
        for i in range(2):
            wh.append(
                src,
                _rows(
                    spark, n + i * WINDOW_ROWS, n + (i + 1) * WINDOW_ROWS
                ).coalesce(4),
            )
            t0 = time.time()
            s = run_incremental_extrema_view(wh, src, tgt, ["grp"], AGGS)
            dt = time.time() - t0
            assert s.get("fast_path") == "append", s
            t_fast = dt if t_fast is None else min(t_fast, dt)

        # control: the SAME append plus ONE delete — the slow path's
        # touched-group recompute rescans every touched group's history
        wh.append(
            src,
            _rows(spark, n + 2 * WINDOW_ROWS, n + 3 * WINDOW_ROWS).coalesce(4),
        )
        wh.delete_where(src, f"rid = {n // 2}")
        t0 = time.time()
        s = run_incremental_extrema_view(wh, src, tgt, ["grp"], AGGS)
        t_slow = time.time() - t0
        assert s["mode"] == "delta" and "fast_path" not in s, s
        print(
            f"\nRESULT depth={depth}: src_rows={n} window={WINDOW_ROWS} "
            f"t_append_fastpath={t_fast:.1f}s t_with_one_delete={t_slow:.1f}s",
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    spark = get_spark(master=f"local[{TASKS}]", shuffle_partitions=TASKS)
    for depth in DEPTHS:
        one_depth(spark, depth)


if __name__ == "__main__":
    main()
