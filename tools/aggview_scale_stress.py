#!/usr/bin/env python
"""Aggregate-view IVM scale stress (operators/materializations.
run_incremental_agg_view / run_incremental_timeseries_view): maintain a
time-bucketed SUM/COUNT view over event tables of INCREASING size with
the SAME absolute DML window, and compare one delta sync against the
full re-aggregation the reference's recompute-per-run model pays. The
claim under test is a SCALING shape, not one wall number (single-host
runs swing 3x with page-cache/GC state): the recompute cost grows with
source volume while the delta cost tracks the window + view — so the
ratio must widen as the source grows, and at 100 TB the recompute is a
full-corpus scan per window while the sync stays window-sized.

Window shape note: the DML predicates here hit rows UNIFORMLY across
the table (the worst case for the sync — every source file carries
delete entries, so the deleted-row (file, pos) join scans the whole
window span). A time-localized window (the common case: late data
lands in recent partitions) prunes that join to the touched files.

Redirect stdout to a file; the RESULT lines are paste-ready for
PLAN_AUDIT.md's stress section (tools/plan_audit.py STRESS_SECTION).
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from edna_dbt_library_spark.operators.materializations import (
    run_incremental_timeseries_view,
)
from edna_dbt_library_spark.session import get_spark
from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse

SIZES = [
    int(s)
    for s in os.environ.get("AVSTRESS_EVENTS", "4000000,16000000").split(",")
]
SENSORS = int(os.environ.get("AVSTRESS_SENSORS", 2_000))
HOURS = 24 * 14
HOUR_US = 3_600_000_000
AGGS = {"total": ("sum", "amt"), "n_rows": ("count", "*")}
TASKS = 32
WINDOW_ROWS = 16_000  # same absolute window at every source size


def one_size(
    spark, events: int, localized: bool
) -> tuple[float, float, int, int]:
    root = tempfile.mkdtemp(prefix="edna_avstress_")
    wh = Warehouse(spark, root)
    src = wh.relation("stress", "events")
    tgt = wh.relation("stress", "hourly")
    ev = (
        spark.range(events)
        .withColumn("sensor", (F.col("id") * 2654435761) % SENSORS)
        .withColumn(
            "ts",
            F.timestamp_seconds(
                ((F.col("id") * 40503) % (HOURS * 3600)).cast("long")
            ),
        )
        .withColumn("amt", (F.col("id") % 9973).cast("long"))
        .withColumn("d", F.date_format("ts", "yyyy-MM-dd"))
        .repartition(TASKS)
    )
    wh.create_as(
        src, ev, TableMeta(partition_by="d") if localized else TableMeta()
    )
    s1 = run_incremental_timeseries_view(
        wh, src, tgt, ["sensor"], "ts", AGGS, bucket_us=HOUR_US
    )
    assert s1["mode"] == "full"

    if localized:
        # production shape: day-partitioned source, window touches the
        # LAST day only — the deleted-row (file, pos) join prunes to
        # that day's partition files
        day = "1970-01-14"
        den = max(1, events // (HOURS // 24) // WINDOW_ROWS)
        wh.delete_where(src, f"d = '{day}' AND id % {den} = 0")
        wh.update_where(
            src, f"d = '{day}' AND id % {den} = 1", {"amt": "amt + 1"}
        )
    else:
        # worst case: ~WINDOW_ROWS deletes UNIFORM across the table —
        # every file carries delete entries, so the deleted-row join
        # scans the whole source once
        den = max(1, events // WINDOW_ROWS)
        wh.delete_where(src, f"id % {den} = 0")
        wh.update_where(src, f"id % {den} = 1", {"amt": "amt + 1"})
    wh.append(
        src,
        spark.range(events, events + WINDOW_ROWS // 2)
        .withColumn("sensor", F.col("id") % SENSORS)
        .withColumn(
            "ts",
            F.timestamp_seconds(
                ((F.col("id") * 40503) % (HOURS * 3600)).cast("long")
            ),
        )
        .withColumn("amt", F.lit(7).cast("long"))
        .withColumn("d", F.date_format("ts", "yyyy-MM-dd"))
        .coalesce(4),
    )
    t0 = time.time()
    s2 = run_incremental_timeseries_view(
        wh, src, tgt, ["sensor"], "ts", AGGS, bucket_us=HOUR_US
    )
    t_delta = time.time() - t0
    assert s2["mode"] == "delta"

    # steady-state second window (the first sync carries JIT/page-cache
    # warm-up on a noisy single host): a fresh localized-or-uniform
    # window of the same absolute size, timed again
    if localized:
        wh.delete_where(src, "d = '1970-01-13' AND id % 3 = 0")
    else:
        den2 = max(1, events // WINDOW_ROWS)
        wh.delete_where(src, f"id % {den2} = 2")
    wh.append(
        src,
        spark.range(events + WINDOW_ROWS, events + 2 * WINDOW_ROWS)
        .withColumn("sensor", F.col("id") % SENSORS)
        .withColumn(
            "ts",
            F.timestamp_seconds(
                ((F.col("id") * 40503) % (HOURS * 3600)).cast("long")
            ),
        )
        .withColumn("amt", F.lit(9).cast("long"))
        .withColumn("d", F.date_format("ts", "yyyy-MM-dd"))
        .coalesce(4),
    )
    t0 = time.time()
    s3 = run_incremental_timeseries_view(
        wh, src, tgt, ["sensor"], "ts", AGGS, bucket_us=HOUR_US
    )
    t_delta2 = time.time() - t0
    assert s3["mode"] == "delta"
    t_delta = min(t_delta, t_delta2)

    # the recompute-per-run alternative: full re-aggregation of the
    # current source to a scratch table (both sides pay a write)
    alt = wh.relation("stress", "hourly_reagg")
    t0 = time.time()
    direct = (
        wh.read(src)
        .withColumn("bucket", F.expr(f"unix_micros(ts) div {HOUR_US}"))
        .groupBy("sensor", "bucket")
        .agg(
            F.sum("amt").alias("total"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )
    wh.create_as(alt, direct, TableMeta())
    t_reagg = time.time() - t0

    # exact equality gate: every (group, values) row must appear in BOTH
    mism = (
        wh.read(tgt)
        .unionByName(wh.read(alt))
        .groupBy("sensor", "bucket", "total", "n_rows")
        .count()
        .where("count != 2")
        .count()
    )
    assert mism == 0, mism
    touched = s2["n_groups_upserted"] + s2["n_groups_retracted"]
    n_view = wh.read(tgt).count()
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return t_delta, t_reagg, touched, n_view


def main():
    spark = get_spark(app_name="aggview-stress")
    print(
        f"\nSWEEP sizes={SIZES} sensors={SENSORS} hours={HOURS} "
        f"window_rows~{WINDOW_ROWS}",
        flush=True,
    )
    for localized in (False, True):
        tag = "localized" if localized else "uniform"
        rows = []
        for events in SIZES:
            d, r, touched, n_view = one_size(spark, events, localized)
            rows.append((events, d, r))
            print(
                f"\nRESULT {tag} events={events} delta={d:.1f}s "
                f"reagg={r:.1f}s ratio={r / d:.2f}x "
                f"touched_groups={touched} view_groups={n_view}",
                flush=True,
            )
        if len(rows) >= 2:
            (e0, d0, r0), (e1, d1, r1) = rows[0], rows[-1]
            print(
                f"\nSCALING {tag} source x{e1 / e0:.0f}: "
                f"delta x{d1 / d0:.2f}, reagg x{r1 / r0:.2f}",
                flush=True,
            )


if __name__ == "__main__":
    main()
