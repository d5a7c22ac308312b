#!/usr/bin/env python
"""Time-series surface scale stress (operators/timeseries.py): on a
multi-million-event synthetic stream, measure (a) the hourly resample
(one map-side-combined shuffle), (b) dense gap-fill + LOCF + integer
linear interpolation (grid sized by keys x time range, never events),
and (c) the claim that sliding windows over the SPARSE series via
integer RANGE frames beat densify-then-aggregate — both give identical
answers on the occupied buckets, so the row-count and wall gap is pure
overhead of materializing zeros.

Redirect stdout to a file; RESULT lines are paste-ready for
PLAN_AUDIT.md's stress section (tools/plan_audit.py STRESS_SECTION).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from edna_dbt_library_spark.operators.timeseries import (
    HOUR_US,
    gap_fill,
    interpolate_linear,
    locf,
    resample_sum,
    sliding_agg,
)
from edna_dbt_library_spark.session import get_spark

EVENTS = int(os.environ.get("TSSTRESS_EVENTS", 20_000_000))
USERS = int(os.environ.get("TSSTRESS_USERS", 50_000))
HOURS = 24 * 365  # one year


def main():
    spark = get_spark(app_name="timeseries-stress")
    # sparse occupancy: each user observes ~EVENTS/USERS hours of a year
    ev = (
        spark.range(EVENTS)
        .select(
            ((F.col("id") * 2654435761) % USERS).alias("user_id"),
            F.timestamp_micros(
                F.lit(1704067200000000)
                + ((F.col("id") * 40503) % HOURS) * F.lit(HOUR_US)
                + (F.col("id") % 3600) * F.lit(1_000_000)
            ).alias("ts"),
            ((F.col("id") * 97) % 10_000).alias("cents"),
        )
        .repartition(32)
        .localCheckpoint(eager=True)
    )

    t0 = time.time()
    r = resample_sum(ev, ["user_id"], "ts", "cents", HOUR_US).localCheckpoint(
        eager=True
    )
    n_sparse = r.count()
    t_resample = time.time() - t0
    occupancy = n_sparse / (USERS * HOURS)
    print(
        f"\nRESAMPLE events={EVENTS} -> sparse_rows={n_sparse} "
        f"(occupancy {100 * occupancy:.1f}%) wall={t_resample:.1f}s",
        flush=True,
    )

    t0 = time.time()
    dense = gap_fill(r, ["user_id"])
    filled = interpolate_linear(
        locf(dense, ["user_id"], "v", out="v_locf"), ["user_id"], "v", out="v_lin"
    )
    n_dense = filled.count()
    t_fill = time.time() - t0
    print(
        f"\nGAPFILL dense_rows={n_dense} ({n_dense / max(1, n_sparse):.1f}x sparse) "
        f"locf+interp wall={t_fill:.1f}s",
        flush=True,
    )

    # sliding 24h window: sparse RANGE frame vs densify-then-ROWS-frame
    t0 = time.time()
    s_sparse = sliding_agg(r, ["user_id"], 24)
    n1 = s_sparse.count()
    t_sparse = time.time() - t0

    from pyspark.sql import Window

    t0 = time.time()
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(-23, 0)
    )
    dz = dense.withColumn("v0", F.coalesce("v", F.lit(0))).withColumn(
        "n0", F.coalesce("n", F.lit(0))
    )
    s_dense = dz.withColumn("ws", F.sum("v0").over(w)).withColumn(
        "wn", F.sum("n0").over(w)
    )
    n2 = s_dense.count()
    t_dense = time.time() - t0
    print(
        f"\nSLIDING sparse_range_frame rows={n1} wall={t_sparse:.1f}s | "
        f"densify_rows_frame rows={n2} wall={t_dense:.1f}s "
        f"({t_dense / t_sparse:.1f}x)",
        flush=True,
    )

    # equivalence on the occupied buckets (sampled users, exact)
    probe = s_sparse.where(F.pmod(F.col("user_id"), F.lit(997)) == 1)
    probe_d = s_dense.where(
        (F.pmod(F.col("user_id"), F.lit(997)) == 1) & F.col("observed")
    ).select("user_id", "bucket", F.col("ws").alias("window_v"), F.col("wn").alias("window_n"))
    a = sorted(map(tuple, probe.select("user_id", "bucket", "window_v", "window_n").collect()))
    b = sorted(map(tuple, probe_d.collect()))
    assert a == b, "sparse RANGE frame != densified ROWS frame on occupied buckets"
    print(
        f"\nRESULT resample={t_resample:.1f}s fill={t_fill:.1f}s "
        f"sliding_sparse={t_sparse:.1f}s sliding_densified={t_dense:.1f}s "
        f"dense_blowup={n_dense / max(1, n_sparse):.1f}x equal_on_occupied=True",
        flush=True,
    )


if __name__ == "__main__":
    main()
