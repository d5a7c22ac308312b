#!/usr/bin/env python
"""Join-aggregate view IVM scale stress (operators/materializations.
run_incremental_join_agg_view): maintain SELECT grp, sum(amt), count(*)
FROM fact JOIN dim USING (j) GROUP BY grp over fact tables of
INCREASING size with the SAME absolute DML window on both bases, and
compare one composed delta sync against the recompute-per-run
alternative (full join + re-aggregation — what the reference's staging
models pay every run, incremental_partition_merge.sql:248-265).

The claim under test is the SCALING shape: the recompute pays the full
fact ⋈ dim join at every window, growing with fact volume, while the
composed sync costs O(window ⋈ other side + touched-group probes) —
the child join view never re-joins untouched rows and the aggregate
level shuffles one net partial per touched group. The dim-side window
includes group-moving updates and dim-key deletes, each retracting a
JOIN FAN-OUT (the expensive retraction class: one dim row's death kills
fact_rows/dim_keys pairs).

Window shape note: fact DML here is UNIFORM across the table (worst
case for the child sync's deleted-row (file, pos) join — same caveat
as tools/aggview_scale_stress.py); a time-localized window prunes it.

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
    run_incremental_join_agg_view,
)
from edna_dbt_library_spark.session import get_spark
from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse

SIZES = [
    int(s)
    for s in os.environ.get("JASTRESS_FACTS", "4000000,16000000").split(",")
]
DIMS = int(os.environ.get("JASTRESS_DIMS", 10_000))
GROUPS = 200
AGGS = {"total": ("sum", "amt"), "n_rows": ("count", "*")}
TASKS = 32
WINDOW_ROWS = 16_000  # same absolute fact window at every source size


def _fact(spark, lo: int, hi: int):
    return (
        spark.range(lo, hi)
        .withColumn("fid", F.col("id"))
        .withColumn("j", (F.col("id") * 2654435761) % DIMS)
        .withColumn("amt", (F.col("id") % 9973).cast("long"))
        .drop("id")
    )


def one_size(spark, facts: int) -> tuple[float, float, int, int]:
    root = tempfile.mkdtemp(prefix="edna_jastress_")
    wh = Warehouse(spark, root)
    l = wh.relation("stress", "fact")
    r = wh.relation("stress", "dim")
    tgt = wh.relation("stress", "by_grp")
    wh.create_as(l, _fact(spark, 0, facts).repartition(TASKS), TableMeta())
    wh.create_as(
        r,
        spark.range(DIMS)
        .withColumn("j", F.col("id"))
        .withColumn("grp", (F.col("id") % GROUPS).cast("long"))
        .drop("id"),
        TableMeta(),
    )
    s1 = run_incremental_join_agg_view(
        wh, l, r, tgt, "fid", "j", ["j"], ["grp"], AGGS
    )
    assert s1["mode"] == "full"

    def window(salt: int) -> None:
        den = max(1, facts // WINDOW_ROWS)
        wh.delete_where(l, f"fid % {den} = {salt}")
        wh.update_where(l, f"fid % {den} = {salt + 1}", {"amt": "amt + 1"})
        wh.append(
            l,
            _fact(
                spark,
                facts + salt * WINDOW_ROWS,
                facts + salt * WINDOW_ROWS + WINDOW_ROWS // 2,
            ).coalesce(4),
        )
        # dim churn: 5 group moves + 3 key deletes, each a join fan-out
        wh.update_where(r, f"j % 2000 = {salt}", {"grp": f"grp + {GROUPS}"})
        wh.delete_where(r, f"j % 3333 = {salt}")

    window(0)
    t0 = time.time()
    s2 = run_incremental_join_agg_view(
        wh, l, r, tgt, "fid", "j", ["j"], ["grp"], AGGS
    )
    t_delta = time.time() - t0
    assert s2["mode"] == "delta" and s2["join"]["mode"] == "delta"

    # steady-state second window (first sync carries JIT/page-cache
    # warm-up): same absolute size, timed again, min-of-two
    window(7)
    t0 = time.time()
    s3 = run_incremental_join_agg_view(
        wh, l, r, tgt, "fid", "j", ["j"], ["grp"], AGGS
    )
    t_delta = min(t_delta, time.time() - t0)
    assert s3["mode"] == "delta"

    # the production-common window shape: fact APPEND ONLY (late data),
    # no deletes, no dim churn — isolates the sync's window-sized cost
    # from the two scan terms (uniform-scatter delete join, dim-churn
    # fan-in over the unclustered fact)
    wh.append(
        l, _fact(spark, facts + 20 * WINDOW_ROWS, facts + 21 * WINDOW_ROWS).coalesce(4)
    )
    t0 = time.time()
    s4 = run_incremental_join_agg_view(
        wh, l, r, tgt, "fid", "j", ["j"], ["grp"], AGGS
    )
    t_append = time.time() - t0
    assert s4["mode"] == "delta"

    # the recompute-per-run alternative: full join + re-aggregation to
    # a scratch table (both sides pay a write)
    alt = wh.relation("stress", "by_grp_rejoin")
    t0 = time.time()
    direct = (
        wh.read(l)
        .join(wh.read(r), "j")
        .groupBy("grp")
        .agg(
            F.sum("amt").alias("total"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
    )
    wh.create_as(alt, direct, TableMeta())
    t_rejoin = time.time() - t0

    # exact equality gate: every (group, values) row must appear in BOTH
    mism = (
        wh.read(tgt)
        .select("grp", "total", "n_rows")
        .unionByName(wh.read(alt))
        .groupBy("grp", "total", "n_rows")
        .count()
        .where("count != 2")
        .count()
    )
    assert mism == 0, mism
    touched = s3["n_groups_upserted"] + s3["n_groups_retracted"]
    n_pairs = wh.read(wh.relation("stress", "by_grp__join")).count()
    shutil.rmtree(root, ignore_errors=True)
    return t_delta, t_append, t_rejoin, touched, n_pairs


def main():
    spark = get_spark(app_name="joinagg-stress")
    print(
        f"\nSWEEP sizes={SIZES} dims={DIMS} groups={GROUPS} "
        f"window_rows~{WINDOW_ROWS}",
        flush=True,
    )
    rows = []
    for facts in SIZES:
        d, a, r, touched, n_pairs = one_size(spark, facts)
        rows.append((facts, d, r))
        print(
            f"\nRESULT joinagg facts={facts} delta={d:.1f}s "
            f"append_only={a:.1f}s rejoin={r:.1f}s ratio={r / d:.2f}x "
            f"touched_groups={touched} child_pairs={n_pairs}",
            flush=True,
        )
    if len(rows) >= 2:
        (e0, d0, r0), (e1, d1, r1) = rows[0], rows[-1]
        print(
            f"\nSHAPE delta {d0:.1f}s -> {d1:.1f}s over {e1 / e0:.0f}x "
            f"source growth; rejoin {r0:.1f}s -> {r1:.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
