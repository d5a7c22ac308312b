#!/usr/bin/env python
"""Mixed-rollup INCREMENTAL-SERVE scale stress (r12 verdict What's-wrong
#1, closed in r13): maintain SELECT uid, count(*), sum(amt),
count(DISTINCT item) FROM src GROUP BY uid over a HIGH-CARDINALITY
group domain (one group per user — the per-user rollup where the old
full-rewrite serve was worst), drive windows that touch K groups for
increasing K at a FIXED view size, and time one composed sync each.

The claim under test: the r13 serve's WRITE VOLUME tracks TOUCHED
GROUPS, not |view| — the touched keys come from the children's own
changelogs, the children are probed under the key-literal prune, and
one atomic keyed upsert lands the replacements (stats carry
``n_groups_served``; the tool also measures bytes landed on the target
per window). The r12 alternative (both children read in FULL,
left-joined, create_as over the whole target) ships |view| rows per
window regardless of K — cheap at this fixture scale, catastrophic at
10^9 users, which is why write volume (not local wall time, which the
CHILDREN's uniform-update window dominates here) is the scale number.

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
    run_incremental_agg_distinct_view,
)
from edna_dbt_library_spark.session import get_spark
from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse

GROUPS = int(os.environ.get("ADSTRESS_GROUPS", 1_000_000))
ROWS_PER_GROUP = 4
TOUCHED = [
    int(k) for k in os.environ.get("ADSTRESS_TOUCHED", "2000,8000,32000").split(",")
]
TASKS = 32
AGGS = {"n": ("count", "*"), "total": ("sum", "amt")}


def _src(spark, n_groups: int):
    n = n_groups * ROWS_PER_GROUP
    return (
        spark.range(n)
        .withColumn("uid", (F.col("id") % n_groups).cast("long"))
        .withColumn("item", ((F.col("id") * 2654435761) % 5000).cast("long"))
        .withColumn("amt", (F.col("id") % 997).cast("long"))
        .drop("id")
        .withColumn("rid", F.monotonically_increasing_id())
    )


def main() -> None:
    spark = get_spark(master=f"local[{TASKS}]", shuffle_partitions=TASKS)
    root = tempfile.mkdtemp(prefix="edna_adstress_")
    try:
        wh = Warehouse(spark, root)
        src = wh.relation("stress", "events")
        tgt = wh.relation("stress", "per_user")
        t0 = time.time()
        wh.create_as(src, _src(spark, GROUPS).repartition(TASKS), TableMeta())
        s = run_incremental_agg_distinct_view(
            wh, src, tgt, ["uid"], AGGS, "item", out="n_items"
        )
        t_build = time.time() - t0
        assert s["served"] == "full"
        n_view = wh.read(tgt).count()
        print(
            f"\nRESULT build: groups={GROUPS} view_rows={n_view} "
            f"src_rows={GROUPS * ROWS_PER_GROUP} t={t_build:.1f}s",
            flush=True,
        )

        base = GROUPS  # contiguous uid windows, disjoint per K
        for i, k in enumerate(TOUCHED):
            lo = (i * 40_000) % GROUPS
            hi = lo + k
            # touch exactly k groups: distinct churn on half, measure
            # churn on the other half, plus a retirement slice
            wh.update_where(
                src, f"uid >= {lo} AND uid < {lo + k // 2}", {"item": "item + 9999"}
            )
            wh.update_where(
                src,
                f"uid >= {lo + k // 2} AND uid < {hi}",
                {"amt": "amt + 1"},
            )
            b0 = sum(b for _, b in wh.partition_file_stats(tgt).values())
            t0 = time.time()
            s = run_incremental_agg_distinct_view(
                wh, src, tgt, ["uid"], AGGS, "item", out="n_items"
            )
            dt = time.time() - t0
            b1 = sum(b for _, b in wh.partition_file_stats(tgt).values())
            assert s["served"] == "delta", s
            print(
                f"\nRESULT serve: touched_groups~{k} view_rows={n_view} "
                f"groups_served={s['n_groups_served']} "
                f"target_bytes_appended={b1 - b0} t_sync={dt:.1f}s",
                flush=True,
            )

        # the r12 alternative: full group-domain rewrite (both children
        # read whole, left join, create_as) — what every window used to pay
        child_a = wh.relation("stress", "per_user__agg")
        child_d = wh.relation("stress", "per_user__dcnt")
        alt = wh.relation("stress", "per_user_rewrite")
        t0 = time.time()
        a, d = wh.read(child_a), wh.read(child_d)
        joined = a.join(d, ["uid"], "left").withColumn(
            "n_items", F.coalesce(F.col("n_items"), F.lit(0).cast("long"))
        )
        wh.create_as(alt, joined, TableMeta())
        t_full = time.time() - t0
        b_full = sum(b for _, b in wh.partition_file_stats(alt).values())
        print(
            f"\nRESULT full-rewrite alternative (per window!): "
            f"rows_shipped={n_view} bytes={b_full} t={t_full:.1f}s",
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
