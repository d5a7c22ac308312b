#!/usr/bin/env python
"""Join-view IVM scale stress (operators/materializations.
run_incremental_join_view): on a multi-million-row fact joined to a
wide-ish dimension, measure the one-time full materialize, then a
delta sync shipping a sparse both-sides DML window — the claim under
test is that a sync costs O(delta joined to the other side + key
probes), never a re-run of the full join.

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
    run_incremental_join_view,
)
from edna_dbt_library_spark.session import get_spark
from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse

FACT_ROWS = int(os.environ.get("JVSTRESS_FACT", 4_000_000))
DIM_ROWS = int(os.environ.get("JVSTRESS_DIM", 100_000))
DAYS = 32
TASKS = 32


def main():
    spark = get_spark(app_name="joinview-stress")
    root = tempfile.mkdtemp(prefix="edna_jvstress_")
    wh = Warehouse(spark, root)
    l = wh.relation("stress", "fact")
    r = wh.relation("stress", "dim")
    t = wh.relation("stress", "view")

    fact = (
        spark.range(FACT_ROWS)
        .withColumn("fk", (F.col("id") * 2654435761) % DIM_ROWS)
        .withColumn(
            "d",
            F.date_format(
                F.date_add(F.lit("2024-01-01"), (F.col("id") % DAYS).cast("int")),
                "yyyy-MM-dd",
            ),
        )
        .withColumn("fv", F.col("id") % 997)
        # realistic row width: the full join must carry these bytes
        # through its shuffle + write; the delta sync never touches them
        # for unchanged rows
        .withColumn(
            "pad",
            F.concat(*[F.md5(F.concat(F.col("id") + F.lit(i))) for i in range(4)]),
        )
        .repartition(TASKS)
    )
    dim = (
        spark.range(DIM_ROWS)
        .select(
            F.col("id").alias("fk"),
            (F.col("id") % 131).alias("dv"),
            F.md5(F.col("id").cast("string")).alias("dpad"),
        )
        .coalesce(4)
    )
    wh.create_as(l, fact, TableMeta(partition_by="d"))
    wh.create_as(r, dim, TableMeta())
    print(f"\nBUILT fact={FACT_ROWS} dim={DIM_ROWS}", flush=True)

    t0 = time.time()
    s1 = run_incremental_join_view(wh, l, r, t, "id", "fk", ["fk"])
    t_full = time.time() - t0
    print(f"\nFULL mode={s1['mode']} pairs={s1['n_pairs_inserted']} wall={t_full:.2f}s", flush=True)

    # sparse both-sides window: ~0.1% fact delete + update, 50k append,
    # ~1% dim update (each dim touch retires/relands its whole fan-out)
    wh.delete_where(l, "fv % 997 < 1")
    wh.update_where(l, "fv % 997 = 1", {"fv": F.col("fv") + 1})
    wh.append(
        l,
        spark.range(FACT_ROWS, FACT_ROWS + 50_000)
        .withColumn("fk", F.col("id") % DIM_ROWS)
        .withColumn("d", F.lit("2024-03-01"))
        .withColumn("fv", F.lit(7))
        .withColumn("pad", F.md5(F.col("id").cast("string")))
        .coalesce(4),
    )
    wh.update_where(r, "fk % 100 = 3", {"dv": F.col("dv") + 1000})
    t0 = time.time()
    s2 = run_incremental_join_view(wh, l, r, t, "id", "fk", ["fk"])
    t_delta = time.time() - t0
    print(
        f"\nDELTA mode={s2['mode']} pairs={s2['n_pairs_inserted']} wall={t_delta:.2f}s",
        flush=True,
    )
    n_view = wh.read(t).count()
    n_direct = wh.read(l).join(wh.read(r), "fk").count()
    assert s2["mode"] == "delta" and n_view == n_direct, (s2, n_view, n_direct)
    print(
        f"\nRESULT full={t_full:.1f}s delta={t_delta:.1f}s "
        f"view_rows={n_view} delta_pairs={s2['n_pairs_inserted']} "
        f"({100.0 * s2['n_pairs_inserted'] / n_view:.2f}% of view)",
        flush=True,
    )

    # NOTE (measured, kept for honesty): bloom sidecars on the view's
    # id/fk DO NOT help this window — the probe keys scatter uniformly
    # across every view file, so the candidate set is all files and the
    # sidecar probe only adds overhead (23.4s vs 15.1s un-indexed at
    # 4M). Blooms pay off for LOCALIZED probes (replica_scale_stress's
    # fresh-id-range case); scattered-key merge-on-read inherently pays
    # one key-COLUMN scan per probe — column-pruned, so the delta cost
    # is width-independent while the full rebuild pays every byte.
    # The crossover is therefore a row-width x row-count product:
    # rerun with JVSTRESS_FACT=16000000 for the scaling point.


if __name__ == "__main__":
    main()
