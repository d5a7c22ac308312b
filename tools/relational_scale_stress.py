#!/usr/bin/env python
"""Scale stress for the relational/TPC-H surface: the five most expensive
scored queries (q21, q2, q18, q9, q3) on a x10 fixture-multiplied corpus.

Why this exists: the dedup/embedding/retrieval families have measured
stress tables proving their caps hold when the data grows; the
relational surface only had sf0.1 numbers. This harness multiplies the
two FACT tables (orders, lineitem) by x10 (~6M lineitem rows) with
key-shifted replicas that preserve per-order structure (o_orderkey' =
o_orderkey*10+rep, so each replica order keeps its own lineitems), keeps
the dimension tables at original size (the realistic scale-up shape:
facts grow, dims don't), and records per query:

* wall time at 1x vs 10x (superlinear growth flags a plan that won't
  survive the next 100x),
* the AQE-final join strategy mix (BroadcastHashJoin vs SortMergeJoin
  vs ShuffledHashJoin counts) at both scales — a BHJ that silently
  flips to SMJ when a "dimension" outgrows the broadcast threshold is
  exactly what this harness exists to surface.

Results are summarized in PLAN_AUDIT.md ("relational scale stress").

Usage: python tools/relational_scale_stress.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from edna_dbt_library_spark.queries import REGISTRY
from edna_dbt_library_spark.session import get_spark
from edna_dbt_library_spark.sources import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULT = int(os.environ.get("SPARK_GRAFT_STRESS_MULT", "10"))
QUERIES = [
    "q21_waiting_supplier",
    "q2_min_cost_supplier",
    "q18_large_volume",
    "q9_product_profit",
    "q3_top_orders",
]
DIM_TABLES = ["region", "nation", "customer", "supplier", "part", "events",
              "documents", "embeddings"]


def build_scaled_dir(spark, root: str) -> str:
    """A load_table-compatible sf dir with x MULT orders/lineitem.

    Replicas shift the ORDER key only (o_orderkey*MULT+rep): every
    replica order keeps its own lineitems (join cardinality per order is
    unchanged) while customer/supplier fan-out grows x MULT — facts
    grow, dimensions don't, the standard warehouse growth shape."""
    rep = F.explode(F.sequence(F.lit(0), F.lit(MULT - 1))).alias("rep")

    o = load_table(spark, SF_DIR, "orders")
    o.select("*", rep).withColumn(
        "o_orderkey", F.col("o_orderkey") * MULT + F.col("rep")
    ).drop("rep").write.mode("overwrite").parquet(os.path.join(root, "orders.parquet"))

    l = load_table(spark, SF_DIR, "lineitem")
    l.select("*", rep).withColumn(
        "l_orderkey", F.col("l_orderkey") * MULT + F.col("rep")
    ).drop("rep").write.mode("overwrite").parquet(os.path.join(root, "lineitem.parquet"))

    for t in DIM_TABLES:
        src = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(src):
            os.symlink(src, os.path.join(root, f"{t}.parquet"))
    return root


def join_mix(df) -> dict[str, int]:
    """AQE-final physical join mix (run AFTER an action so AQE is final)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "bhj": plan.count("BroadcastHashJoin"),
        "smj": plan.count("SortMergeJoin"),
        "shj": plan.count("ShuffledHashJoin"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
    }


def run_set(spark, sf_dir: str) -> dict[str, dict]:
    out = {}
    for name in QUERIES:
        fn = REGISTRY[name].spark
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        wall = round(time.time() - t0, 2)
        out[name] = {"sec": wall, "rows": n, "joins": join_mix(df)}
        print(f"\n  {name}: {wall}s rows={n} joins={out[name]['joins']}")
    return out


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    root = tempfile.mkdtemp(prefix="edna_relstress_")
    try:
        print("\nbase run (1x)...")
        base = run_set(spark, SF_DIR)
        print(f"\nbuilding x{MULT} corpus...")
        scaled_dir = build_scaled_dir(spark, root)
        print(f"\nscaled run ({MULT}x)...")
        scaled = run_set(spark, scaled_dir)
        result = {
            "sf_dir": SF_DIR,
            "mult": MULT,
            "base": base,
            "scaled": scaled,
            "ratio": {
                q: round(scaled[q]["sec"] / max(base[q]["sec"], 1e-9), 2)
                for q in QUERIES
            },
        }
        print("\n" + json.dumps(result))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
