#!/usr/bin/env python
"""Scale stress for the graph family: exact-integer PageRank
(operators/graph.pagerank_int) on the sf0.1 purchase graph and a x10
replica-grown version of it.

Growth shape: the bipartite customer<->supplier edge list is replicated
into MULT disjoint copies by suffixing both endpoints (_r0.._r9) — node
and edge counts grow x MULT while every node keeps its original degree,
the shape of onboarding 10 independent markets. Recorded per scale:

* total + per-iteration wall for the 8-round rank loop,
* per-stage shuffle write bytes from the local REST API (the
  contributions->dst aggregation is the ONE intended shuffle per round),
* every round's AQE-final plan (via pagerank_int's plan_probe): the
  rank and out-degree joins must stay BroadcastHashJoin (node-sized
  build sides) and the plan must contain ZERO SortMergeJoin — an edge
  re-shuffle or a rank join falling back to SMJ is exactly the
  100 TB scale-killer this harness exists to flag.

Results are summarized in PLAN_AUDIT.md ("pagerank scale stress").

Usage: python tools/pagerank_scale_stress.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from edna_dbt_library_spark.operators.graph import pagerank_int
from edna_dbt_library_spark.session import get_spark
from edna_dbt_library_spark.sources import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULT = int(os.environ.get("SPARK_GRAFT_STRESS_MULT", "10"))
ITERS = 8


def purchase_edges(spark, sf_dir: str):
    """Same derivation as the purchase_graph_pagerank scored query:
    distinct customer<->supplier pairs from order lines, both
    directions."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    pairs = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("cust"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("supp"),
        )
        .distinct()
    )
    return pairs.select(F.col("cust").alias("src"), F.col("supp").alias("dst")).unionAll(
        pairs.select(F.col("supp").alias("src"), F.col("cust").alias("dst"))
    )


def replicate(edges, mult: int):
    rep = F.explode(F.sequence(F.lit(0), F.lit(mult - 1))).alias("rep")
    tagged = edges.select("src", "dst", rep)
    sfx = F.concat(F.lit("_r"), F.col("rep").cast("string"))
    return tagged.select(
        F.concat(F.col("src"), sfx).alias("src"),
        F.concat(F.col("dst"), sfx).alias("dst"),
    )


def shuffle_write_bytes(spark) -> int:
    """Sum of shuffle write bytes over all completed stages (local REST)."""
    url = spark.sparkContext.uiWebUrl
    if not url:
        return -1
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(f"{url}/api/v1/applications/{app}/stages") as r:
            stages = json.loads(r.read())
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return -1


def run(spark, edges, label: str) -> dict:
    e = edges.localCheckpoint(eager=True)  # exclude edge-derivation cost
    n_edges = e.count()
    sw0 = shuffle_write_bytes(spark)
    probe: list[str] = []
    t0 = time.time()
    ranks = pagerank_int(e, iters=ITERS, plan_probe=probe)
    n_nodes = ranks.count()
    wall = time.time() - t0
    sw1 = shuffle_write_bytes(spark)

    def final_plan(p: str) -> str:
        # AQE dumps "== Final Plan ==" then "== Initial Plan =="; only
        # the final section is what actually ran
        p = p.split("== Initial Plan ==")[0]
        return p.split("== Final Plan ==")[-1]

    finals = [final_plan(p) for p in probe]
    smj = sum(p.count("SortMergeJoin") for p in finals)
    bhj = sum(p.count("BroadcastHashJoin") for p in finals)
    shuffles = [p.count("Exchange hashpartitioning") for p in finals]
    # the rank-update round: rank&deg joins broadcast, zero sort-merge,
    # and exactly ONE data shuffle (contributions grouped by dst) — an
    # edge re-shuffle would show as a second hashpartitioning exchange
    assert smj == 0, f"{label}: SortMergeJoin in a rank round's final plan"
    assert bhj >= 3 * ITERS, f"{label}: rank joins not broadcast ({bhj}/{3 * ITERS})"
    assert all(s == 1 for s in shuffles), f"{label}: per-round shuffles {shuffles} != 1"
    out = {
        "edges": n_edges,
        "nodes": n_nodes,
        "wall_s": round(wall, 2),
        "per_iter_s": round(wall / ITERS, 3),
        "shuffle_write_mb": round((sw1 - sw0) / 1e6, 1) if sw0 >= 0 <= sw1 else None,
        "smj_rounds": smj,
        "bhj_rounds": bhj,
        "shuffles_per_round": shuffles[0],
    }
    print(f"\n  {label}: {json.dumps(out)}")
    return out


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="pagerank-stress",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "true"},  # REST API for shuffle bytes
    )
    base_edges = purchase_edges(spark, SF_DIR)
    print("\nbase run (1x)...")
    base = run(spark, base_edges, "1x")
    print(f"\nscaled run ({MULT}x)...")
    scaled = run(spark, replicate(base_edges, MULT), f"{MULT}x")
    result = {
        "sf_dir": SF_DIR,
        "mult": MULT,
        "iters": ITERS,
        "base": base,
        "scaled": scaled,
        "wall_ratio": round(scaled["wall_s"] / max(base["wall_s"], 1e-9), 2),
        "edge_ratio": round(scaled["edges"] / max(base["edges"], 1), 2),
    }
    print("\n" + json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
