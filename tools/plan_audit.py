#!/usr/bin/env python
"""Physical-plan audit over every registered query: join strategies,
shuffle counts, scan pushdown. Writes PLAN_AUDIT.md.

This is the 'would it survive 100x' check (ARCHITECTURE.md): dimension
joins must broadcast, filters must reach the parquet scan, and shuffle
counts should match what the algorithm inherently needs.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.01")


def main() -> None:
    import __spark_entry__ as entrymod
    from edna_dbt_library_spark.session import get_spark

    spark = get_spark(app_name="plan-audit", master="local[8]", shuffle_partitions=8)
    lines = [
        "# PLAN_AUDIT — physical plans of every registered query",
        "",
        f"Scale factor dir: `{SF_DIR}`. Columns: BHJ = BroadcastHashJoin,",
        "SMJ = SortMergeJoin, Exch = Exchange (shuffle), push = scans with a",
        "non-trivial pushed filter (beyond IsNotNull).",
        "",
        "| query | BHJ | SMJ | Exch | push | notes |",
        "|---|---|---|---|---|---|",
    ]
    from edna_dbt_library_spark import queries as qmod

    audited = {**qmod.queries(), **qmod.extra_queries()}
    core = set(qmod.CORE_ORDER)
    for name, fn in audited.items():
        try:
            df = fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            lines.append(f"| {name} | - | - | - | - | ERROR: {str(e)[:60]} |")
            continue
        bhj = plan.count("BroadcastHashJoin")
        smj = plan.count("SortMergeJoin")
        # true shuffles only: "Exchange hashpartitioning/rangepartitioning/
        # SinglePartition", not BroadcastExchange / ReusedExchange
        exch = len(re.findall(r"(?<!Broadcast)(?<!Reused)Exchange (hash|range|Single)", plan))
        pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
        nontrivial = sum(
            1 for p in pushed if re.search(r"(EqualTo|GreaterThan|LessThan|In\()", p)
        )
        notes = []
        if "InMemoryTableScan" in plan or "LocalTableScan" in plan and "Scan parquet" not in plan:
            notes.append("materialized input")
        if "mapinpandas" in plan.lower() or "FlatMapGroupsInPandas" in plan:
            notes.append("arrow-batched python")
        if name not in core:
            notes.append("extra")
        lines.append(
            f"| {name} | {bhj} | {smj} | {exch} | {nontrivial}/{len(pushed)} | {', '.join(notes)} |"
        )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLAN_AUDIT.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
