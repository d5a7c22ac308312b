#!/usr/bin/env python
"""Micro-bench for optimization iteration: times a NAMED SUBSET of the
bench queries with bench.py's exact methodology (noop sink, one untimed
warm pass, median of SPARK_GRAFT_BENCH_RUNS=3 interleaved timed passes)
so before/after numbers are comparable per query without paying for the
full 93-query sweep.

Usage:
    python tools/microbench.py q2_min_cost_supplier timeseries_fill ...
    SPARK_GRAFT_BENCH_RUNS=5 python tools/microbench.py ...

Prints one JSON line per run: {"queries": {...}, "value": total}.
This tool is measurement-only — the driver contract lives in bench.py.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from edna_dbt_library_spark import queries as _q
from edna_dbt_library_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: microbench.py <query> [query ...]", file=sys.stderr)
        sys.exit(2)
    registry = _q.all_queries()
    unknown = [n for n in names if n not in registry]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)
    spark = get_spark(app_name="edna-spark-microbench")
    _q.flagship(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    samples: dict[str, list[float]] = {n: [] for n in names}
    for attempt in range(runs + 1):
        for name in names:
            spark.sparkContext.setJobDescription(f"microbench:{name}:pass{attempt}")
            t0 = time.time()
            registry[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            if attempt > 0:
                samples[name].append(time.time() - t0)
    spark.sparkContext.setJobDescription(None)

    timings = {n: round(statistics.median(s), 3) for n, s in samples.items()}
    print(json.dumps({
        "queries": timings,
        "value": round(sum(timings.values()), 3),
        "runs_per_query": runs,
        "samples": {n: [round(x, 3) for x in s] for n, s in samples.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
