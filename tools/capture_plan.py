#!/usr/bin/env python
"""Capture .explain("formatted") for named queries into plans/$SPARK_GRAFT_PLAN_ROUND/ (default r14).

Usage:
    python tools/capture_plan.py before q2_min_cost_supplier [more ...]
    python tools/capture_plan.py after  q2_min_cost_supplier [more ...]

Writes plans/<round>/<query>_<tag>.txt. Uses sf0.1 (the bench SF) so plan
shapes (broadcast choices, AQE thresholds) match what the bench times.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from edna_dbt_library_spark import queries as _q
from edna_dbt_library_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r14"))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if tag not in ("before", "after") or not names:
        print("usage: capture_plan.py before|after <query> [query ...]", file=sys.stderr)
        sys.exit(2)
    os.makedirs(OUT_DIR, exist_ok=True)
    registry = _q.all_queries()
    spark = get_spark(app_name="edna-spark-plancap")
    for name in names:
        df = registry[name](spark, SF_DIR)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
