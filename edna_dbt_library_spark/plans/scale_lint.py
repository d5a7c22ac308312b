"""Plan scale-linter: the repo's "would this survive 100×?" audit
(tools/plan_audit.py, tests/test_plans.py) packaged as a library API a
user can run on THEIR DataFrame before launching a 1000-executor job.

``explain_scale(df)`` inspects the optimized physical plan and returns
typed findings for the hazards that actually kill jobs at 100 TB:

* ``cartesian_product`` — a CartesianProduct/BroadcastNestedLoopJoin
  that isn't a deliberate broadcast-tiny-side pattern.
* ``python_row_udf`` — BatchEvalPython in the plan: row-at-a-time
  Python on the hot path (Arrow-batched mapInPandas is NOT flagged).
* ``sort_merge_join`` — informational: fine for fact×fact, a missed
  broadcast for a dimension join.
* ``no_pushed_filter`` — a parquet scan with WHERE clauses upstream
  but no non-trivial pushed filter: the filter runs after full IO.
* ``global_window`` — a Window fed by Exchange SinglePartition: the
  whole input collapses to one task (unpartitioned window).
* ``global_sort`` — informational: a global total-order Sort that is
  not a fused top-k (TakeOrderedAndProject).
* ``exchange_count`` — informational shuffle tally.

Heuristics over plan text, deliberately conservative: findings are
advisory (severity "warn"/"info"), never exceptions — the caller
decides. The repo's own queries keep these invariants under pytest
plan assertions; this surfaces the same checks for user plans.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class ScaleFinding:
    code: str
    severity: str  # "warn" | "info"
    detail: str


def _plan_text(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def explain_scale(df: DataFrame) -> list[ScaleFinding]:
    """Advisory scale findings for a DataFrame's physical plan."""
    plan = _plan_text(df)
    out: list[ScaleFinding] = []

    ncart = plan.count("CartesianProduct")
    if ncart:
        out.append(
            ScaleFinding(
                "cartesian_product",
                "warn",
                f"{ncart} CartesianProduct node(s): O(|L|x|R|) pairs — "
                "add an equi-join key, block/bucket the pairing, or "
                "broadcast a provably tiny side",
            )
        )
    nbnl = plan.count("BroadcastNestedLoopJoin")
    if nbnl:
        out.append(
            ScaleFinding(
                "nested_loop_join",
                "warn",
                f"{nbnl} BroadcastNestedLoopJoin node(s): every left row "
                "scans the broadcast side — fine only when that side is "
                "tiny AND the predicate is selective",
            )
        )
    nudf = plan.count("BatchEvalPython")
    if nudf:
        out.append(
            ScaleFinding(
                "python_row_udf",
                "warn",
                f"{nudf} BatchEvalPython node(s): row-at-a-time Python on "
                "the hot path — rewrite as Column expressions or an "
                "Arrow-batched pandas UDF (10-100x)",
            )
        )
    nsmj = plan.count("SortMergeJoin")
    if nsmj:
        out.append(
            ScaleFinding(
                "sort_merge_join",
                "info",
                f"{nsmj} SortMergeJoin node(s): correct for fact x fact; "
                "a missed broadcast if one side is dimension-sized "
                "(F.broadcast, or raise autoBroadcastJoinThreshold)",
            )
        )
    # scans that receive no non-trivial pushdown while the plan filters
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    if pushed and ("Filter" in plan):
        nontrivial = sum(
            1 for p in pushed if re.search(r"(EqualTo|GreaterThan|LessThan|In\()", p)
        )
        if nontrivial == 0:
            out.append(
                ScaleFinding(
                    "no_pushed_filter",
                    "info",
                    f"{len(pushed)} parquet scan(s) with filters in the plan "
                    "but none pushed to the scan: predicates may be "
                    "non-pushable expressions (casts, UDF-wrapped columns) — "
                    "filter on raw columns where possible",
                )
            )
    # a Window fed by Exchange SinglePartition = unpartitioned window
    # over the WHOLE frame: one task sorts and scans everything — the
    # classic 100 TB killer (fine for a report over a pre-aggregated
    # frame, fatal on a corpus-sized one)
    if re.search(r"Window .*\n(?:[^\n]*\n){0,3}?[^\n]*Exchange SinglePartition", plan):
        out.append(
            ScaleFinding(
                "global_window",
                "warn",
                "Window over Exchange SinglePartition: the whole input "
                "collapses to ONE task for an unpartitioned window — add "
                "partitionBy, or use a sketch/top-k form "
                "(histogram_quantiles, TakeOrderedAndProject)",
            )
        )
    # global total-order Sort that isn't a top-k (TakeOrderedAndProject):
    # a full range-shuffle + total sort of the frame
    nsort = len(re.findall(r"Sort \[[^\]]*\], true", plan))
    if nsort and "TakeOrderedAndProject" not in plan:
        out.append(
            ScaleFinding(
                "global_sort",
                "info",
                f"{nsort} global Sort(s) without TakeOrderedAndProject: "
                "total ordering range-shuffles the whole frame — use "
                "limit-fused top-k, sortWithinPartitions, or drop the "
                "ordering (writers don't need it)",
            )
        )
    nexch = len(
        re.findall(r"(?<!Broadcast)(?<!Reused)Exchange (hash|range|Single)", plan)
    )
    out.append(
        ScaleFinding(
            "exchange_count",
            "info",
            f"{nexch} shuffle Exchange(s): each is a full materialization "
            "of its input — verify every one is algorithmically required",
        )
    )
    return out


def assert_scale_clean(df: DataFrame, allow: tuple[str, ...] = ()) -> None:
    """Raise AssertionError when any "warn"-severity finding (not in
    ``allow``) is present — the CI-gate form of :func:`explain_scale`."""
    bad = [
        f for f in explain_scale(df) if f.severity == "warn" and f.code not in allow
    ]
    if bad:
        lines = "\n  ".join(f"{f.code}: {f.detail}" for f in bad)
        raise AssertionError(f"plan has scale hazards:\n  {lines}")
