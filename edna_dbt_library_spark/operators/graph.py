"""Graph centrality over relational data: exact-integer PageRank.

Relational corpora hide graphs — customer↔supplier purchase networks,
URL→URL link graphs in a crawl, user↔item interactions — and ranking
their nodes (importance weighting for curation, fraud triage, crawl
prioritization) is a first-class pipeline step. This is the iterative
companion of dedup.duplicate_clusters (label propagation): a fixed
number of sparse matrix-vector rounds expressed as join+groupBy.

Determinism contract (the kmeans_cells playbook): ranks live in exact
INTEGER units of ``1/scale`` and every update is
``rank' = ((den-num)*scale) // den + (num * incoming) // den`` with
nonnegative integer floor-division (Spark ``div`` / DuckDB ``//`` —
never float ``/``, whose double rounding can land one above the exact
floor on large operands) — bit-identical on any engine,
partitioning, or cluster size, so a DuckDB oracle can replay the whole
iteration unrolled and the driver hash-gates the exact ranks. Dangling
mass (nodes with no out-edges) is DROPPED, the simple deterministic
choice; build reverse edges when you want it conserved (the bipartite
query in queries.py does exactly that).

Scale shape per iteration: one shuffle — contributions group by dst;
out-degrees are computed once and joined to the rank vector (ranks and
degrees are node-sized, far smaller than the edge list, and the edge
list itself is re-scanned, never re-shuffled, when it is the big side).
Ranks are localCheckpoint'd per round to cut the re-execution lineage,
mirroring duplicate_clusters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGERANK_SCALE = 1_000_000


def pagerank_int(
    edges: DataFrame,
    iters: int = 10,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = PAGERANK_SCALE,
    src_col: str = "src",
    dst_col: str = "dst",
    broadcast_nodes: bool = True,
    plan_probe: list | None = None,
) -> DataFrame:
    """PageRank over an edge list, exact-integer semantics: returns
    (node, rank) with rank in integer ``1/scale`` units after ``iters``
    rounds from a uniform ``scale`` start. Duplicate edges count once
    (the edge list is distinct'd); every arithmetic step is nonnegative
    integer floor-division, so results are engine- and
    partitioning-exact.

    ``broadcast_nodes`` (default True) pins explicit broadcast hints on
    the node-sized sides (ranks, out-degrees, per-round incoming sums).
    Without the hints AQE plans SortMergeJoin first and only converts
    to broadcast at runtime — by which point the EDGE LIST has already
    been shuffle-written every round (ENSURE_REQUIREMENTS exchange on
    src; measured by tools/pagerank_scale_stress.py). With them the
    per-round plan has exactly ONE shuffle: contributions grouped by
    dst. The assumption is ranks fit in executor memory (node count up
    to ~10^8 at ~20 B/row); for larger graphs pass False and accept the
    edge shuffle — that regime wants bucketed edges anyway.

    ``plan_probe``, when a list, receives each round's AQE-final
    physical plan string (captured after the round's eager checkpoint
    materializes it) — the scale-stress harness uses it to assert the
    rank/degree joins stay broadcast (node-sized) and the edge list is
    never re-shuffled, with zero effect on the computation."""
    # pin the (possibly expensive) edge derivation ONCE: every rank
    # round re-scans e, and without the pin its whole upstream lineage
    # (joins, distinct) would re-execute per round per action —
    # measured 36.6s -> 11.3s for 8 rounds on the sf0.1 purchase graph
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint(
        eager=True
    )
    base = (damping_den - damping_num) * scale // damping_den

    hint = F.broadcast if broadcast_nodes else (lambda df: df)
    ranks = nodes.select("node", F.lit(int(scale)).cast("long").alias("rank"))
    for _ in range(iters):
        contrib = (
            e.join(hint(ranks.withColumnRenamed("node", "src")), "src")
            .join(hint(outdeg), "src")
            .select("dst", F.expr("rank div deg").alias("c"))  # EXACT integral div
        )
        incoming = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        updated = nodes.join(hint(incoming), nodes.node == incoming.dst, "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_num} * coalesce(s, 0L)) div {damping_den}")
            ).cast("long").alias("rank"),
        )
        ranks = updated.localCheckpoint(eager=True)
        if plan_probe is not None:
            plan_probe.append(updated._jdf.queryExecution().executedPlan().toString())
    return ranks
