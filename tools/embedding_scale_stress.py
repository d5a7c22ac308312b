#!/usr/bin/env python
"""Scale stress for the embedding family: 10x the sf0.1 vectors with an
injected hot cluster, measuring k-means convergence, IVF probe
selectivity under cell skew, and cell_outliers wall time.

Why this exists: the IVF/k-means/outlier chain claims a bounded scale
shape (broadcast centroids, shuffle key-space = n_cells x dims, search
touching ~n_probe/n_cells of the data). Those claims assume cells stay
usefully balanced — but production embedding corpora are SKEWED: dense
regions (boilerplate pages, template screenshots) pack one cell with a
large fraction of all vectors, so a probe landing there scans far more
than n_probe/n_cells. This harness builds that corpus — every sf0.1
vector plus 9 perturbed variants, plus a hot cluster packed around one
point — and records, with wall times next to the dedup numbers in
PLAN_AUDIT.md ("embedding scale stress"):

* k-means convergence: total integer centroid displacement per Lloyd
  pass (how fast the exact-integer training settles, and whether the
  hot cluster captures a centroid);
* the trained cell-size distribution (max / p99 / hot-cell share);
* measured IVF probe selectivity: the fraction of the corpus the
  query set's probed cells actually cover vs the uniform-cell estimate
  n_probe/n_cells;
* end-to-end wall: ivf_topk, brute-force baseline, recall@k of IVF vs
  brute force, and cell_outliers.

Usage: python tools/embedding_scale_stress.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from edna_dbt_library_spark.operators.similarity import (
    KMEANS_SCALE,
    _int_sqdist,
    brute_force_topk,
    cell_outliers,
    ivf_topk,
    kmeans_cells,
    quantize_vec,
)
from edna_dbt_library_spark.session import get_spark
from edna_dbt_library_spark.sources import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_CELLS, N_PROBE, TOP_K = 16, 4, 10
DIMS = 64


def build_corpus(spark):
    """10x the sf0.1 embeddings (each vector + 9 deterministically
    perturbed variants: +rep/1000 on every component keeps the variant in
    the same region) plus a 10,000-vector hot cluster packed around a
    single synthetic point — the dense-region shape that floods one
    k-means cell. Labels: variants keep theirs; the hot cluster is -1."""
    base = load_table(spark, SF_DIR, "embeddings")
    rep = base.crossJoin(spark.range(10).select(F.col("id").alias("rep"))).select(
        (F.col("vec_id") * 100 + F.col("rep")).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x + F.col("rep").cast("float") / F.lit(1000.0)).cast("float")
        ).alias("embedding"),
        F.col("label"),
    )
    # hot cluster: all components ~0.5 with a tiny per-id, per-dim jitter
    # (deterministic arithmetic, no randomness) so vectors are distinct
    # but cosine-packed — one cell should absorb all 10,000 of them.
    hot = spark.range(10_000).select(
        (F.col("id") + 50_000_000).alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIMS - 1)),
            lambda d: (
                F.lit(0.5) + ((F.col("id") * 31 + d * 7) % 97).cast("float") / F.lit(100000.0)
            ).cast("float"),
        ).alias("embedding"),
        F.lit(-1).alias("label"),
    )
    return rep.unionAll(hot)


def centroid_displacement(spark, emb, max_iters: int):
    """Total exact-integer squared-L2 displacement of the centroid set
    per Lloyd pass (pass t vs t-1), by re-training at increasing depths —
    the harness-side convergence trace (kmeans_cells itself stays a pure
    operator with no instrumentation)."""
    rows = []
    prev = None
    for t in range(max_iters + 1):
        t0 = time.time()
        cent = kmeans_cells(emb, N_CELLS, t, KMEANS_SCALE).localCheckpoint(eager=True)
        train_s = round(time.time() - t0, 2)
        if prev is not None:
            moved = (
                prev.alias("p")
                .join(cent.alias("c"), "cid")
                .agg(
                    F.sum(_int_sqdist(F.col("p.cv"), F.col("c.cv"))).alias("disp"),
                    F.sum(
                        F.when(_int_sqdist(F.col("p.cv"), F.col("c.cv")) > 0, 1).otherwise(0)
                    ).alias("cells_moved"),
                )
                .collect()[0]
            )
            rows.append(
                {
                    "pass": t,
                    "sq_displacement": moved["disp"],
                    "cells_moved": moved["cells_moved"],
                    "train_s_cumulative": train_s,
                }
            )
        prev = cent
    return rows, prev


def cell_assignment(emb, cent):
    q = emb.select("vec_id", quantize_vec("embedding").alias("qv"))
    scored = q.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cid", _int_sqdist(F.col("qv"), F.col("cv")).alias("dist")
    )
    return (
        scored.groupBy("vec_id")
        .agg(F.min(F.struct("dist", "cid")).alias("_m"))
        .select("vec_id", F.col("_m.cid").alias("cell"))
    )


def main() -> None:
    spark = get_spark(app_name="embedding-scale-stress")
    emb = build_corpus(spark).localCheckpoint(eager=True)
    n = emb.count()
    out = {"corpus_vectors": n, "sf_dir": SF_DIR, "n_cells": N_CELLS, "n_probe": N_PROBE}

    out["convergence"], cent = centroid_displacement(spark, emb, 4)

    # trained cell-size distribution under the injected skew
    assigned = cell_assignment(emb, cent).localCheckpoint(eager=True)
    sizes = assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("sz"))
    s = sizes.agg(
        F.count(F.lit(1)).alias("cells_used"),
        F.max("sz").alias("max_cell"),
        F.percentile_approx("sz", 0.99).alias("p99_cell"),
    ).collect()[0]
    out["cells"] = {
        "cells_used": s["cells_used"],
        "max_cell": s["max_cell"],
        "p99_cell": s["p99_cell"],
        "max_cell_share": round(s["max_cell"] / n, 4),
    }

    # measured probe selectivity: what fraction of the corpus do the
    # query set's probed cells cover? Uniform estimate is n_probe/n_cells.
    queries = emb.where(F.col("vec_id").isin([0, 100, 31400, 157700, 50_000_001]))
    t0 = time.time()
    ivf = ivf_topk(emb, queries, k=TOP_K, n_cells=N_CELLS, n_probe=N_PROBE, train_iters=2)
    ivf_rows = ivf.collect()
    out["ivf_topk"] = {"sec": round(time.time() - t0, 2), "rows": len(ivf_rows)}

    # replicate ivf_topk's probe pick exactly (n_probe nearest cells per
    # query, ties to smallest cid) rather than inferring cells from the
    # result rows — a probed cell contributing no top-k row is still
    # scanned and must count against selectivity.
    from pyspark.sql import Window

    qd = (
        queries.select("vec_id", quantize_vec("embedding").alias("qv"))
        .crossJoin(F.broadcast(cent))
        .select(
            F.col("vec_id").alias("query_id"),
            "cid",
            _int_sqdist(F.col("qv"), F.col("cv")).alias("dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("dist").asc(), F.col("cid").asc())
    probed = (
        qd.withColumn("__pr", F.row_number().over(w))
        .where(F.col("__pr") <= N_PROBE)
        .select("query_id", F.col("cid").alias("cell"))
        .join(sizes, "cell")
        .groupBy("query_id")
        .agg(F.sum("sz").alias("scanned"))
    )
    sel = probed.agg(
        F.max(F.col("scanned") / n).alias("max_frac"),
        F.avg(F.col("scanned") / n).alias("avg_frac"),
    ).collect()[0]
    out["probe_selectivity"] = {
        "uniform_estimate": round(N_PROBE / N_CELLS, 4),
        "avg_frac_scanned": round(sel["avg_frac"], 4),
        "max_frac_scanned": round(sel["max_frac"], 4),
    }

    # recall@k of IVF vs exact brute force on the same query set
    t0 = time.time()
    bf_rows = brute_force_topk(emb, queries, k=TOP_K).collect()
    out["brute_force"] = {"sec": round(time.time() - t0, 2)}
    bf = {(r["query_id"], r["vec_id"]) for r in bf_rows}
    iv = {(r["query_id"], r["vec_id"]) for r in ivf_rows}
    out["recall_at_k"] = round(len(bf & iv) / max(len(bf), 1), 4)

    t0 = time.time()
    outl = cell_outliers(emb, n_cells=N_CELLS, iters=2, top_k=3).count()
    out["cell_outliers"] = {"sec": round(time.time() - t0, 2), "rows": outl}

    # semantic dedup on the hot-cell corpus: the 10k-vector cell makes
    # the exact within-cell self-join generate ~cell^2/2 candidate pairs
    # (every hot vector is near-identical); max_cell_size bounds it
    from pyspark.sql import functions as FF

    from edna_dbt_library_spark.operators.similarity import semantic_dedup

    for label, cap in (("exact", None), ("cap1000", 1000)):
        t0 = time.time()
        v = semantic_dedup(emb, threshold=0.95, centroids=cent, max_cell_size=cap)
        agg = v.agg(
            FF.count(FF.lit(1)).alias("rows"),
            FF.sum((~FF.col("keep")).cast("int")).alias("killed"),
        ).collect()[0]
        out[f"semantic_dedup_{label}"] = {
            "sec": round(time.time() - t0, 2),
            "rows": agg["rows"],
            "killed": agg["killed"],
        }

    # PQ / IVFADC (r8): train-once codebooks, encode pass, then both ADC
    # search shapes on the same skewed corpus; recall vs the exact
    # brute-force set above, and the compression the codes deliver
    from edna_dbt_library_spark.operators.similarity import (
        ivf_pq_topk,
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
    )

    t0 = time.time()
    cb = pq_codebooks(emb, m=4, n_cells=16, iters=2)
    out["pq_train"] = {"sec": round(time.time() - t0, 2), "codebook_rows": cb.count()}
    t0 = time.time()
    n_codes = pq_encode(emb, cb).count()
    out["pq_encode"] = {
        "sec": round(time.time() - t0, 2),
        "codes": n_codes,
        # 64 float32 dims -> 4 codes (1 byte each at n_cells<=256)
        "bytes_per_vector": {"raw": DIMS * 4, "pq": 4},
    }
    t0 = time.time()
    pq_rows = pq_adc_topk(emb, queries, k=TOP_K, codebooks=cb).collect()
    out["pq_adc_topk"] = {"sec": round(time.time() - t0, 2), "rows": len(pq_rows)}
    pqs = {(r["query_id"], r["vec_id"]) for r in pq_rows}
    out["pq_recall_at_k"] = round(len(bf & pqs) / max(len(bf), 1), 4)
    t0 = time.time()
    ivfpq_rows = ivf_pq_topk(
        emb, queries, k=TOP_K, n_cells=N_CELLS, n_probe=N_PROBE, codebooks=cb
    ).collect()
    out["ivf_pq_topk"] = {"sec": round(time.time() - t0, 2), "rows": len(ivfpq_rows)}
    ips = {(r["query_id"], r["vec_id"]) for r in ivfpq_rows}
    out["ivf_pq_recall_at_k"] = round(len(bf & ips) / max(len(bf), 1), 4)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
