#!/usr/bin/env python
"""Scale stress for the dedup family: a near-dup-heavy corpus (sf0.5-ish)
with an injected boilerplate cluster, measuring how the LSH stop-bucket
cap bounds candidate-pair growth.

Why this exists: the capped-LSH path (lsh_candidate_pairs
max_bucket_size) is the documented 100 TB answer to O(bucket^2) pair
blowup from boilerplate clusters. This harness builds the pathological
corpus the cap is for — every doc has 5 near-identical variants, plus a
2,000-doc boilerplate family with only 3 distinct cores — and records
the bucket-size distribution plus pairs/runtime for uncapped vs capped
runs and the downstream connected-components clustering. Results are
summarized in PLAN_AUDIT.md ("dedup scale stress").

Usage: python tools/dedup_scale_stress.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from edna_dbt_library_spark.operators.dedup import (
    duplicate_clusters,
    lsh_candidate_pairs,
    minhash_signatures,
)
from edna_dbt_library_spark.session import get_spark
from edna_dbt_library_spark.sources import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MINHASH_N, BANDS = 8, 4


def build_corpus(spark):
    """~5x the sf0.1 documents table (each doc + 4 near-dup variants with
    a distinct trailing token) + a 2,000-doc boilerplate cluster sharing
    3 distinct cores — the bucket-flooding shape the cap exists for."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    rep = docs.crossJoin(spark.range(5).select(F.col("id").alias("rep"))).select(
        (F.col("doc_id") * 10 + F.col("rep")).alias("doc_id"),
        F.when(F.col("rep") == 0, F.col("text"))
        .otherwise(F.concat(F.col("text"), F.lit(" variant"), F.col("rep").cast("string")))
        .alias("text"),
    )
    base = (
        "terms of service boilerplate repeated across every crawled page "
        "please review the binding arbitration clause and the limitation "
        "of liability section before continuing to use this website core"
    )
    boiler = spark.range(2000).select(
        (F.col("id") + 10_000_000).alias("doc_id"),
        F.concat(
            F.lit(base),
            (F.col("id") % 3).cast("string"),
            F.lit(" page"),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    return rep.unionAll(boiler)


def bucket_stats(docs) -> dict:
    rows_per_band = MINHASH_N // BANDS
    sig = minhash_signatures(docs, MINHASH_N)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "_", *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias("sig"),
        )
        for b in range(BANDS)
    ]
    sizes = (
        sig.select(F.explode(F.array(*band_cols)).alias("bk"))
        .groupBy("bk.band", "bk.sig")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    agg = sizes.agg(
        F.count(F.lit(1)).alias("buckets"),
        F.max("n").alias("max_size"),
        F.percentile_approx("n", 0.99).alias("p99_size"),
        F.sum(F.when(F.col("n") > 64, 1).otherwise(0)).alias("n_gt_64"),
        F.sum(F.when(F.col("n") > 256, 1).otherwise(0)).alias("n_gt_256"),
        # the pair bound each bucket contributes: n*(n-1)/2
        F.sum(F.col("n") * (F.col("n") - 1) / 2).cast("long").alias("pair_bound"),
        F.sum(
            F.when(F.col("n") <= 64, F.col("n") * (F.col("n") - 1) / 2).otherwise(0)
        ).cast("long").alias("pair_bound_cap64"),
    ).collect()[0]
    return {k: agg[k] for k in agg.asDict()}


def timed_pairs(docs, cap):
    t0 = time.time()
    n = lsh_candidate_pairs(docs, MINHASH_N, BANDS, max_bucket_size=cap).count()
    return {"pairs": n, "sec": round(time.time() - t0, 2)}


def main() -> None:
    spark = get_spark(app_name="dedup-scale-stress")
    docs = build_corpus(spark).localCheckpoint(eager=True)
    out = {"corpus_docs": docs.count(), "sf_dir": SF_DIR, "buckets": bucket_stats(docs)}
    out["uncapped"] = timed_pairs(docs, None)
    out["cap256"] = timed_pairs(docs, 256)
    out["cap64"] = timed_pairs(docs, 64)
    t0 = time.time()
    clusters = duplicate_clusters(lsh_candidate_pairs(docs, MINHASH_N, BANDS, max_bucket_size=64))
    agg = clusters.agg(
        F.count(F.lit(1)).alias("docs_in_clusters"),
        F.countDistinct("cluster_id").alias("clusters"),
    ).collect()[0]
    out["clusters_cap64"] = {
        "docs_in_clusters": agg["docs_in_clusters"],
        "clusters": agg["clusters"],
        "sec": round(time.time() - t0, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
