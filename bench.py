#!/usr/bin/env python
"""Benchmark runner: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:
    {"metric": "total_query_seconds", "value": N, "unit": "sec",
     "queries": {"q1_pricing_summary": s, ...}, "sf": 0.1}

Each query is forced end-to-end with a noop sink (full physical plan,
including final projections — unlike count(), which lets Spark drop
unused columns).

Per-query time is the MEDIAN OF THREE timed executions after one untimed
warm pass: single-JVM local mode shows multi-x run-to-run swings on
individual queries (JIT compilation of ~60 queries' generated code, GC
pauses, host CPU contention) that have nothing to do with the plan being
measured. Round 2 used best-of-two, which still lied at the tail (the
r2 report showed hll_distinct_orders at 5.74s vs 2.1-3.0s solo); the
warm pass absorbs first-execution JIT/codegen cost and the median of
three interleaved passes is robust to a single GC/contention outlier in
either direction, so per-round deltas reproduce solo within ~20%.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from edna_dbt_library_spark import queries as _q
from edna_dbt_library_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the TPC-H-style relational queries plus one representative
# of each extension-operator family. The LSH entry is the stop-bucket
# capped variant (the documented scale path); the uncapped exact-LSH query
# and near_dup_jaccard produce O(cluster^2) pairs on this synthetic
# shared-vocabulary corpus (~10M pairs at sf0.1) and are covered by the
# correctness gate instead.
BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q12_priority_counts",
    "q13_customer_distribution",
    "q17_small_quantity",
    "q7_nation_volume",
    "q15_top_supplier",
    "q18_large_volume",
    "q22_global_sales",
    "q19_disjunctive_revenue",
    "q4_priority_with_late_ship",
    "q21_waiting_supplier",
    "q2_min_cost_supplier",
    "q8_market_share",
    "q9_product_profit",
    "q11_important_stock",
    "q16_parts_supplier_cnt",
    "q20_promotion_suppliers",
    "incremental_window_agg",
    "watermark_top1",
    "topk_orders_per_priority",
    "merge_upsert_latest",
    "scd2_user_history",
    "sessionize_count",
    "session_windows_native",
    "uuid_v3_customer",
    "hex_roundtrip",
    "ieee754_decode",
    "dedup_exact",
    "hll_distinct_orders",
    "cms_user_freq",
    "histogram_quantiles_price",
    "bloom_semi_join_urgent",
    "heavy_hitter_ngrams",
    "dedup_fingerprint",
    "dedup_minhash_lsh_capped",
    "dedup_minhash_bigram",
    "jaccard_join_pairs",
    "simhash60",
    "text_stats",
    "lang_id_pred",
    "ann_topk_bruteforce",
    "ann_lsh_bucketed",
    "ann_ivf_topk",
    "ann_pq_adc_topk",
    "ann_ivf_pq_topk",
    "dedup_embedding_cosine",
    "top_suppliers_sql",
    "stream_window_counts",
    "multimodal_decode",
    "uuid_v5_events",
    "grouped_theilsen_slope",
    "asof_latest_order",
    "range_attribution",
    "timeseries_fill",
    "dedup_clusters",
    "sample_stratified",
    "domain_mix_sample",
    "pack_sequences",
    "chunk_documents",
    "salted_join_priority",
    "morton_zorder_key",
    "contamination_3gram",
    "corpus_dup_ngrams",
    "repetition_filter",
    "pii_redact_docs",
    "weighted_sample_quality",
    "shuffle_shards_summary",
    "winnow_fingerprints",
    "dedup_lines_docs",
    "embedding_cell_outliers",
    "winnow_overlap_pairs",
    "bm25_topk_docs",
    "lm_cross_entropy_docs",
    "semantic_dedup_embeddings",
    "tfidf_top_terms_docs",
    "profile_orders_columns",
    "url_canonical_docs",
    "bpe_token_counts",
    "train_val_test_split",
    "rollup_region_revenue",
    "setops_customers",
    "ntile_balance_deciles",
    "strip_html_docs",
    "zscore_outlier_events",
    "quantized_embeddings_summary",
    "name_linkage_collapsed",
    "unigram_token_counts",
    "temperature_mix_sample",
    "dup_substring_spans",
]


def sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    registry = _q.all_queries()
    spark = get_spark(app_name="edna-spark-bench")
    # warm the JVM + parquet footers once so per-query times measure the
    # queries, not session startup
    _q.flagship(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    # pass 0 is the untimed warm pass (codegen/JIT + shuffle-file warmup);
    # the next SPARK_GRAFT_BENCH_RUNS (default 3) passes are timed,
    # interleaved across queries so a transient host-load spike hits one
    # sample of many queries, not all samples of one query; the median of
    # the timed passes is reported.
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    samples: dict[str, list[float]] = {name: [] for name in BENCH_QUERIES}
    for attempt in range(runs + 1):
        for name in BENCH_QUERIES:
            spark.sparkContext.setJobDescription(f"bench:{name}:pass{attempt}")
            t0 = time.time()
            registry[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            if attempt > 0:
                samples[name].append(time.time() - t0)
    spark.sparkContext.setJobDescription(None)

    # statistics.median averages the two middle samples for even run
    # counts (sorted(s)[len(s)//2] is the upper-middle, biased high).
    timings = {name: round(statistics.median(s), 3) for name, s in samples.items()}
    out = {
        "metric": "total_query_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_from_dir(SF_DIR),
        "runs_per_query": runs,
        "method": f"median_of_{runs}_after_warm_pass",
    }
    print(json.dumps(out))

    # The per-query map has outgrown the driver's 2000-char tail capture
    # (BENCH_r03.json recorded parsed:null because the head of the long
    # line — including "value" — was cut off; the query names alone now sum
    # to ~1.7k chars, so the complete 93-entry map can NEVER fit).  The
    # r13 summary line fixed the truncation but carried no "queries" at
    # all, so the driver's perf comparison recorded per_query={} /
    # n_common=0 (PERF_r13.json) and fell back to raw host-drifting
    # totals.  Three safeguards now:
    #  1. persist the FULL result to BENCH_FULL.json next to this script
    #     (the driver commits leftover changes, so the artifact survives);
    #  2. the full JSON line above remains the first stdout line;
    #  3. end stdout with a summary line that DOES carry a "queries" map —
    #     the most expensive entries that fit a 1900-byte line budget
    #     (expensive-first, so the per-query data that matters for perf
    #     comparison and core-count scaling survives the tail capture).
    #     "n_queries" is the true total and "queries_omitted" counts the
    #     cheap tail entries that did not fit; the complete map is in
    #     BENCH_FULL.json. The bench itself still times every query and
    #     "value" is the total over ALL of them.
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_FULL.json"), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    summary = {
        "metric": "total_query_seconds",
        "value": out["value"],
        "unit": "sec",
        "sf": out["sf"],
        "n_queries": len(timings),
        "runs_per_query": runs,
        "method": out["method"],
        "detail": "BENCH_FULL.json",
        "queries": {},
        "queries_omitted": 0,
    }
    budget = 1900
    for name in sorted(timings, key=timings.get, reverse=True):
        candidate = dict(summary)
        candidate["queries"] = {**summary["queries"], name: timings[name]}
        candidate["queries_omitted"] = len(timings) - len(candidate["queries"])
        if len(json.dumps(candidate, separators=(",", ":"))) > budget:
            break
        summary = candidate
    summary["queries_omitted"] = len(timings) - len(summary["queries"])
    print(json.dumps(summary, separators=(",", ":")))


if __name__ == "__main__":
    main()
