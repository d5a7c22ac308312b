#!/usr/bin/env python
"""Scale stress for the retrieval/LM/tokenizer family: a 10x corpus with
universal boilerplate terms, measuring how stop-term posting lists blow
up the BM25 scoring join and how the max_df_frac probe guard bounds it.

Why this exists: BM25's scale claim is "scoring touches only the
postings of the query's terms" — which is vacuous when a query contains
a stop term whose posting list IS the corpus. This harness builds that
corpus (every doc gets a shared boilerplate suffix), probes with a
discriminative query, a stop-term-polluted query, and the guarded
variant, and records postings touched + wall for each, plus bigram-LM
model size/scoring wall and BPE encode throughput at 10x. Results land
in PLAN_AUDIT.md ("retrieval scale stress").

Usage: python tools/retrieval_scale_stress.py   (prints one JSON line)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from edna_dbt_library_spark.operators.retrieval import (
    bm25_topk,
    doc_term_freqs,
    lm_cross_entropy,
)
from edna_dbt_library_spark.operators.tokenizer import bpe_encode, train_bpe
from edna_dbt_library_spark.session import get_spark
from edna_dbt_library_spark.sources import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BOILER = "terms of service privacy policy all rights reserved cookie notice"


def build_corpus(spark):
    """10x the sf0.1 documents, every copy suffixed with a universal
    boilerplate sentence — the web-crawl shape where a handful of terms
    appear in ~100% of documents."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    return docs.crossJoin(spark.range(10).select(F.col("id").alias("rep"))).select(
        (F.col("doc_id") * 10 + F.col("rep")).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" " + BOILER)).alias("text"),
    )


def timed(fn):
    t0 = time.time()
    out = fn()
    return out, round(time.time() - t0, 2)


def main() -> None:
    spark = get_spark(app_name="retrieval-scale-stress")
    docs = build_corpus(spark).localCheckpoint(eager=True)
    n = docs.count()
    out = {"corpus_docs": n, "sf_dir": SF_DIR}

    tfdl = doc_term_freqs(docs).localCheckpoint(eager=True)
    out["postings_rows"] = tfdl.count()

    def postings_touched(qtext, max_df_frac=None):
        qterms = [w for w in qtext.split()]
        df_t = tfdl.where(F.col("term").isin(qterms))
        if max_df_frac is not None:
            keep = (
                df_t.groupBy("term")
                .agg(F.count(F.lit(1)).alias("df"))
                .where(F.col("df") / n <= max_df_frac)
            )
            df_t = df_t.join(keep.select("term"), "term")
        return df_t.count()

    probes = spark.createDataFrame(
        [
            ("disc", "spark window agg"),
            ("stop", "spark window agg terms of service cookie"),
        ],
        "query_id string, text string",
    )
    for qid, qtext, guard in (
        ("disc", "spark window agg", None),
        ("stop", "spark window agg terms of service cookie", None),
        ("stop_guarded", "spark window agg terms of service cookie", 0.9),
    ):
        q = spark.createDataFrame([(qid, qtext)], "query_id string, text string")
        rows, sec = timed(
            lambda: bm25_topk(docs, q, k=10, max_df_frac=guard).collect()
        )
        out[f"bm25_{qid}"] = {
            "sec": sec,
            "rows": len(rows),
            "postings_touched": postings_touched(qtext, guard),
        }

    # guarded vs unguarded stop query must agree on the top docs ranked
    # by the discriminative terms (the stop terms add near-zero score)
    g = bm25_topk(docs, probes.where(F.col("query_id") == "stop"), k=10, max_df_frac=0.9)
    u = bm25_topk(docs, probes.where(F.col("query_id") == "stop"), k=10)
    out["guarded_topk_overlap"] = len(
        {r["doc_id"] for r in g.collect()} & {r["doc_id"] for r in u.collect()}
    )

    # persisted inverted index: build once, then the search must open
    # only the candidate files of its probe terms (bloom set-probe),
    # never the corpus and never the whole postings table
    import shutil
    import tempfile

    from edna_dbt_library_spark.operators.retrieval import (
        bm25_topk_indexed,
        build_bm25_index,
    )
    from edna_dbt_library_spark.sources.warehouse import Warehouse

    root = tempfile.mkdtemp(prefix="edna_ixstress_")
    try:
        wh = Warehouse(spark, root)
        idx = wh.relation("scratch", "bm25ix")
        _, build_sec = timed(lambda: build_bm25_index(wh, idx, docs, n_files=64))
        wh.BLOOM_PROBE_MIN_FILES = 1
        live = len(wh._live_data_files(idx))
        q = spark.createDataFrame(
            [("disc", "spark window agg")], "query_id string, text string"
        )
        terms = spark.createDataFrame(
            [(w,) for w in "spark window agg".split()], "term string"
        )
        cand = wh.bloom_candidate_files(idx, "term", terms)
        rows_i, search_sec = timed(
            lambda: bm25_topk_indexed(wh, idx, q, k=10).collect()
        )
        rows_p, percall_sec = timed(lambda: bm25_topk(docs, q, k=10).collect())
        out["bm25_indexed"] = {
            "build_sec": build_sec,
            "index_files": live,
            "candidate_files": len(cand) if cand is not None else live,
            "search_sec": search_sec,
            "percall_sec": percall_sec,
            "identical_topk": sorted(map(tuple, rows_i))
            == sorted(map(tuple, rows_p)),
        }

        # LSM streaming window: the per-trigger upsert probe against the
        # term-clustered MAIN scans the whole key column (the rejected
        # design); against the bounded DELTA it costs O(delta) — measure
        # both, then the LSM search and the segment fold
        from edna_dbt_library_spark.operators.retrieval import (
            _bm25_delta_rel,
            compact_bm25_index,
            refresh_bm25_stats,
        )
        from edna_dbt_library_spark.sources.warehouse import TableMeta

        batch = spark.range(2000).select(
            (F.col("id") + 10_000_000).alias("doc_id"),
            F.concat(
                F.lit("streamed document body spark window agg row "),
                F.col("id").cast("string"),
            ).alias("text"),
        )
        postings = doc_term_freqs(batch).localCheckpoint(eager=True)
        _, main_upsert_sec = timed(
            lambda: wh.upsert_matching(idx, postings, ["doc_id"])
        )
        delta = _bm25_delta_rel(wh, idx)
        wh.create_as(delta, postings.limit(0), TableMeta())
        _, delta_upsert_sec = timed(
            lambda: wh.upsert_matching(delta, postings, ["doc_id"])
        )
        refresh_bm25_stats(wh, idx)
        union_docs = docs.unionByName(batch)
        rows_l, lsm_sec = timed(
            lambda: bm25_topk_indexed(wh, idx, q, k=10).collect()
        )
        rows_u = bm25_topk(union_docs, q, k=10).collect()
        _, compact_sec = timed(lambda: compact_bm25_index(wh, idx, n_files=64))
        rows_c, postc_sec = timed(
            lambda: bm25_topk_indexed(wh, idx, q, k=10).collect()
        )
        out["bm25_lsm"] = {
            "batch_docs": 2000,
            "main_upsert_sec": main_upsert_sec,
            "delta_upsert_sec": delta_upsert_sec,
            "lsm_search_sec": lsm_sec,
            "compact_sec": compact_sec,
            "search_after_compact_sec": postc_sec,
            "identical_topk": sorted(map(tuple, rows_l))
            == sorted(map(tuple, rows_u))
            == sorted(map(tuple, rows_c)),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)

    _, lm_sec = timed(lambda: lm_cross_entropy(docs).count())
    out["lm_cross_entropy"] = {"sec": lm_sec}

    merges, train_sec = timed(lambda: train_bpe(docs, num_merges=256))
    toks, enc_sec = timed(
        lambda: bpe_encode(docs, merges).agg(F.sum("n_tokens")).collect()[0][0]
    )
    out["bpe"] = {
        "merges": len(merges),
        "train_sec": train_sec,
        "encode_sec": enc_sec,
        "tokens": toks,
        "tokens_per_sec": int(toks / enc_sec) if enc_sec else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
