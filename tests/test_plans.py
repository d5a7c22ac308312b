"""Physical-plan regression tests: the scale properties ARCHITECTURE.md
claims must stay true (pushdown reaches the scan, dimension joins
broadcast, no accidental sort-merge joins or extra shuffles)."""

import re

import pytest

from edna_dbt_library_spark import queries as _qmod

SF = "/root/testdata/sf0.001"


class Q:  # plan tests cover core and extra-registry queries alike
    @staticmethod
    def queries():
        return _qmod.all_queries()


def plan_text(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue() + "\n" + df._jdf.queryExecution().executedPlan().toString()


def test_window_filter_pushes_ts_range(spark):
    """The run-window bounds must reach the parquet scan for row-group
    skipping. Two fixture generations exist: TIMESTAMP(NANOS) parquet
    (loader keeps a raw `_ts_ns` long; bounds push as epoch-nano ints) and
    TIMESTAMP(MICROS) (native TimestampType; bounds push as timestamp
    literals). Either form is a pushed range — no pushed range is a fail."""
    plan = plan_text(Q.queries()["incremental_window_agg"](spark, SF))
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    assert "GreaterThan(ts," in pushed, pushed
    assert "LessThanOrEqual(ts," in pushed, pushed


def test_q5_star_join_broadcasts_all_dimensions(spark):
    plan = plan_text(Q.queries()["q5_region_revenue"](spark, SF))
    # the three explicitly-hinted dims plus whatever AQE further broadcasts
    # at this tiny SF; the invariant is: broadcasts, never sort-merge
    assert re.findall(r"BroadcastHashJoin", plan)
    assert "SortMergeJoin" not in plan


def test_q6_pushes_range_predicates(spark):
    plan = plan_text(Q.queries()["q6_forecast_revenue"](spark, SF))
    pushed = " ".join(re.findall(r"PushedFilters: \[[^\]]*\]", plan))
    assert "GreaterThanOrEqual(l_shipdate" in pushed
    assert "LessThan(l_quantity,24" in pushed


@pytest.mark.parametrize("name", ["q1_pricing_summary", "q3_top_orders", "watermark_top1"])
def test_no_sort_merge_joins_in_headline_queries(spark, name):
    plan = plan_text(Q.queries()[name](spark, SF))
    assert "SortMergeJoin" not in plan


def test_top_suppliers_topk_never_windows_full_data(spark):
    """The global top-10 must plan as TakeOrderedAndProject (per-partition
    top-k + driver merge); the unpartitioned row_number window may only run
    over the ≤10 rows ABOVE that limit — a data-sized single-partition
    WindowExec funnels every supplier through one task at scale."""
    plan = plan_text(Q.queries()["top_suppliers_sql"](spark, SF))
    assert "TakeOrderedAndProject" in plan, plan
    # formatted-plan tree: Window's operator id must be AFTER (above) the
    # TakeOrderedAndProject node, i.e. the window consumes the limited rows
    m_win = re.search(r"\((\d+)\) Window", plan)
    m_top = re.search(r"\((\d+)\) TakeOrderedAndProject", plan)
    assert m_win and m_top
    assert int(m_win.group(1)) > int(m_top.group(1)), plan


def test_frame_planner_has_no_python_udf(spark):
    from edna_dbt_library_spark.operators import attach_fake_media, plan_frame_samples
    from edna_dbt_library_spark.sources.tables import load_table

    media = attach_fake_media(load_table(spark, SF, "documents").limit(5))
    plan = plan_text(plan_frame_samples(media))
    assert "mapinpandas" not in plan.lower().replace(" ", "")
    assert "BatchEvalPython" not in plan


def test_repetition_stats_is_zero_shuffle(spark):
    """The round-3 rewrite made every Gopher repetition signal row-local:
    the physical plan must contain NO shuffle exchange and no Python —
    one scan, Column algebra only."""
    from edna_dbt_library_spark.operators.curation import repetition_filter
    from edna_dbt_library_spark.sources.tables import load_table

    plan = plan_text(repetition_filter(load_table(spark, SF, "documents")))
    assert not re.search(r"(?<!Broadcast)(?<!Reused)Exchange (hash|range|Single)", plan), plan
    assert "BatchEvalPython" not in plan and "mapinpandas" not in plan.lower().replace(" ", "")


def test_contamination_corpus_side_never_shuffles(spark):
    """Decontamination must broadcast the benchmark hashes: the corpus
    side's rows reach the join without a shuffle exchange on the
    corpus-derived gram rows (only the tiny bench distinct may
    exchange)."""
    from edna_dbt_library_spark.operators.curation import contamination_flags
    from edna_dbt_library_spark.sources.tables import load_table

    d = load_table(spark, SF, "documents")
    plan = plan_text(contamination_flags(d.where("doc_id % 10 <> 0"), d.where("doc_id % 10 = 0")))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_bm25_probe_join_broadcasts_and_postings_filter_first(spark):
    """BM25's scoring join must BROADCAST the (query term, idf) probe
    table into the postings side — a shuffle join there would re-shuffle
    the whole tf table per query batch. No SortMergeJoin anywhere."""
    plan = plan_text(Q.queries()["bm25_topk_docs"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_tfidf_shares_single_shuffle_index_build(spark):
    """tf-idf must not add Python operators and must broadcast the
    single-row corpus-stats side rather than shuffling for it."""
    plan = plan_text(Q.queries()["tfidf_top_terms_docs"](spark, SF))
    assert "BatchEvalPython" not in plan
    assert "SortMergeJoin" not in plan, plan


def test_lm_scoring_stays_jvm_side(spark):
    """The LM chain (model joins + nano-nat mean) is pure Column algebra:
    no Python operator may appear, and the broadcast-model variant must
    plan every model join as a broadcast."""
    from edna_dbt_library_spark.operators.retrieval import lm_cross_entropy
    from edna_dbt_library_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents").limit(200)
    plain = plan_text(lm_cross_entropy(docs))
    assert "BatchEvalPython" not in plain and "mapinpandas" not in plain.lower().replace(" ", "")
    bcast = plan_text(lm_cross_entropy(docs, broadcast_model=True))
    assert "SortMergeJoin" not in bcast, bcast


def test_semantic_dedup_pair_join_keys_on_cell(spark):
    """The SemDeDup pairwise stage must be an equi-join on the cell key
    (bucketed self-join), never a cartesian/broadcast-nested-loop over
    the corpus."""
    from edna_dbt_library_spark.operators.similarity import semantic_dedup
    from edna_dbt_library_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    plan = plan_text(semantic_dedup(emb, n_cells=8, iters=1, threshold=0.3))
    assert "CartesianProduct" not in plan, plan


def test_perceptual_pair_chain_joins_signatures_not_bytes(spark):
    """image/audio near-dup: the Arrow hashing pass materializes into
    the banded bucket checkpoint, so the PAIR plan contains no Python
    at all — the self-join runs over the pinned (id, sig, band, bsig)
    frame, never re-decoding the bytes per join side."""
    for name in ("image_phash_pairs", "audio_fp_pairs"):
        plan = plan_text(Q.queries()[name](spark, SF))
        assert "MapInPandas" not in plan, name  # bytes never re-enter
        assert "BatchEvalPython" not in plan, name
        assert "Scan ExistingRDD" in plan, name  # the checkpointed sigs


def test_banded_hamming_band_join_no_smj(spark):
    """The band-bucket self-join must hash-join (band values are tiny
    ints + bit slices); a SortMergeJoin here means the blocking frame
    lost its stats."""
    from edna_dbt_library_spark.operators.dedup import banded_hamming_pairs
    from pyspark.sql import functions as F

    sigs = spark.range(200).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2654435761).alias("sig")
    )
    plan = plan_text(banded_hamming_pairs(sigs, "sig", bits=64, bands=4))
    assert "SortMergeJoin" not in plan


def test_url_bpe_row_scan_side_and_single_arrow(spark):
    """The consolidated url/tokenizer gate row: URL algebra is pure
    codegen over the scan (zero shuffles on that branch); the BPE and
    unigram branches are one Arrow pass each over a literal frame —
    never row-at-a-time Python."""
    plan = Q.queries()["url_bpe_tokens"](spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 2  # bpe_encode + unigram_encode
    assert "BatchEvalPython" not in plan


def test_profile_drift_is_driver_scale_after_profiles(spark):
    """The drift comparison joins two one-row-per-column profiles — no
    Python UDFs; everything beyond the two profile scans is Column
    algebra."""
    plan = plan_text(Q.queries()["profile_drift_orders"](spark, SF))
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


def test_explain_scale_flags_hazards_and_passes_clean_plans(spark):
    from edna_dbt_library_spark.plans import assert_scale_clean, explain_scale
    from edna_dbt_library_spark.sources.tables import load_table

    # clean plan: broadcast star join — no warn findings
    q5 = Q.queries()["q5_region_revenue"](spark, SF)
    codes = {f.code for f in explain_scale(q5) if f.severity == "warn"}
    assert codes == set()
    assert_scale_clean(q5)  # must not raise

    from pyspark.sql import functions as F

    # hazard: an unkeyed cross join of two real tables
    o = load_table(spark, SF, "orders").select("o_orderkey")
    c = load_table(spark, SF, "customer").select("c_custkey")
    cross = o.crossJoin(c).where((F.col("o_orderkey") + F.col("c_custkey")) % 97 == 0)
    found = {f.code for f in explain_scale(cross) if f.severity == "warn"}
    assert found & {"cartesian_product", "nested_loop_join"}
    with pytest.raises(AssertionError, match="scale hazards"):
        assert_scale_clean(cross)

    # hazard: a row-at-a-time Python UDF
    bad_udf = F.udf(lambda s: (s or "").upper())
    udfed = load_table(spark, SF, "documents").select(bad_udf("text").alias("u"))
    assert any(f.code == "python_row_udf" for f in explain_scale(udfed))
    # allow-listing lets a deliberate exception through
    assert_scale_clean(udfed, allow=("python_row_udf",))


def test_explain_scale_flags_global_window_and_sort(spark):
    """r6 linter additions: an unpartitioned Window collapses the frame
    to one task (warn); a global total-order Sort that is not a fused
    top-k is informational. Partitioned windows and limit-fused top-k
    stay clean."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from edna_dbt_library_spark.plans import assert_scale_clean, explain_scale
    from edna_dbt_library_spark.sources.tables import load_table

    o = load_table(spark, SF, "orders")
    w_global = Window.orderBy(F.col("o_totalprice").desc())
    ranked = o.select("o_orderkey", F.row_number().over(w_global).alias("rn"))
    codes = {f.code for f in explain_scale(ranked)}
    assert "global_window" in codes
    with pytest.raises(AssertionError, match="scale hazards"):
        assert_scale_clean(ranked)

    w_part = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    per_key = o.select("o_orderkey", F.row_number().over(w_part).alias("rn"))
    assert "global_window" not in {f.code for f in explain_scale(per_key)}
    assert_scale_clean(per_key)

    total = o.orderBy(F.col("o_totalprice").desc())
    assert "global_sort" in {f.code for f in explain_scale(total)}
    topk = o.orderBy(F.col("o_totalprice").desc()).limit(10)
    assert "global_sort" not in {f.code for f in explain_scale(topk)}


def test_ivf_pq_search_path_is_broadcast_only(spark):
    """IVFADC (r8): the only corpus-sized join is the one-time
    index-build join of codes to their cell (at most one SMJ); the
    SEARCH path — probed-cell candidate selection and the query-LUT
    scoring — must be broadcast joins, and nothing may degenerate to a
    cartesian product."""
    from pyspark.sql import functions as F

    from edna_dbt_library_spark.operators.similarity import ivf_pq_topk
    from edna_dbt_library_spark.sources.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    df = ivf_pq_topk(emb, emb.where(F.col("vec_id") < 5), k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("SortMergeJoin") <= 1, plan  # index build only
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # probes + LUT


def test_bloom_set_probe_word_cut_is_broadcast_semi(spark, tmp_path):
    """The bloom SET probe (delete_matching's file pruning) must cut
    the sidecar scan with a broadcast LEFT SEMI on the probe's needed
    words BEFORE the defensive (file, word) re-aggregation — the
    unfiltered form re-shuffled the whole sidecar per probe (measured
    19s at a 56M-row sidecar, replica_scale_stress)."""
    from pyspark.sql import functions as F

    from edna_dbt_library_spark.sources import TableMeta, Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    rel = wh.relation("s", "t")
    wh.create_as(
        rel,
        spark.range(200).select(F.col("id").alias("k")).repartition(4),
        TableMeta(),
    )
    wh.refresh_bloom_sidecar(rel, ["k"], m_bits=1 << 12, k=5)
    probe = spark.createDataFrame([(3,), (7,)], "k long")
    hits, _live, _indexed = wh._bloom_probe_frame(rel, "k", probe)
    hits.collect()  # AQE finalizes joins at runtime; assert the FINAL plan
    plan = hits._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert re.search(r"BroadcastHashJoin .*LeftSemi", final), final
    assert "SortMergeJoin" not in final
    assert "CartesianProduct" not in final
