"""Score-window insurance: the driver-scored consolidated queries must
equal the composition of their granular counterparts row-for-row, and the
fused single-scan production path must equal the composed scored path on
the FULL sf0.01 corpus.

The consolidated builders currently compose the granular REGISTRY entries,
so these tests are tautology-adjacent today — their value is the contract:
a future edit that rewrites a consolidated builder (or a granular one)
cannot silently diverge the scored row from the granular queries it
certifies, nor the production fused plan from the scored row."""

from pyspark.sql import functions as F

from edna_dbt_library_spark import queries as qmod

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_curation_quality_equals_granular_composition(spark):
    reg = qmod.all_queries()
    scored = reg["curation_quality"](spark, SF)

    rep = reg["repetition_filter"](spark, SF).withColumnRenamed("keep", "keep_repetition")
    pii = reg["pii_redact_docs"](spark, SF)
    tq = reg["text_quality_langid"](spark, SF).select("doc_id", "pred_lang", "quality")
    ld = reg["dedup_lines_docs"](spark, SF).select(
        "doc_id", "n_lines", F.col("n_kept").alias("n_kept_lines"), "text_deduped"
    )
    composed = (
        rep.join(pii, "doc_id")
        .join(tq, "doc_id")
        .join(ld, "doc_id", "left")
        .withColumn("n_lines", F.coalesce("n_lines", F.lit(0).cast("bigint")))
        .withColumn("n_kept_lines", F.coalesce("n_kept_lines", F.lit(0).cast("bigint")))
        .withColumn("text_deduped", F.coalesce("text_deduped", F.lit("")))
        .select(*scored.columns)
    )
    assert sorted(scored.columns) == sorted(
        set(rep.columns) | set(pii.columns) | {"pred_lang", "quality"}
        | {"n_lines", "n_kept_lines", "text_deduped"}
    )
    assert _rows(scored) == _rows(composed)


def test_near_dup_pairs_equals_granular_composition(spark):
    reg = qmod.all_queries()
    scored = reg["near_dup_pairs"](spark, SF)

    parts = []
    for method, name, score_col in [
        ("minhash_jaccard", "near_dup_jaccard", "jaccard"),
        ("simhash_hamming", "simhash_near_pairs", "hamming"),
        ("winnow_passage", "winnow_overlap_pairs", "n_shared"),
        ("edit_distance", "name_linkage_pairs", "distance"),
        ("allpairs_exact", "jaccard_join_pairs", "jacc_permille"),
    ]:
        parts.append(
            reg[name](spark, SF).select(
                F.lit(method).alias("method"),
                "doc_a",
                "doc_b",
                F.col(score_col).cast("double").alias("score"),
            )
        )
    composed = parts[0]
    for p in parts[1:]:
        composed = composed.unionAll(p)
    assert _rows(scored) == _rows(composed.select(*scored.columns))
    assert {r[0] for r in _rows(scored.select("method").distinct())} >= {
        "minhash_jaccard", "simhash_hamming", "winnow_passage", "edit_distance",
        "allpairs_exact",
    }


def test_uuid_deterministic_ids_equals_granular_composition(spark):
    reg = qmod.all_queries()
    scored = reg["uuid_deterministic_ids"](spark, SF)

    v3 = reg["uuid_v3_customer"](spark, SF).select(
        F.lit("v3_customer").alias("src"),
        F.col("c_custkey").cast("bigint").alias("key_num"),
        F.lit("").alias("key_str"),
        F.col("correlation_id").alias("uuid_a"),
        F.lit("").alias("uuid_b"),
    )
    v5 = reg["uuid_v5_events"](spark, SF).select(
        F.lit("v5_events").alias("src"),
        F.col("user_bucket").cast("bigint").alias("key_num"),
        F.col("event_type").alias("key_str"),
        F.col("user_bucket_uuid").alias("uuid_a"),
        F.col("event_type_uuid").alias("uuid_b"),
    )
    assert _rows(scored) == _rows(v3.unionAll(v5).select(*scored.columns))


def test_sampling_methods_equals_granular_composition(spark):
    reg = qmod.all_queries()
    scored = reg["sampling_methods"](spark, SF)

    s = reg["sample_stratified"](spark, SF).select(
        F.lit("stratified_events").alias("src"),
        F.col("event_id").cast("long").alias("id"),
        F.col("event_type").alias("key"),
        F.lit(0.0).cast("double").alias("score"),
    )
    w = reg["weighted_sample_quality"](spark, SF).select(
        F.lit("weighted_quality").alias("src"),
        F.col("doc_id").cast("long").alias("id"),
        F.lit("").alias("key"),
        F.col("quality").cast("double").alias("score"),
    )
    h = reg["train_val_test_split"](spark, SF).select(
        F.lit("hash_split").alias("src"),
        F.col("doc_id").cast("long").alias("id"),
        F.col("split").alias("key"),
        F.lit(0.0).cast("double").alias("score"),
    )
    assert _rows(scored) == _rows(s.unionAll(w).unionAll(h).select(*scored.columns))


def test_url_bpe_tokens_equals_granular_composition(spark):
    reg = qmod.all_queries()
    scored = reg["url_bpe_tokens"](spark, SF)

    u = reg["url_canonical_docs"](spark, SF).select(
        F.lit("url").alias("src"),
        F.col("doc_id").cast("long").alias("id"),
        F.col("url").alias("raw"),
        "canon_url",
        "host",
        "domain",
        F.lit("").alias("meta"),
        F.lit(0).cast("long").alias("n_tokens"),
    )
    b = reg["bpe_token_counts"](spark, SF).select(
        F.lit("bpe").alias("src"),
        F.col("sample_id").cast("long").alias("id"),
        F.lit("").alias("raw"),
        F.lit("").alias("canon_url"),
        F.lit("").alias("host"),
        F.lit("").alias("domain"),
        F.lit("").alias("meta"),
        F.col("n_tokens"),
    )
    g = reg["unigram_token_counts"](spark, SF).select(
        F.lit("unigram").alias("src"),
        F.col("sample_id").cast("long").alias("id"),
        F.lit("").alias("raw"),
        F.lit("").alias("canon_url"),
        F.lit("").alias("host"),
        F.lit("").alias("domain"),
        F.lit("").alias("meta"),
        F.col("n_tokens"),
    )
    w = reg["warc_ingest_records"](spark, SF).select(
        F.lit("warc").alias("src"),
        F.col("doc_id").cast("long").alias("id"),
        F.col("url").alias("raw"),
        F.lit("").alias("canon_url"),
        F.lit("").alias("host"),
        F.lit("").alias("domain"),
        F.concat_ws(
            "|", "layout", F.col("status").cast("string"), "ctype", "payload_md5"
        ).alias("meta"),
        F.col("payload_bytes").alias("n_tokens"),
    )
    composed = u.unionAll(b).unionAll(g).unionAll(w).select(*scored.columns)
    assert _rows(scored) == _rows(composed)
    # the warc arm really contributes parsed records
    assert any(r[0] == "warc" for r in _rows(scored))


def test_bpe_rank_order_reference_agrees_with_encode_word():
    """The oracle's independent rank-order tokenizer and the engine's
    lowest-rank-pair encode_word must agree on every fixture word (and
    on unseen words) for the learned-consistent merge table."""
    from edna_dbt_library_spark.operators.tokenizer import encode_word
    from edna_dbt_library_spark.queries import (
        BPE_MERGES,
        BPE_SAMPLES,
        _bpe_count_rank_order,
    )

    ranks = {p: i for i, p in enumerate(BPE_MERGES)}
    words = {w for _sid, t in BPE_SAMPLES for w in (t or "").lower().split()}
    words |= {"unseen", "zzz", "lowestest"}
    for w in sorted(words):
        assert _bpe_count_rank_order(w, BPE_MERGES) == len(encode_word(w, ranks)), w


def test_fused_verdict_equals_composed_scored_row_at_sf01(spark):
    """Production fused path parity on the FULL sf0.01 documents corpus:
    curation_verdict (one scan, zero shuffles) must agree value-for-value
    with the driver-scored curation_quality composition — the scored row
    certifies the plan that actually runs at 100 TB, not a sibling
    implementation.

    The comparison is family-wise on identical inputs: the scored
    composition computes langid/quality/repetition on the RAW text but
    its PII family on deterministically INJECTED text (the synthetic
    corpus carries no PII), so the fused scan is checked against each
    family on the input that family actually saw."""
    from edna_dbt_library_spark.operators.curation import curation_verdict
    from edna_dbt_library_spark.sources import load_table

    docs = load_table(spark, SF01, "documents")
    scored = qmod.all_queries()["curation_quality"](spark, SF01)

    raw_cols = [
        "doc_id", "pred_lang", "quality",
        "dup_line_frac", "dup_line_char_frac",
        "top_2gram_char_frac", "top_3gram_char_frac", "top_4gram_char_frac",
        "dup_5gram_char_frac", "keep_repetition",
    ]
    fused_raw = curation_verdict(docs)
    f_rows = _rows(fused_raw.select(*raw_cols))
    s_rows = _rows(scored.select(*raw_cols))
    assert len(f_rows) == len(s_rows) > 0
    assert f_rows == s_rows

    # PII family: same doc_id-derived injection the scored query applies
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com or 10.0."),
            F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
            F.lit(".7 call 555-867-"),
            F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
        ).alias("text"),
    )
    pii_cols = ["doc_id", "redacted", "has_email", "has_ip", "has_phone"]
    f_pii = _rows(curation_verdict(injected).select(*pii_cols))
    s_pii = _rows(scored.select(*pii_cols))
    assert f_pii == s_pii
    # and the injection really exercised the redactor corpus-wide
    assert all(r[2] and r[3] and r[4] for r in s_pii)


def test_ann_topk_equals_granular_composition(spark):
    reg = qmod.all_queries()
    scored = _rows(reg["ann_topk"](spark, SF))
    cols = ["query_id", "rank", "vec_id", "label", "cosine_sim"]
    bf = reg["ann_topk_bruteforce"](spark, SF).select(F.lit("bruteforce").alias("method"), *cols)
    ivf = reg["ann_ivf_topk"](spark, SF).select(F.lit("ivf").alias("method"), *cols)
    def adc_arm(name, tag):
        return reg[name](spark, SF).select(
            F.lit(tag).alias("method"),
            "query_id",
            "rank",
            "vec_id",
            F.lit(None).cast("int").alias("label"),
            F.col("adc_dist").cast("double").alias("cosine_sim"),
        )

    pq = adc_arm("ann_pq_adc_topk", "pq")
    ivfpq = adc_arm("ann_ivf_pq_topk", "ivfpq")
    # the persisted-index LSM arm must be the inline IVFADC search
    # re-tagged, bit for bit: build + append + delta-masked live view
    # cannot change a single ranked row
    ivfpq_idx = adc_arm("ann_ivf_pq_topk", "ivfpq_idx")
    composed = _rows(
        bf.unionAll(ivf).unionAll(pq).unionAll(ivfpq).unionAll(ivfpq_idx)
    )
    assert scored == composed and len(scored) > 0
    assert {r[0] for r in scored} == {
        "bruteforce", "ivf", "pq", "ivfpq", "ivfpq_idx",
    }


def test_temporal_join_surface_equals_granular_composition(spark):
    reg = qmod.all_queries()
    scored = _rows(reg["temporal_join_surface"](spark, SF))
    a = reg["asof_latest_order"](spark, SF).select(
        F.lit("asof").alias("src"),
        F.col("event_id").alias("id_a"),
        F.col("user_id").alias("id_b"),
        F.col("matched_orderkey").alias("k"),
        F.col("matched_total").cast("double").alias("val"),
    )
    rj = reg["range_attribution"](spark, SF).select(
        F.lit("range").alias("src"),
        F.col("click_id").alias("id_a"),
        F.col("purchase_id").alias("id_b"),
        F.col("mins_after").alias("k"),
        F.lit(None).cast("double").alias("val"),
    )
    composed = _rows(a.unionAll(rj))
    assert scored == composed and len(scored) > 0
    assert {r[0] for r in scored} == {"asof", "range"}


def test_retrieval_scores_equals_granular_composition(spark):
    reg = qmod.all_queries()
    scored = _rows(reg["retrieval_scores"](spark, SF))
    bm25 = reg["bm25_topk_docs"](spark, SF)
    tfidf = reg["tfidf_top_terms_docs"](spark, SF)
    lm = reg["lm_cross_entropy_docs"](spark, SF)
    composed = _rows(
        bm25.select(
            F.lit("bm25").alias("src"), F.col("query_id").alias("query_key"), "rank",
            F.col("doc_id").cast("string").alias("item"), "score",
            F.lit(0).cast("long").alias("n"),
        )
        .unionAll(
            tfidf.select(
                F.lit("tfidf").alias("src"), F.col("doc_id").cast("string").alias("query_key"),
                "rank", F.col("term").alias("item"), "score", F.lit(0).cast("long").alias("n"),
            )
        )
        .unionAll(
            lm.select(
                F.lit("lm").alias("src"), F.col("doc_id").cast("string").alias("query_key"),
                F.lit(0).cast("int").alias("rank"), F.lit("").alias("item"),
                F.col("cross_entropy").alias("score"), F.col("n_bigrams").alias("n"),
            )
        )
        # the bm25_idx arm (persisted-index search) must equal the
        # per-call bm25 ranking row-for-row, tag aside
        .unionAll(
            bm25.select(
                F.lit("bm25_idx").alias("src"), F.col("query_id").alias("query_key"),
                "rank", F.col("doc_id").cast("string").alias("item"), "score",
                F.lit(0).cast("long").alias("n"),
            )
        )
    )
    assert scored == composed
    # every family contributes rows to the scored window
    srcs = {r[0] for r in scored}
    assert srcs == {"bm25", "tfidf", "lm", "bm25_idx"}


def test_sketch_estimates_equals_granular_composition(spark):
    reg = qmod.all_queries()
    scored = reg["sketch_estimates"](spark, SF)
    h = reg["hll_distinct_orders"](spark, SF).select(
        F.lit("hll_distinct").alias("src"),
        F.col("l_returnflag").alias("key"),
        F.col("distinct_est").alias("value"),
        F.col("registers_used").cast("long").alias("n"),
    )
    c = reg["cms_user_freq"](spark, SF).select(
        F.lit("cms_freq").alias("src"),
        F.col("user_id").cast("string").alias("key"),
        F.col("est_count").cast("double").alias("value"),
        F.lit(0).cast("long").alias("n"),
    )
    q = reg["histogram_quantiles_price"](spark, SF).select(
        F.lit("hist_quantile").alias("src"),
        F.col("l_linestatus").alias("key"),
        F.col("est").cast("double").alias("value"),
        F.round(F.col("q") * 100).cast("long").alias("n"),
    )
    assert _rows(scored) == _rows(h.unionAll(c).unionAll(q).select(*scored.columns))


def test_media_near_dup_pairs_equals_granular_composition(spark):
    reg = qmod.all_queries()
    scored = reg["media_near_dup_pairs"](spark, SF)
    i = reg["image_phash_pairs"](spark, SF).select(
        F.lit("image").alias("src"), "doc_a", "doc_b", "hamming"
    )
    a = reg["audio_fp_pairs"](spark, SF).select(
        F.lit("audio").alias("src"), "doc_a", "doc_b", "hamming"
    )
    assert _rows(scored) == _rows(i.unionAll(a).select(*scored.columns))


def test_binary_scalar_codecs_equals_granular_composition(spark):
    reg = qmod.all_queries()
    scored = reg["binary_scalar_codecs"](spark, SF)
    null = lambda t: F.lit(None).cast(t)  # noqa: E731
    c = reg["binary_codecs"](spark, SF).select(
        F.lit("codecs").alias("src"),
        "p_partkey", "h", "parsed", "rev", "int32_val", "hex3", "hex16",
        "hex_oob", "b64_2", "bits", "roundtrip",
        null("double").alias("reconstructed"),
    )
    i = reg["ieee754_decode"](spark, SF).select(
        F.lit("ieee754").alias("src"),
        "p_partkey",
        null("string").alias("h"),
        null("bigint").alias("parsed"),
        null("string").alias("rev"),
        null("bigint").alias("int32_val"),
        null("int").alias("hex3"),
        null("int").alias("hex16"),
        null("int").alias("hex_oob"),
        null("int").alias("b64_2"),
        null("string").alias("bits"),
        null("bigint").alias("roundtrip"),
        "reconstructed",
    )
    assert _rows(scored) == _rows(c.unionAll(i).select(*scored.columns))


def test_string_shaping_equals_granular_composition(spark):
    reg = qmod.all_queries()
    scored = reg["string_shaping"](spark, SF)
    pe = reg["posexplode_words"](spark, SF).select(
        F.lit("posexplode").alias("src"),
        F.col("p_partkey").cast("long").alias("id"),
        F.col("idx").cast("long").alias("idx"),
        F.lit("").alias("key"),
        F.col("word").alias("a"),
        F.lit("").alias("b"),
    )
    sa = reg["ordered_string_agg"](spark, SF).select(
        F.lit("string_agg").alias("src"),
        F.lit(0).cast("long").alias("id"),
        F.lit(0).cast("long").alias("idx"),
        F.col("r_name").alias("key"),
        F.col("nations_asc").alias("a"),
        F.col("nations_desc").alias("b"),
    )
    assert _rows(scored) == _rows(pe.unionAll(sa).select(*scored.columns))


def test_run_window_bounds_equals_granular_composition(spark):
    reg = qmod.all_queries()
    scored = reg["run_window_bounds"](spark, SF)
    mm = reg["union_minmax"](spark, SF).select(
        F.lit("bounds").alias("src"),
        F.col("lowest").alias("a"),
        F.col("highest").alias("b"),
    )
    pl = reg["distinct_partitions"](spark, SF).select(
        F.lit("partition").alias("src"),
        F.col("part_date").alias("a"),
        F.lit("").alias("b"),
    )
    assert _rows(scored) == _rows(mm.unionAll(pl).select(*scored.columns))


def test_relational_breadth_equals_granular_composition(spark):
    reg = qmod.all_queries()
    scored = reg["relational_breadth"](spark, SF)
    ro = reg["rollup_region_revenue"](spark, SF).select(
        F.lit("rollup").alias("src"),
        F.col("region").alias("k1"),
        F.col("nation").alias("k2"),
        F.col("gid").cast("long").alias("id"),
        F.col("total_revenue").cast("double").alias("value"),
        F.col("n_orders").cast("long").alias("n"),
    )
    so = reg["setops_customers"](spark, SF).select(
        F.lit("setops").alias("src"),
        F.col("src").alias("k1"),
        F.lit("").alias("k2"),
        F.col("custkey").cast("long").alias("id"),
        F.lit(0.0).cast("double").alias("value"),
        F.lit(0).cast("long").alias("n"),
    )
    nt = reg["ntile_balance_deciles"](spark, SF).select(
        F.lit("ntile").alias("src"),
        F.col("min_key").cast("string").alias("k1"),
        F.col("max_key").cast("string").alias("k2"),
        F.col("decile").cast("long").alias("id"),
        F.col("total_balance").cast("double").alias("value"),
        F.col("n_customers").cast("long").alias("n"),
    )
    assert _rows(scored) == _rows(ro.unionAll(so).unionAll(nt).select(*scored.columns))
    assert {r[0] for r in _rows(scored.select("src").distinct())} == {
        "rollup", "setops", "ntile"
    }


def test_content_quality_stats_equals_granular_composition(spark):
    reg = qmod.all_queries()
    scored = reg["content_quality_stats"](spark, SF)
    sh = reg["strip_html_docs"](spark, SF).select(
        F.lit("strip_html").alias("src"),
        F.col("doc_id").cast("long").alias("id"),
        F.col("clean_text").alias("key"),
        F.lit(0.0).cast("double").alias("value"),
        F.lit(0.0).cast("double").alias("value2"),
        F.lit(0).cast("long").alias("n"),
    )
    zs = reg["zscore_outlier_events"](spark, SF).select(
        F.lit("zscore").alias("src"),
        F.col("event_id").cast("long").alias("id"),
        F.col("event_type").alias("key"),
        F.col("zscore").cast("double").alias("value"),
        F.col("value").cast("double").alias("value2"),
        F.lit(0).cast("long").alias("n"),
    )
    qz = reg["quantized_embeddings_summary"](spark, SF).select(
        F.lit("quantized").alias("src"),
        F.col("vec_id").cast("long").alias("id"),
        F.concat_ws(
            ":",
            F.col("q_min").cast("string"),
            F.col("q_max").cast("string"),
            F.col("n_nonzero").cast("string"),
        ).alias("key"),
        F.col("scale").cast("double").alias("value"),
        F.lit(0.0).cast("double").alias("value2"),
        F.col("q_sum").cast("long").alias("n"),
    )
    gm = reg["embedding_gram_matrix"](spark, SF).select(
        F.lit("gram").alias("src"),
        F.col("i").cast("long").alias("id"),
        F.col("j").cast("string").alias("key"),
        F.lit(0.0).cast("double").alias("value"),
        F.lit(0.0).cast("double").alias("value2"),
        F.col("g").alias("n"),
    )
    rp = reg["embedding_random_projection"](spark, SF).select(
        F.lit("rproj").alias("src"),
        F.col("vec_id").cast("long").alias("id"),
        F.col("j").cast("string").alias("key"),
        F.lit(0.0).cast("double").alias("value"),
        F.lit(0.0).cast("double").alias("value2"),
        F.col("p").alias("n"),
    )
    composed = (
        sh.unionAll(zs).unionAll(qz).unionAll(gm).unionAll(rp).select(*scored.columns)
    )
    srows = _rows(scored)
    assert srows == _rows(composed)
    assert sum(1 for r in srows if r[0] == "gram") == 2080  # 64*65/2
    assert sum(1 for r in srows if r[0] == "rproj") > 0


def test_incremental_store_state_replay_is_idempotent(spark, tmp_path):
    """The scored converged-state row replays batch1 after both batches —
    the driver gate only passes when that replay admits NOTHING; this
    lock asserts the same property directly on the scored row's split:
    running the text operator on an already-ingested batch returns 0
    admitted rows, and the store content is byte-stable across replays."""
    from edna_dbt_library_spark.operators.dedup import run_incremental_dedup
    from edna_dbt_library_spark.sources import Warehouse, load_table

    wh = Warehouse(spark, str(tmp_path))
    store = wh.relation("scratch", "t")
    d = load_table(spark, SF, "documents")
    b1 = d.where(F.col("doc_id") % 2 == 0)
    run_incremental_dedup(wh, store, b1)
    before = _rows(wh.read(store))
    again = run_incremental_dedup(wh, store, b1)
    assert again.count() == 0
    assert _rows(wh.read(store)) == before


def test_stateful_store_state_equals_granular_composition(spark):
    """r7 scored row == incremental_store_state ∪ warehouse_changes_state
    (∪ delete_vectors_read since r8, ∪ replica_sync_state since r9)."""
    reg = qmod.all_queries()
    scored = reg["stateful_store_state"](spark, SF)
    inc = reg["incremental_store_state"](spark, SF).select(
        "src", "id", "key", "cell", F.lit(0.0).cast("double").alias("value")
    )
    chg = reg["warehouse_changes_state"](spark, SF).select(
        F.lit("warehouse_cdc").alias("src"),
        F.col("n").cast("long").alias("id"),
        F.concat_ws("|", F.col("day").cast("string"), F.col("priority")).alias("key"),
        F.lit(0).cast("long").alias("cell"),
        F.col("rev").cast("double").alias("value"),
    )
    dlv = reg["delete_vectors_read"](spark, SF).select(
        F.lit("delete_vectors").alias("src"),
        F.col("n").cast("long").alias("id"),
        F.col("priority").alias("key"),
        F.lit(0).cast("long").alias("cell"),
        F.col("rev").cast("double").alias("value"),
    )
    clg = reg["changelog_feed"](spark, SF).select(
        F.lit("changelog").alias("src"),
        F.col("okey").cast("long").alias("id"),
        F.concat_ws("|", F.col("change_type"), F.col("st")).alias("key"),
        F.lit(0).cast("long").alias("cell"),
        F.lit(0.0).cast("double").alias("value"),
    )
    rps = reg["replica_sync_state"](spark, SF).select(
        F.lit("replica_sync").alias("src"),
        F.col("okey").cast("long").alias("id"),
        F.col("st").alias("key"),
        F.lit(0).cast("long").alias("cell"),
        F.col("price").cast("double").alias("value"),
    )
    sqd = reg["sql_dml_state"](spark, SF).select(
        F.lit("sql_dml").alias("src"),
        F.col("okey").cast("long").alias("id"),
        F.col("st").alias("key"),
        F.lit(0).cast("long").alias("cell"),
        F.col("price").cast("double").alias("value"),
    )
    assert _rows(scored) == _rows(
        inc.unionAll(chg)
        .unionAll(dlv)
        .unionAll(clg)
        .unionAll(rps)
        .unionAll(sqd)
        .select(*scored.columns)
    )


def test_sketch_surface_equals_granular_composition(spark):
    """r7 scored row == sketch_estimates ∪ bloom_semi_join_urgent
    (∪ heavy_hitter_ngrams since r8)."""
    reg = qmod.all_queries()
    scored = reg["sketch_surface"](spark, SF)
    s = reg["sketch_estimates"](spark, SF).select("src", "key", "value", "n")
    b = reg["bloom_semi_join_urgent"](spark, SF).select(
        F.lit("bloom_semi").alias("src"),
        F.col("l_returnflag").alias("key"),
        F.col("sum_qty").cast("double").alias("value"),
        F.col("n_items").cast("long").alias("n"),
    )
    f = reg["heavy_hitter_ngrams"](spark, SF).select(
        F.lit("freq_items").alias("src"),
        F.col("gram").alias("key"),
        F.col("n_occurrences").cast("double").alias("value"),
        F.col("n_occurrences").cast("long").alias("n"),
    )
    assert _rows(scored) == _rows(s.unionAll(b).unionAll(f).select(*scored.columns))


def test_graph_linkage_equals_granular_composition(spark):
    """r7 scored row (widened r11) == purchase_graph_pagerank ∪
    name_linkage_collapsed ∪ dedup_clusters."""
    reg = qmod.all_queries()
    scored = reg["graph_linkage"](spark, SF)
    pr = reg["purchase_graph_pagerank"](spark, SF).select(
        F.lit("pagerank").alias("src"),
        F.col("node").alias("key"),
        F.lit(0).cast("long").alias("id_a"),
        F.lit(0).cast("long").alias("id_b"),
        F.col("rank").cast("long").alias("value"),
        F.lit(0).cast("long").alias("n_a"),
        F.lit(0).cast("long").alias("n_b"),
    )
    lk = reg["name_linkage_collapsed"](spark, SF).select(
        F.lit("linkage").alias("src"),
        F.lit("").alias("key"),
        F.col("doc_a").cast("long").alias("id_a"),
        F.col("doc_b").cast("long").alias("id_b"),
        F.col("distance").cast("long").alias("value"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
    )
    cl = reg["dedup_clusters"](spark, SF).select(
        F.lit("clusters").alias("src"),
        F.lit("").alias("key"),
        F.col("doc_id").cast("long").alias("id_a"),
        F.col("cluster_id").cast("long").alias("id_b"),
        F.lit(0).cast("long").alias("value"),
        F.lit(0).cast("long").alias("n_a"),
        F.lit(0).cast("long").alias("n_b"),
    )
    composed = pr.unionAll(lk).unionAll(cl)
    assert _rows(scored) == _rows(composed.select(*scored.columns))
    assert {r[0] for r in _rows(scored.select("src").distinct())} == {
        "pagerank", "linkage", "clusters",
    }


def test_incremental_view_state_equals_granular_composition(spark):
    """r11 scored row (widened r12) == join_view_state ∪ agg_view_state
    ∪ distinct_view_state ∪ extrema_view_state ∪ join_agg_view_state
    (the IVM families, src-tagged)."""
    reg = qmod.all_queries()
    scored = reg["incremental_view_state"](spark, SF)
    jv = reg["join_view_state"](spark, SF).select(
        F.lit("join_view").alias("src"),
        F.col("okey").cast("long").alias("id"),
        F.lit("").alias("key"),
        F.col("ckey").cast("long").alias("cell"),
        F.lit(0).cast("long").alias("n"),
        F.col("price").cast("double").alias("value"),
        F.col("bal").cast("double").alias("value2"),
    )
    av = reg["agg_view_state"](spark, SF).select(
        F.lit("agg_view").alias("src"),
        F.lit(0).cast("long").alias("id"),
        F.col("grp").alias("key"),
        F.col("sck").cast("long").alias("cell"),
        F.col("n").cast("long").alias("n"),
        F.lit(0.0).cast("double").alias("value"),
        F.lit(0.0).cast("double").alias("value2"),
    )
    dv = reg["distinct_view_state"](spark, SF).select(
        F.lit("distinct_view").alias("src"),
        F.lit(0).cast("long").alias("id"),
        F.col("grp").alias("key"),
        F.col("nd").cast("long").alias("cell"),
        F.lit(0).cast("long").alias("n"),
        F.lit(0.0).cast("double").alias("value"),
        F.lit(0.0).cast("double").alias("value2"),
    )
    xv = reg["extrema_view_state"](spark, SF).select(
        F.lit("extrema_view").alias("src"),
        F.lit(0).cast("long").alias("id"),
        F.col("grp").alias("key"),
        F.col("lo").cast("long").alias("cell"),
        F.col("hi").cast("long").alias("n"),
        F.lit(0.0).cast("double").alias("value"),
        F.lit(0.0).cast("double").alias("value2"),
    )
    gv = reg["join_agg_view_state"](spark, SF).select(
        F.lit("join_agg_view").alias("src"),
        F.lit(0).cast("long").alias("id"),
        F.col("nk").cast("string").alias("key"),
        F.col("su").cast("long").alias("cell"),
        F.col("n").cast("long").alias("n"),
        F.lit(0.0).cast("double").alias("value"),
        F.lit(0.0).cast("double").alias("value2"),
    )
    mv = reg["agg_distinct_view_state"](spark, SF).select(
        F.lit("agg_distinct_view").alias("src"),
        F.lit(0).cast("long").alias("id"),
        F.col("grp").alias("key"),
        F.col("sa").cast("long").alias("cell"),
        F.col("n").cast("long").alias("n"),
        F.col("nu").cast("double").alias("value"),
        F.lit(0.0).cast("double").alias("value2"),
    )
    lj = reg["left_join_view_state"](spark, SF).select(
        F.lit("left_join_view").alias("src"),
        F.col("okey").cast("long").alias("id"),
        F.lit("").alias("key"),
        F.col("ckey").cast("long").alias("cell"),
        F.col("price").cast("long").alias("n"),
        F.lit(0.0).cast("double").alias("value"),
        F.col("bal").cast("double").alias("value2"),
    )
    mw = reg["multiway_join_agg_view_state"](spark, SF).select(
        F.lit("multiway_view").alias("src"),
        F.lit(0).cast("long").alias("id"),
        F.col("rk").cast("string").alias("key"),
        F.col("su").cast("long").alias("cell"),
        F.col("n").cast("long").alias("n"),
        F.lit(0.0).cast("double").alias("value"),
        F.lit(0.0).cast("double").alias("value2"),
    )
    jd = reg["join_distinct_view_state"](spark, SF).select(
        F.lit("join_distinct_view").alias("src"),
        F.lit(0).cast("long").alias("id"),
        F.col("grp").cast("string").alias("key"),
        F.col("sa").cast("long").alias("cell"),
        F.col("n").cast("long").alias("n"),
        F.col("nu").cast("double").alias("value"),
        F.lit(0.0).cast("double").alias("value2"),
    )
    hv = reg["having_expr_view_state"](spark, SF).select(
        F.lit("having_view").alias("src"),
        F.lit(0).cast("long").alias("id"),
        F.col("grp").cast("string").alias("key"),
        F.col("rev").cast("long").alias("cell"),
        F.col("n").cast("long").alias("n"),
        F.lit(0.0).cast("double").alias("value"),
        F.lit(0.0).cast("double").alias("value2"),
    )
    composed = (
        jv.unionAll(av).unionAll(dv).unionAll(xv).unionAll(gv).unionAll(mv)
        .unionAll(lj).unionAll(mw).unionAll(jd).unionAll(hv)
    )
    assert _rows(scored) == _rows(composed.select(*scored.columns))
    assert {r[0] for r in _rows(scored.select("src").distinct())} == {
        "join_view", "agg_view", "distinct_view", "extrema_view",
        "join_agg_view", "agg_distinct_view", "left_join_view",
        "multiway_view", "join_distinct_view", "having_view",
    }


def test_coverage_doc_counts_match_registry():
    """COVERAGE.md's headline registry split must match queries.py by
    import — the r6 verdict caught this doc drifting, so it's now
    asserted."""
    import re

    text = open("COVERAGE.md").read()
    scored = int(re.search(r"\*\*(\d+) driver-facing queries\*\*", text).group(1))
    extras = int(re.search(r"\*\*(\d+) extra-registry", text).group(1))
    total = int(re.search(r"(\d+) registered total", text).group(1))
    assert scored == len(qmod.CORE_ORDER)
    assert total == len(qmod.REGISTRY)
    assert extras == total - scored


def test_data_layout_state_equals_granular_composition(spark):
    """r7 scored row == morton_zorder_key ∪ zonemap_pruned_rollup ∪
    bloom_pruned_lookup."""
    reg = qmod.all_queries()
    scored = reg["data_layout_state"](spark, SF)
    m = reg["morton_zorder_key"](spark, SF).select(
        F.lit("morton").alias("src"),
        F.col("o_orderkey").cast("long").alias("id"),
        F.lit("").alias("key"),
        F.col("qx").cast("long").alias("a"),
        F.col("qy").cast("long").alias("b"),
        F.col("zkey").cast("long").alias("c"),
        F.lit(0.0).cast("double").alias("value"),
    )
    z = reg["zonemap_pruned_rollup"](spark, SF).select(
        F.lit("zonemap").alias("src"),
        F.lit(0).cast("long").alias("id"),
        F.col("priority").alias("key"),
        F.col("n").cast("long").alias("a"),
        F.lit(0).cast("long").alias("b"),
        F.lit(0).cast("long").alias("c"),
        F.col("rev").cast("double").alias("value"),
    )
    b = reg["bloom_pruned_lookup"](spark, SF).select(
        F.lit("bloom").alias("src"),
        F.col("custkey").cast("long").alias("id"),
        F.col("name").alias("key"),
        F.lit(0).cast("long").alias("a"),
        F.lit(0).cast("long").alias("b"),
        F.lit(0).cast("long").alias("c"),
        F.col("acctbal").cast("double").alias("value"),
    )
    assert _rows(scored) == _rows(m.unionAll(z).unionAll(b).select(*scored.columns))


def test_cross_doc_ngrams_equals_granular_composition(spark):
    """r7 scored row == contamination_3gram ∪ corpus_dup_ngrams ∪
    dup_substring_spans."""
    reg = qmod.all_queries()
    scored = reg["cross_doc_ngrams"](spark, SF)
    c = reg["contamination_3gram"](spark, SF).select(
        F.lit("contam").alias("src"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_hits").cast("long").alias("a"),
        F.lit(0).cast("long").alias("b"),
        F.lit(0).cast("long").alias("c"),
    )
    g = reg["corpus_dup_ngrams"](spark, SF).select(
        F.lit("corpus").alias("src"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_grams").cast("long").alias("a"),
        F.col("n_dup_grams").cast("long").alias("b"),
        F.col("dup_permille").cast("long").alias("c"),
    )
    d = reg["dup_substring_spans"](spark, SF).select(
        F.lit("dupspan").alias("src"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("span_start").cast("long").alias("a"),
        F.col("span_end").cast("long").alias("b"),
        F.col("span_tokens").cast("long").alias("c"),
    )
    assert _rows(scored) == _rows(c.unionAll(g).unionAll(d).select(*scored.columns))
