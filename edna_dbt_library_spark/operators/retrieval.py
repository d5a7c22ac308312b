"""Corpus retrieval & statistical language-model scoring, Spark-first.

Two operator families a training-data pipeline needs beyond dedup:

* ``bm25_topk`` — Okapi BM25 ranked retrieval over the ``documents``
  table: the standard quality tool for "find the corpus passages most
  relevant to this probe query" (eval-set leakage triage, targeted
  corpus inspection, RAG ground-truth building). The index build is the
  classic two-shuffle inverted index (term frequencies + document
  lengths); scoring touches ONLY the postings of the query's terms.
* ``lm_cross_entropy`` — CCNet-style statistical LM quality scoring
  (Wenzek et al., 2020: filtering CommonCrawl by LM perplexity): train
  an add-alpha-smoothed bigram model on the corpus (or a reference
  split), score every document by its per-bigram cross-entropy. High
  cross-entropy = the document looks nothing like the reference corpus
  (gibberish, boilerplate soup, wrong language) — the canonical
  pretraining quality filter alongside the Gopher heuristics in
  operators/curation.py.

Cross-engine determinism (the repo-wide rules): every per-term /
per-bigram double contribution is rounded to 9 decimals and cast to
DECIMAL before the sum — decimal addition is exact and associative, so
no partitioning can reorder a float sum — then the final score rounds
to 6 decimals with an id tiebreak on every top-k. ``ln`` is the one
transcendental in play; it runs on bit-identical double inputs in both
engines and its result is rounded to 9 decimals before aggregation.

Scale shape (100 TB): the corpus-wide work is the index build — two
map-side-combinable groupBys (tf, then dl/df derived FROM tf, never a
second corpus scan). BM25 scoring broadcasts the (tiny) query-term ×
idf table so only matching postings survive the probe; the LM model
join shuffles on the bigram key, whose cardinality is bounded by
observed-vocabulary², not corpus size. No window runs over more than
one query's candidates or one model key's rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from edna_dbt_library_spark.functions.text import tokens

#: separator for composite bigram keys — never appears in whitespace tokens
BIGRAM_SEP = "\x01"

#: decimal type for exact, associative summation of rounded contributions
_DEC = "decimal(28,9)"


def doc_term_freqs(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc, term) term frequencies + per-doc token length in ONE
    shuffle: the doc length rides along as ``size(tokens)`` computed
    BEFORE the explode, so tf and dl come out of a single
    groupBy(doc, term) — no second dl aggregation and no doc-keyed
    join. Returns (doc_id, term, tf, dl)."""
    return (
        documents.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("_toks"))
        .select("doc_id", F.size("_toks").alias("dl"), F.explode("_toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
        .select("doc_id", "term", "tf", "dl")
    )


def bm25_topk(
    documents: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_df_frac: float | None = None,
) -> DataFrame:
    """Okapi BM25 top-k retrieval: (query_id, rank, doc_id, score).

    ``max_df_frac`` drops query terms whose document frequency exceeds
    that fraction of the corpus BEFORE the postings join — the standard
    stop-term guard: a term in 80% of documents drags its entire
    posting list (nearly the whole corpus) through the scoring join
    while its near-zero idf contributes nothing to the ranking. The
    filter runs on the tiny probe table, so it costs nothing and bounds
    the scoring join's input by construction (measured in
    PLAN_AUDIT.md "retrieval scale stress").

    ``queries`` is a small (query_id, text) frame; DISTINCT query terms
    are used (query-side tf is ignored — standard for short probe
    queries). idf is the Lucene-standard non-negative form
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``; the per-term contribution is
    ``idf * tf / (tf + k1 * (1 - b + b * dl/avgdl))``.

    Plan: index (tf+dl, corpus shuffles) → df per term → query terms
    join df (broadcast queries: few terms) → broadcast that scored
    probe table into the postings join, so the corpus side is FILTERED
    to matching postings before its only post-index shuffle (the
    per-(query, doc) score agg, map-side combinable). Corpus stats
    (N, avgdl) ride in as a broadcast single-row crossJoin, keeping the
    plan fully lazy."""
    tfdl = doc_term_freqs(documents, id_col, text_col)
    stats = corpus_stats(documents, text_col)
    df_t = tfdl.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    qterms = query_terms(queries, text_col)
    return _bm25_rank(tfdl, df_t, stats, qterms, k, k1, b, max_df_frac)


def corpus_stats(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row (n_docs, avgdl) corpus statistics from the PRE-explode
    projection: a column-pruned scan with map-side partial aggregation
    to one row — cheaper at scale than re-shuffling the tf table by doc
    (docs with zero tokens have no postings and are excluded on both
    paths). The zero-token filter is the raw-column predicate
    ``text rlike '\\S'`` — exactly ``size(tokens(text)) > 0`` (same Java
    regex whitespace class as the tokenizer split, NULL-safe on both
    paths) but pushable to the scan: filtering on the derived dl column
    re-derives the whole tokenize expression inside the pushed
    predicate (one extra corpus-wide tokenize)."""
    return (
        documents.where(F.col(text_col).rlike(r"\S"))
        .select(F.size(tokens(text_col)).alias("dl"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n_docs"),
            (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        )
    )


def corpus_stats_exact(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row EXACT corpus statistics (n_docs long, sum_dl long) —
    the associative form the index stats table stores so an
    incremental append can SUM rows instead of re-scanning the corpus
    (long addition is exact and order-free). ``_derive_stats`` turns it
    into the (n_docs double, avgdl double) frame the scoring core
    consumes with the same cast-then-divide ``corpus_stats`` uses, so
    indexed == per-call stays bit-identical across any append
    history. Zero-token filter: same scan-pushable raw-column predicate
    as ``corpus_stats`` (must stay identical — indexed == per-call
    bit-identity rides both excluding the same rows)."""
    return (
        documents.where(F.col(text_col).rlike(r"\S"))
        .select(F.size(tokens(text_col)).alias("dl"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").cast("long").alias("sum_dl"),
        )
    )


def _derive_stats(exact: DataFrame) -> DataFrame:
    """(n_docs double, avgdl double) from the exact long stats row —
    the division is the SAME double/double expression corpus_stats
    evaluates, on the same exact integers, so the result is
    bit-identical to the per-call path."""
    return exact.select(
        F.col("n_docs").cast("double").alias("n_docs"),
        (F.col("sum_dl").cast("double") / F.col("n_docs").cast("double")).alias(
            "avgdl"
        ),
    )


def query_terms(queries: DataFrame, text_col: str = "text") -> DataFrame:
    """DISTINCT (query_id, term) probe terms of a small query frame
    (query-side tf is ignored — standard for short probe queries)."""
    return (
        queries.select(F.col("query_id"), tokens(text_col).alias("_toks"))
        .select("query_id", F.explode("_toks").alias("term"))
        .distinct()
    )


def _bm25_rank(
    tfdl: DataFrame,
    df_t: DataFrame,
    stats: DataFrame,
    qterms: DataFrame,
    k: int,
    k1: float,
    b: float,
    max_df_frac: float | None,
) -> DataFrame:
    """The BM25 scoring core shared by the per-call path (bm25_topk)
    and the persisted-index path (bm25_topk_indexed) — one function so
    the two paths are bit-identical by construction. ``tfdl`` may be
    pre-filtered to the probe terms' postings (the indexed path): every
    non-query term is dropped by the probe join anyway."""
    # idf per (query, term): tiny — broadcast the query side into df
    probe = df_t.join(F.broadcast(qterms), "term").crossJoin(F.broadcast(stats))
    if max_df_frac is not None:
        probe = probe.where(F.col("df") / F.col("n_docs") <= max_df_frac)
    probe = (
        probe.select(
            "query_id",
            "term",
            F.log(
                F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ).alias("idf"),
            "avgdl",
        )
    )
    contrib = tfdl.join(F.broadcast(probe), "term").select(
        "query_id",
        "doc_id",
        F.round(
            F.col("idf")
            * F.col("tf")
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))),
            9,
        )
        .cast(_DEC)
        .alias("c"),
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(
        F.round(F.sum("c"), 6).cast("double").alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


def build_bm25_index(
    wh,
    index,
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_files: int | None = None,
) -> None:
    """Persist an INVERTED TEXT INDEX to the warehouse — the text
    retrieval analogue of ``similarity.build_ivfpq_index`` (index once,
    search many): ``<index>`` holds the postings (term, doc_id, tf, dl)
    RANGE-CLUSTERED by term (each file covers a narrow term range), and
    ``<index>_stats`` the one-row EXACT (n_docs, sum_dl) corpus
    statistics (long-associative so :func:`append_to_bm25_index` can
    update them without a corpus re-scan).
    After the write, zone maps AND a bloom sidecar are refreshed on
    ``term``, so a search's candidate files come from the warehouse's
    own file-skipping indexes — a query touches O(postings of its
    terms) files, never the corpus and never the full index.

    Build cost: the classic two-shuffle inverted index (tf+dl in one
    groupBy) plus the range repartition for the term-clustered layout —
    all map-side combinable, no collect. NEW documents extend the index
    through :func:`append_to_bm25_index` (postings append + exact stats
    update + incremental sidecar refresh); edits/deletes flow through
    the streaming delta segment (``stream_bm25_index`` +
    ``compact_bm25_index``) or a rebuild (the probe read is fail-safe —
    files appended to the index AFTER a sidecar refresh are always
    candidates).

    ``n_files`` bounds the postings file count (default: the session's
    shuffle partitioning). At 100 TB the index is a fraction of corpus
    bytes (ints + terms, no document text) and each probe term opens
    ~1 file plus bloom false positives."""
    from edna_dbt_library_spark.sources.warehouse import TableMeta

    tfdl = doc_term_freqs(documents, id_col, text_col)
    if n_files is not None:
        tfdl = tfdl.repartitionByRange(n_files, "term")
    else:
        tfdl = tfdl.repartitionByRange("term")
    wh.create_as(index, tfdl, TableMeta(cluster_by=["term"]))
    wh.refresh_zone_maps(index, ["term"])
    wh.refresh_bloom_sidecar(index, ["term"])
    wh.create_as(
        wh.relation(index.schema, index.identifier + "_stats"),
        corpus_stats_exact(documents, text_col),
        TableMeta(),
    )


def append_to_bm25_index(
    wh,
    index,
    new_documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    refresh_skipping: bool = True,
) -> None:
    """Extend a persisted inverted index with NEW documents — the
    between-rebuilds maintenance shape of a production search index:
    the new docs' postings are tokenized and APPENDED (only the batch
    is scanned, never the corpus), the exact stats row is summed
    (long addition — bit-identical to a from-scratch
    ``corpus_stats_exact`` over the union, locked by test), and the
    term zone maps + bloom sidecar are refreshed INCREMENTALLY (both
    refreshers scan only unindexed files). With
    ``refresh_skipping=False`` the appended files are simply always
    candidates (the fail-safe superset) until the next refresh —
    correct either way.

    Caller contract: ``new_documents`` holds documents NOT already in
    the index (a re-appended doc would double its postings) NOR in its
    streaming delta segment (the delta's doc mask supersedes MAIN, so
    it would suppress the appended postings until compaction); dedup
    upstream or rebuild. Deletions/edits go through the streaming delta
    segment (``stream_bm25_index``) or ``build_bm25_index``. Crash
    boundary: the postings append and the stats overwrite are separate
    statements — a crash between them leaves a stale stats cache, and
    ``refresh_bm25_stats`` reconciles it EXACTLY from the postings
    (re-running this append instead would double the postings)."""
    from edna_dbt_library_spark.sources.warehouse import TableMeta

    wh.append(index, doc_term_freqs(new_documents, id_col, text_col))
    stats_rel = wh.relation(index.schema, index.identifier + "_stats")
    old = wh.read(stats_rel).first()
    delta = corpus_stats_exact(new_documents, text_col).first()
    merged = wh.spark.createDataFrame(
        [
            (
                int(old["n_docs"]) + int(delta["n_docs"]),
                int(old["sum_dl"] or 0) + int(delta["sum_dl"] or 0),
            )
        ],
        "n_docs long, sum_dl long",
    )
    wh.create_as(stats_rel, merged, TableMeta())
    if refresh_skipping:
        wh.refresh_zone_maps(index, ["term"])
        wh.refresh_bloom_sidecar(index, ["term"])


def _bm25_delta_rel(wh, index):
    return wh.relation(index.schema, index.identifier + "_delta")


def _bm25_live_postings(wh, index, terms: DataFrame | None = None) -> DataFrame:
    """The index's LIVE postings — the LSM view across both segments:
    the term-clustered MAIN segment minus every document the DELTA
    segment supersedes (a streamed edit/tombstone masks the doc's main
    postings), plus the delta's own rows. ``terms`` restricts both
    segments to the probe terms' candidate files
    (``Warehouse.read_candidates``); None reads everything (stats
    refresh / compaction). The delta-doc anti join is NOT pinned
    broadcast — the delta is small by design (one maintenance window),
    and AQE demotes gracefully if it is not. Tombstone rows
    (term NULL, dl 0) survive here so every consumer sees the doc as
    superseded; term-keyed joins drop them naturally and the stats
    refresh filters them."""

    def seg(rel):
        if terms is None:
            return wh.read(rel)
        return wh.read_candidates(rel, "term", terms)

    main = seg(index)
    delta_rel = _bm25_delta_rel(wh, index)
    if wh.exists(delta_rel) and wh._has_data_files(delta_rel):
        ddocs = wh.read(delta_rel).select("doc_id").dropDuplicates()
        main = main.join(ddocs, "doc_id", "left_anti")
        # delta candidates must include the doc-mask rows regardless of
        # probe terms only when terms is None; for a term probe the
        # tombstones are irrelevant (they join no term)
        main = main.unionByName(seg(delta_rel))
    return main


def _bm25_stats_stale_path(wh, index) -> str:
    """The staleness marker lives INSIDE the index table dir with a
    `_` prefix (the sidecar convention — Spark's file index and every
    warehouse walk skip it): it exists exactly while the one-row stats
    cache lags the postings."""
    import os

    return os.path.join(wh.path(index), "_edna_stats_stale")


def mark_bm25_stats_stale(wh, index) -> None:
    """Drop the staleness marker — one os.stat-class write, no Spark.
    Written by ``stream_bm25_index``'s per-batch upsert so the
    auto-maintenance policy can SEE the debt the streaming index
    creates (serving between upsert and ``refresh_bm25_stats`` uses
    main-only n_docs/sum_dl — correct postings, stale normalization);
    cleared by ``refresh_bm25_stats`` (which ``compact_bm25_index``
    ends in)."""
    import os

    path = _bm25_stats_stale_path(wh, index)
    with open(path + ".tmp", "w") as f:
        f.write("")
    os.replace(path + ".tmp", path)


def bm25_stats_stale(wh, index) -> bool:
    import os

    return os.path.exists(_bm25_stats_stale_path(wh, index))


def refresh_bm25_stats(wh, index) -> None:
    """Recompute the one-row exact stats CACHE from the LIVE postings
    (both segments, delta superseding main): ``dl`` rides on every
    posting row, so per-doc ``first(dl)`` then count+sum — one scan of
    the ints-only index tables (a fraction of corpus bytes), never the
    corpus. Exact by construction: equals ``corpus_stats_exact`` over
    the live documents (zero-token docs appear only as tombstones —
    term NULL — and are excluded here exactly as the per-call path
    excludes them), so indexed == per-call stays bit-identical. Run
    after a streaming maintenance window (``stream_bm25_index`` upserts
    postings but leaves the stats cache to this finalizer — and marks
    the debt so ``maintenance_plan`` schedules this refresh), after a
    crashed ``append_to_bm25_index`` (the recompute reconciles the
    stats row the crash never updated), or any out-of-band surgery.
    Clears the ``_edna_stats_stale`` marker LAST — a crash mid-refresh
    leaves the debt visible and the next plan retries."""
    import contextlib
    import os

    from edna_dbt_library_spark.sources.warehouse import TableMeta

    doclen = (
        _bm25_live_postings(wh, index)
        .where(F.col("term").isNotNull())
        .groupBy("doc_id")
        .agg(F.first("dl").alias("dl"))
    )
    exact = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    ).localCheckpoint(eager=True)  # one row; pin so the stats overwrite
    # can never race a lazy re-read of a concurrently-upserted index
    wh.create_as(
        wh.relation(index.schema, index.identifier + "_stats"),
        exact,
        TableMeta(),
    )
    with contextlib.suppress(OSError):
        os.remove(_bm25_stats_stale_path(wh, index))


def compact_bm25_index(wh, index, n_files: int | None = None) -> None:
    """Fold the streaming DELTA segment into the term-clustered MAIN
    segment — the LSM segment merge: live postings (delta superseding
    main, tombstones resolved and dropped) are re-range-clustered by
    term and replace the main table; the delta is dropped; skipping
    sidecars and the exact stats row are rebuilt. One index-sized job
    over the ints-only postings — the corpus is never touched. After
    compaction every search is pure main-segment file skipping again.

    Not concurrent-safe with an active maintenance stream (the same
    boundary every warehouse maintenance fold documents): quiesce the
    stream for the fold. The union is pinned (localCheckpoint) before
    the self-overwrite — the compact barrier idiom. Crash-retry safe:
    a crash after the main overwrite but before the delta drop leaves
    delta ⊆ main, and the LSM view of that state equals the folded
    state (the mask removes exactly the rows the delta re-adds), so
    re-running the fold converges."""
    from edna_dbt_library_spark.sources.warehouse import TableMeta

    union = (
        _bm25_live_postings(wh, index)
        .where(F.col("term").isNotNull())
        .localCheckpoint(eager=True)
    )
    if n_files is not None:
        union = union.repartitionByRange(n_files, "term")
    else:
        union = union.repartitionByRange("term")
    wh.create_as(index, union, TableMeta(cluster_by=["term"]))
    delta_rel = _bm25_delta_rel(wh, index)
    if wh.exists(delta_rel):
        wh.drop(delta_rel)
    wh.refresh_zone_maps(index, ["term"])
    wh.refresh_bloom_sidecar(index, ["term"])
    refresh_bm25_stats(wh, index)


def bm25_topk_indexed(
    wh,
    index,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    max_df_frac: float | None = None,
) -> DataFrame:
    """Okapi BM25 top-k over a PERSISTED inverted index
    (:func:`build_bm25_index`) — identical results to ``bm25_topk`` on
    the same corpus (locked by test + the scored ``retrieval_scores``
    arm), but the corpus is never touched: postings are read through
    ``Warehouse.read_candidates``'s bloom/zone-map set-probe, so the
    scan opens only the files that may contain a probe term. Document
    frequency is EXACT from the probed postings (the candidate read is
    a superset per term, and the term join filters it), so no separate
    df table is maintained; (n_docs, avgdl) come from the one-row stats
    table the build wrote.

    Scale shape: query terms are a handful → candidate files ≈ one
    term-range file per term + bloom false positives; the only
    post-read shuffle is the per-(query, doc) score aggregation over
    matching postings — exactly the avoided-work contract of a search
    engine's posting-list traversal, expressed as Spark file skipping.

    Segments: when a streaming DELTA segment exists
    (``stream_bm25_index``), the search reads the LSM view — main
    candidates minus delta-superseded docs, plus delta candidates
    (``_bm25_live_postings``) — so searches between compactions stay
    row-accurate; ``compact_bm25_index`` folds the view back into pure
    main-segment file skipping."""
    qterms = query_terms(queries, text_col)
    terms = qterms.select("term").distinct()
    postings = _bm25_live_postings(wh, index, terms).join(
        F.broadcast(terms), "term"
    )
    # 3 consumers below (df count, probe join, contrib join): pin the
    # pruned postings once so the candidate probe is not re-run
    postings = postings.localCheckpoint(eager=False)
    df_t = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    stats = _derive_stats(
        wh.read(wh.relation(index.schema, index.identifier + "_stats"))
    )
    return _bm25_rank(postings, df_t, stats, qterms, k, k1, b, max_df_frac)


def tfidf_top_terms(
    documents: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-k characteristic terms by tf-idf
    (score = tf * ln(n_docs / df), rounded to 6 decimals, ties on term
    asc): the standard keyword-extraction / topic-fingerprinting tool
    over a corpus — what a curation pipeline uses to label clusters,
    audit domain mixes, and spot template families.

    Scale shape: the same single-shuffle tf+dl build as BM25, a
    map-side-combinable df aggregation, one term-keyed join back, and a
    per-document top-k window (each window sees only one document's
    distinct terms). No per-term contribution is ever SUMMED, so plain
    double rounding is deterministic here — there is no accumulation
    order to pin. Output: (doc_id, rank, term, score)."""
    tfdl = doc_term_freqs(documents, id_col, text_col)
    n_docs = tfdl.groupBy("doc_id").agg(F.lit(1).alias("_one")).agg(
        F.count(F.lit(1)).cast("double").alias("n_docs")
    )
    df_t = tfdl.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    scored = (
        tfdl.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "score")
    )


def _bigrams(toks: "F.Column") -> "F.Column":
    """Adjacent-pair composite keys via position-shifted slice+zip_with —
    the projection-collapse-immune gram construction (each array input
    evaluates once per row; see PLAN_AUDIT.md round-3 catch). TOTAL on
    short inputs: arrays of size < 2 yield [] (the greatest() guard —
    slice() throws on a negative length), so callers need no
    ``size >= 2`` pre-filter. That matters for cost, not just
    convenience: a filter on ``size(tokens(text))`` pushes below the
    bigram projection and re-derives the whole tokenize expression
    inside the predicate — one extra corpus-wide tokenize per consumer
    (measured 0.28s/eval on the sf0.1 corpus; explode([]) drops the
    short rows for free instead)."""
    n = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, n),
        F.slice(toks, 2, n),
        lambda a, c: F.concat(a, F.lit(BIGRAM_SEP), c),
    )


def bigram_model(
    documents: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the count model: returns (unigrams, bigrams, totals) as
    DataFrames — (w, c1), (bg, c2), and a single row (t_tokens, vocab).
    Pure counting, two map-side-combinable groupBys."""
    toks = documents.select(tokens(text_col).alias("_toks"))
    uni = (
        toks.select(F.explode("_toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    big = (
        toks.select(F.explode(_bigrams(F.col("_toks"))).alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    totals = uni.agg(
        F.sum("c1").cast("double").alias("t_tokens"),
        F.count(F.lit(1)).cast("double").alias("vocab"),
    )
    return uni, big, totals


def lm_cross_entropy(
    documents: DataFrame,
    train_documents: DataFrame | None = None,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_model: bool = False,
) -> DataFrame:
    """Per-document bigram cross-entropy against an add-alpha-smoothed
    LM trained on ``train_documents`` (default: the scored corpus
    itself): (doc_id, n_bigrams, cross_entropy).

    Probability model (interpolated add-alpha, never zero):
    ``p1(w) = (c1(w) + 1) / (T + V)`` (Laplace unigram, handles OOV),
    ``p(w2|w1) = (c2(w1,w2) + alpha * p1(w2)) / (c1(w1) + alpha)``
    — an unseen history backs off to exactly ``p1(w2)``. Score =
    mean of ``-ln p`` over the document's bigrams (docs with < 2
    tokens score NULL with n_bigrams = 0).

    Scale: scoring joins doc-bigram counts against the model on the
    bigram key (both sides shuffle-partition on it; cardinality is
    bounded by observed vocab², independent of corpus size) and the
    unigram backoff on w2 / history count on w1. Pass
    ``broadcast_model=True`` when the trained model is known to fit in
    the driver (small vocab) to turn all three into broadcast joins and
    leave the corpus unshuffled until the per-doc mean."""
    uni, big, totals = bigram_model(
        documents if train_documents is None else train_documents, text_col
    )
    hint = F.broadcast if broadcast_model else (lambda d: d)

    doc_bg = (
        documents.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("_toks"))
        .select("doc_id", F.explode(_bigrams(F.col("_toks"))).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "doc_id",
            "bg",
            "n",
            F.split_part(F.col("bg"), F.lit(BIGRAM_SEP), F.lit(1)).alias("w1"),
            F.split_part(F.col("bg"), F.lit(BIGRAM_SEP), F.lit(2)).alias("w2"),
        )
    )
    joined = (
        doc_bg.join(hint(big), "bg", "left")
        .join(hint(uni.select(F.col("w").alias("w1"), F.col("c1").alias("h1"))), "w1", "left")
        .join(hint(uni.select(F.col("w").alias("w2"), F.col("c1").alias("u2"))), "w2", "left")
        .crossJoin(F.broadcast(totals))
    )
    p1 = (F.coalesce(F.col("u2"), F.lit(0)) + 1.0) / (F.col("t_tokens") + F.col("vocab"))
    p = (F.coalesce(F.col("c2"), F.lit(0)) + alpha * p1) / (
        F.coalesce(F.col("h1"), F.lit(0)) + alpha
    )
    # Exact integer nano-nats end-to-end: the 9-dp rounded -ln(p) becomes
    # an exact BIGINT (decimal * 1e9), so the per-doc sum is exact and the
    # final 6-dp mean is a floor over exact integers — round(double, 6)
    # at the very end would sit on a systematic half-boundary (9-dp sums
    # divided by small n) where Spark's exact-decimal HALF_UP and
    # DuckDB's float-path round disagree. -ln(p) > 0 always (p < 1 by
    # construction: c2 <= c1 and p1 < 1), so no sign handling.
    units = (F.round(-F.log(p), 9).cast(_DEC) * F.lit(1_000_000_000)).cast("long")
    per_doc = joined.select("doc_id", "n", (units * F.col("n")).alias("nll_units")).groupBy(
        "doc_id"
    )
    s, nb = F.sum("nll_units"), F.sum("n")
    # half-away-from-zero mean in millionths: floor((2S + 1000N)/(2000N));
    # the double division is exact-floor-safe for ints far below 2^53
    millionths = F.floor((2 * s + 1000 * nb) / (2000.0 * nb)).cast("long")
    scored = per_doc.agg(
        nb.alias("n_bigrams"),
        (millionths / F.lit(1_000_000.0)).alias("cross_entropy"),
    )
    # docs with < 2 tokens (including NULL text, whose token array is
    # NULL — a bare size() predicate would drop the doc from BOTH
    # branches): present in the corpus, no bigram rows
    short = (
        documents.select(F.col(id_col).alias("doc_id"), tokens(text_col).alias("_toks"))
        .where((F.size("_toks") < 2) | F.col("_toks").isNull())
        .select(
            "doc_id",
            F.lit(0).cast("long").alias("n_bigrams"),
            F.lit(None).cast("double").alias("cross_entropy"),
        )
    )
    return scored.unionByName(short)
