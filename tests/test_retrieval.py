"""BM25 retrieval + bigram-LM cross-entropy (operators/retrieval.py):
hand-computed scores on tiny corpora, OOV/short-doc edges, and the
broadcast-model plan variant staying result-identical."""

import math

import pytest
from pyspark.sql import functions as F

from edna_dbt_library_spark.operators.retrieval import (
    BIGRAM_SEP,
    bigram_model,
    bm25_topk,
    doc_term_freqs,
    lm_cross_entropy,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark, rows):
    return spark.createDataFrame(rows, "query_id string, text string")


def _bm25_expected(corpus, qterms, k1=1.2, b=0.75):
    """Reference BM25 in plain Python (same formula, float math)."""
    toks = {d: t.lower().split() for d, t in corpus}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for d, t in toks.items():
        s = 0.0
        for term in set(qterms):
            tf = t.count(term)
            if tf == 0:
                continue
            df = sum(1 for tt in toks.values() if term in tt)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            contrib = idf * tf / (tf + k1 * (1 - b + b * len(t) / avgdl))
            s += round(contrib, 9)
        if s:
            out[d] = round(s, 6)
    return out


def test_bm25_matches_hand_computation(spark):
    corpus = [
        (1, "spark window agg window"),
        (2, "spark join"),
        (3, "merge batch merge merge"),
        (4, "window"),
    ]
    got = {
        r["doc_id"]: (r["rank"], r["score"])
        for r in bm25_topk(
            _docs(spark, corpus), _queries(spark, [("q", "spark window")]), k=10
        ).collect()
    }
    exp = _bm25_expected(corpus, ["spark", "window"])
    assert set(got) == set(exp)
    for d, score in exp.items():
        assert got[d][1] == pytest.approx(score, abs=1e-6)
    # doc 1 has both terms (one twice) — must outrank single-term docs
    assert got[1][0] == 1


def test_bm25_oov_and_tie_order(spark):
    corpus = [(1, "alpha beta"), (2, "alpha beta"), (3, "gamma")]
    docs = _docs(spark, corpus)
    # all-OOV query: no postings match -> no rows for that query
    rows = bm25_topk(docs, _queries(spark, [("oov", "zzz qqq")]), k=5).collect()
    assert rows == []
    # identical docs tie on score -> rank breaks on doc_id ascending
    r = bm25_topk(docs, _queries(spark, [("q", "alpha")]), k=5).collect()
    assert [(x["rank"], x["doc_id"]) for x in sorted(r, key=lambda x: x["rank"])] == [
        (1, 1),
        (2, 2),
    ]


def test_doc_term_freqs_single_scan_lengths(spark):
    tfdl = doc_term_freqs(_docs(spark, [(1, "a b a"), (2, "c")]))
    rows = {(r["doc_id"], r["term"]): (r["tf"], r["dl"]) for r in tfdl.collect()}
    assert rows == {(1, "a"): (2, 3), (1, "b"): (1, 3), (2, "c"): (1, 1)}


def _lm_expected(corpus, score_docs, alpha=0.5):
    """Reference bigram LM in plain Python, mirroring the exact-integer
    nano-nat pipeline (round 9dp -> integer units -> floored mean)."""
    toks = {d: t.lower().split() for d, t in corpus}
    c1, c2 = {}, {}
    for t in toks.values():
        for w in t:
            c1[w] = c1.get(w, 0) + 1
        for a, bb in zip(t, t[1:]):
            c2[(a, bb)] = c2.get((a, bb), 0) + 1
    T, V = sum(c1.values()), len(c1)
    out = {}
    for d, t in score_docs:
        ws = t.lower().split()
        if len(ws) < 2:
            out[d] = (0, None)
            continue
        units = 0
        for a, bb in zip(ws, ws[1:]):
            p1 = (c1.get(bb, 0) + 1.0) / (T + V)
            p = (c2.get((a, bb), 0) + alpha * p1) / (c1.get(a, 0) + alpha)
            units += round(round(-math.log(p), 9) * 1_000_000_000)
        n = len(ws) - 1
        out[d] = (n, math.floor((2 * units + 1000 * n) / (2000.0 * n)) / 1e6)
    return out


def test_lm_cross_entropy_matches_hand_computation(spark):
    corpus = [(1, "a b a b c"), (2, "a b a"), (3, "c c c"), (4, "solo")]
    got = {
        r["doc_id"]: (r["n_bigrams"], r["cross_entropy"])
        for r in lm_cross_entropy(_docs(spark, corpus)).collect()
    }
    exp = _lm_expected(corpus, corpus)
    assert set(got) == set(exp)
    for d, (n, ce) in exp.items():
        assert got[d][0] == n
        if ce is None:
            assert got[d][1] is None
        else:
            assert got[d][1] == pytest.approx(ce, abs=1e-9)
    # the common-pattern doc must score lower entropy than the rare one
    assert got[1][1] < got[3][1]


def test_lm_train_split_and_oov_backoff(spark):
    train = _docs(spark, [(1, "a b a b"), (2, "b a b a")])
    # score a doc whose history word never appears in training: the
    # conditional must back off to exactly p1(w2)
    score = _docs(spark, [(9, "zzz a")])
    row = lm_cross_entropy(score, train_documents=train).collect()[0]
    exp = _lm_expected([(1, "a b a b"), (2, "b a b a")], [(9, "zzz a")])
    assert (row["n_bigrams"], row["cross_entropy"]) == (
        exp[9][0],
        pytest.approx(exp[9][1], abs=1e-9),
    )


def test_lm_null_and_empty_text_docs_kept_as_unscored(spark):
    """NULL/empty text must yield (doc_id, 0, NULL), not silently vanish
    (tokens(NULL) is a NULL array whose size() fails both branch
    predicates without the explicit isNull arm)."""
    docs = spark.createDataFrame([(1, None), (2, ""), (3, "a b")], "doc_id long, text string")
    rows = {r["doc_id"]: (r["n_bigrams"], r["cross_entropy"]) for r in lm_cross_entropy(docs).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1] == (0, None) and rows[2] == (0, None)
    assert rows[3][0] == 1 and rows[3][1] is not None


def test_lm_broadcast_model_identical(spark):
    corpus = [(i, f"w{i % 3} w{(i + 1) % 3} w{i % 5} end") for i in range(40)]
    docs = _docs(spark, corpus)
    plain = sorted(map(tuple, lm_cross_entropy(docs).collect()))
    bcast = sorted(map(tuple, lm_cross_entropy(docs, broadcast_model=True).collect()))
    assert plain == bcast


def test_bigram_model_counts(spark):
    uni, big, totals = bigram_model(_docs(spark, [(1, "a b a"), (2, "b b")]))
    assert {(r["w"], r["c1"]) for r in uni.collect()} == {("a", 2), ("b", 3)}
    assert {(r["bg"], r["c2"]) for r in big.collect()} == {
        (f"a{BIGRAM_SEP}b", 1),
        (f"b{BIGRAM_SEP}a", 1),
        (f"b{BIGRAM_SEP}b", 1),
    }
    t = totals.collect()[0]
    assert (t["t_tokens"], t["vocab"]) == (5.0, 2.0)


def test_tfidf_top_terms_hand_check(spark):
    from edna_dbt_library_spark.operators.retrieval import tfidf_top_terms

    corpus = [
        (1, "apple apple banana"),
        (2, "banana cherry"),
        (3, "cherry cherry cherry dates"),
    ]
    rows = tfidf_top_terms(_docs(spark, corpus), k=2).collect()
    got = {(r["doc_id"], r["rank"]): (r["term"], r["score"]) for r in rows}
    n = 3.0
    # doc 1: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5)
    assert got[(1, 1)] == ("apple", pytest.approx(round(2 * math.log(3), 6)))
    assert got[(1, 2)] == ("banana", pytest.approx(round(math.log(1.5), 6)))
    # doc 3: cherry tf=3 df=2 -> 3*ln(1.5)=1.216...; dates tf=1 df=1 -> ln(3)=1.0986
    assert got[(3, 1)] == ("cherry", pytest.approx(round(3 * math.log(1.5), 6)))
    assert got[(3, 2)] == ("dates", pytest.approx(round(math.log(3), 6)))
    # doc 2: equal scores (both ln(1.5)) -> tie broken on term asc
    assert got[(2, 1)][0] == "banana" and got[(2, 2)][0] == "cherry"


def test_bm25_max_df_frac_drops_stop_terms(spark):
    from edna_dbt_library_spark.operators.retrieval import bm25_topk as _bm25

    # "the" appears in every doc (df frac 1.0); "rare" in one
    corpus = [(i, f"the filler w{i}" + (" rare" if i == 2 else "")) for i in range(1, 6)]
    docs = _docs(spark, corpus)
    q = _queries(spark, [("q", "the rare")])
    full = {r["doc_id"]: r["score"] for r in _bm25(docs, q, k=10).collect()}
    capped = {r["doc_id"]: r["score"] for r in _bm25(docs, q, k=10, max_df_frac=0.5).collect()}
    # without the guard every doc matches via "the"; with it only the
    # rare-term doc scores, and its score drops by exactly the (tiny)
    # stop-term contribution
    assert set(full) == {1, 2, 3, 4, 5} and set(capped) == {2}
    assert capped[2] <= full[2]


# --- persisted inverted index (build_bm25_index / bm25_topk_indexed) -------


def _indexed_fixture(spark, tmp_path, n_docs=400, n_files=8):
    """A corpus whose terms are range-separable (so the term-clustered
    index layout actually skips files) plus a couple of shared terms."""
    from edna_dbt_library_spark.sources.warehouse import Warehouse

    rows = [
        (
            d,
            f"t{d % 97:03d} t{(d * 7) % 97:03d} shared"
            + (" rareterm" if d == 13 else ""),
        )
        for d in range(n_docs)
    ]
    docs = _docs(spark, rows)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    idx = wh.relation("ix", "bm25")
    return wh, idx, docs, n_files


def test_bm25_indexed_equals_per_call(spark, tmp_path):
    """The persisted-index search must be BIT-IDENTICAL to the per-call
    build on the same corpus — both paths share _bm25_rank, df is exact
    from the probed postings, and (n_docs, avgdl) roundtrip the stats
    table."""
    from edna_dbt_library_spark.operators.retrieval import (
        bm25_topk_indexed,
        build_bm25_index,
    )

    wh, idx, docs, n_files = _indexed_fixture(spark, tmp_path)
    build_bm25_index(wh, idx, docs, n_files=n_files)
    qs = _queries(
        spark,
        [("q1", "t013 rareterm"), ("q2", "shared t042"), ("q3", "zzz_oov")],
    )
    a = sorted(map(tuple, bm25_topk(docs, qs, k=7).collect()))
    bdf = bm25_topk_indexed(wh, idx, qs, k=7)
    assert sorted(map(tuple, bdf.collect())) == a
    # max_df_frac drops the stop term on both paths identically
    a2 = sorted(map(tuple, bm25_topk(docs, qs, k=7, max_df_frac=0.5).collect()))
    b2 = bm25_topk_indexed(wh, idx, qs, k=7, max_df_frac=0.5)
    assert sorted(map(tuple, b2.collect())) == a2


def test_bm25_indexed_probe_skips_files(spark, tmp_path):
    """A rare-term probe must open a strict subset of the postings
    files (the whole point of the persisted index): candidate files
    via the bloom set-probe < live files, and the search plan's input
    files match that subset."""
    from edna_dbt_library_spark.operators.retrieval import build_bm25_index

    wh, idx, docs, n_files = _indexed_fixture(spark, tmp_path)
    build_bm25_index(wh, idx, docs, n_files=n_files)
    wh.BLOOM_PROBE_MIN_FILES = 1  # tiny fixture: force the probe path
    live = wh._live_data_files(idx)
    assert len(live) >= 4  # layout actually sharded
    probe = spark.createDataFrame([("rareterm",)], "term string")
    cand = wh.bloom_candidate_files(idx, "term", probe)
    assert cand is not None and 0 < len(cand) < len(live)
    sub = wh.read_candidates(idx, "term", probe)
    assert 0 < len(sub.inputFiles()) < len(live)
    # fail-safe superset: the rare term's postings are all there
    assert sub.where(F.col("term") == "rareterm").count() == 1


def test_bm25_indexed_stale_files_fail_safe(spark, tmp_path):
    """Postings appended AFTER the sidecar refresh are unindexed and
    must always be candidates — the search stays correct on a stale
    index (append-only staleness), matching the warehouse's fail-safe
    superset contract."""
    from edna_dbt_library_spark.operators.retrieval import (
        bm25_topk_indexed,
        build_bm25_index,
        doc_term_freqs,
    )

    wh, idx, docs, n_files = _indexed_fixture(spark, tmp_path)
    build_bm25_index(wh, idx, docs, n_files=n_files)
    wh.BLOOM_PROBE_MIN_FILES = 1
    extra = _docs(spark, [(9001, "brandnewterm shared")])
    wh.append(idx, doc_term_freqs(extra).coalesce(1))
    # NOTE: stats table intentionally NOT updated -> compare against a
    # per-call run that uses the STALE stats to isolate the file-skip
    # behavior (a real rebuild re-runs build_bm25_index)
    qs = _queries(spark, [("q", "brandnewterm")])
    got = bm25_topk_indexed(wh, idx, qs, k=3).collect()
    assert [r["doc_id"] for r in got] == [9001]


def test_read_candidates_full_read_when_no_index(spark, tmp_path):
    """read_candidates degrades to read() when neither sidecar exists
    or the table is under the probe gate — never an error, never a
    wrong subset."""
    from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh2"))
    rel = wh.relation("s", "plain")
    wh.create_as(
        rel, spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"),
        TableMeta(),
    )
    probe = spark.createDataFrame([(1,)], "k long")
    assert wh.read_candidates(rel, "k", probe).count() == 2


def test_append_to_bm25_index_equals_union_rebuild(spark, tmp_path):
    """Incremental index maintenance: build on half the corpus, append
    the other half — the indexed search must be BIT-IDENTICAL to the
    per-call build over the UNION (postings complete; exact long stats
    sum associatively; bloom/zone-map refreshes are incremental)."""
    from edna_dbt_library_spark.operators.retrieval import (
        append_to_bm25_index,
        bm25_topk_indexed,
        build_bm25_index,
        corpus_stats_exact,
    )

    wh, idx, docs, n_files = _indexed_fixture(spark, tmp_path)
    base = docs.where(F.col("doc_id") % 2 == 0)
    extra = docs.where(F.col("doc_id") % 2 == 1)
    build_bm25_index(wh, idx, base, n_files=n_files)
    append_to_bm25_index(wh, idx, extra)

    # stats row == from-scratch exact stats over the union
    got = wh.read(wh.relation("ix", "bm25_stats")).first()
    want = corpus_stats_exact(docs).first()
    assert (got["n_docs"], got["sum_dl"]) == (want["n_docs"], want["sum_dl"])

    qs = _queries(
        spark, [("q1", "t013 rareterm"), ("q2", "shared t042"), ("q3", "zzz")]
    )
    a = sorted(map(tuple, bm25_topk(docs, qs, k=7).collect()))
    b = sorted(map(tuple, bm25_topk_indexed(wh, idx, qs, k=7).collect()))
    assert a == b

    # second append keeps the invariant (associativity across history)
    more = _docs(spark, [(9001, "rareterm shared t013")])
    append_to_bm25_index(wh, idx, more, refresh_skipping=False)
    union = docs.unionAll(more)
    a2 = sorted(map(tuple, bm25_topk(union, qs, k=7).collect()))
    b2 = sorted(map(tuple, bm25_topk_indexed(wh, idx, qs, k=7).collect()))
    assert a2 == b2


def test_stream_bm25_index_drain_equals_batch_build(spark, tmp_path):
    """Streaming maintenance gate (LSM design): a full availableNow
    drain of stream_bm25_index plus the refresh_bm25_stats finalizer
    must leave the index search BIT-IDENTICAL to the per-call build
    over the source's current documents; a re-streamed edit REPLACES
    its postings via the delta segment (never a main-segment key
    scan); a zero-token re-ingest TOMBSTONES the doc; and
    compact_bm25_index folds everything back into a pure, clean main
    segment with identical search results."""
    from edna_dbt_library_spark.operators.retrieval import (
        _bm25_delta_rel,
        _bm25_live_postings,
        bm25_topk_indexed,
        compact_bm25_index,
        refresh_bm25_stats,
    )
    from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse
    from edna_dbt_library_spark.streaming.incremental_stream import (
        stream_bm25_index,
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = wh.relation("docs", "corpus")
    rows = [
        (d, f"t{d % 23:02d} t{(d * 5) % 23:02d} shared") for d in range(120)
    ]
    wh.create_as(src, _docs(spark, rows).coalesce(2), TableMeta())
    idx = wh.relation("ix", "bm25s")
    cp = str(tmp_path / "cp")

    q = stream_bm25_index(wh, src, idx, cp)
    q.awaitTermination()
    refresh_bm25_stats(wh, idx)

    probes = _queries(spark, [("q1", "t07 shared"), ("q2", "t19")])
    want = sorted(map(tuple, bm25_topk(_docs(spark, rows), probes, k=5).collect()))
    got = sorted(map(tuple, bm25_topk_indexed(wh, idx, probes, k=5).collect()))
    assert got == want

    # new docs + an EDIT of doc 7 + doc 11 re-ingested EMPTY (delete)
    edit = [(7, "editedterm shared"), (9001, "t07 t19 shared"), (11, "")]
    wh.append(src, _docs(spark, edit).coalesce(1))
    q = stream_bm25_index(wh, src, idx, cp)
    q.awaitTermination()
    refresh_bm25_stats(wh, idx)

    current = {d: t for d, t in rows}
    current.update({d: t for d, t in edit})
    del current[11]  # zero-token doc: per-call excludes it entirely
    corpus = _docs(spark, sorted(current.items()))
    probes2 = _queries(
        spark, [("q1", "t07 shared"), ("q2", "editedterm"), ("q3", "t19")]
    )
    want2 = sorted(map(tuple, bm25_topk(corpus, probes2, k=5).collect()))
    got2 = sorted(map(tuple, bm25_topk_indexed(wh, idx, probes2, k=5).collect()))
    assert got2 == want2
    # the edit really replaced and the tombstone really masks: no old
    # doc-7 terms and no doc-11 rows in the LIVE view
    live = _bm25_live_postings(wh, idx).where(F.col("term").isNotNull())
    assert live.where(
        (F.col("doc_id") == 7) & (F.col("term") != "editedterm")
        & (F.col("term") != "shared")
    ).count() == 0
    assert live.where(F.col("doc_id") == 11).count() == 0
    # delta really carries the stream (main untouched by doc_id probes)
    assert wh.read(_bm25_delta_rel(wh, idx)).count() > 0

    # crashed segment merge: main folded but the delta drop never ran
    # (delta ⊆ main) — the LSM view must equal the folded state, and a
    # retry must converge (compact_bm25_index docstring contract)
    from edna_dbt_library_spark.sources.warehouse import TableMeta as _TM

    union = (
        _bm25_live_postings(wh, idx)
        .where(F.col("term").isNotNull())
        .localCheckpoint(eager=True)
    )
    wh.create_as(idx, union.repartitionByRange(4, "term"), _TM(cluster_by=["term"]))
    assert wh.exists(_bm25_delta_rel(wh, idx))  # the "crash" left it
    got_crash = sorted(map(tuple, bm25_topk_indexed(wh, idx, probes2, k=5).collect()))
    assert got_crash == want2

    # segment merge (retry): identical results from a pure main segment
    compact_bm25_index(wh, idx, n_files=4)
    assert not wh.exists(_bm25_delta_rel(wh, idx))
    assert wh.read(idx).where(F.col("term").isNull()).count() == 0
    assert wh.read(idx).where(F.col("doc_id") == 11).count() == 0
    got3 = sorted(map(tuple, bm25_topk_indexed(wh, idx, probes2, k=5).collect()))
    assert got3 == want2
