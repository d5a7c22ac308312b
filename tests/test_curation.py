"""Curation operators: deterministic sampling, sequence packing,
benchmark decontamination."""

from pyspark.sql import functions as F

from edna_dbt_library_spark.operators.curation import (
    contamination_flags,
    deterministic_sample,
    hash_permille,
    pack_sequences,
)

import pytest


def _ids(spark, n=2000):
    return spark.range(n).withColumnRenamed("id", "k")


def test_sample_rate_is_approximately_honored(spark):
    kept = deterministic_sample(_ids(spark), "k", 250).count()
    assert 0.2 < kept / 2000 < 0.3


def test_sample_is_stable_under_repartitioning(spark):
    df = _ids(spark)
    a = {r["k"] for r in deterministic_sample(df, "k", 100).collect()}
    b = {r["k"] for r in deterministic_sample(df.repartition(17), "k", 100).collect()}
    assert a == b and len(a) > 0


def test_sample_edge_rates_and_arg_validation(spark):
    df = _ids(spark, 100)
    assert deterministic_sample(df, "k", 0).count() == 0
    assert deterministic_sample(df, "k", 1000).count() == 100
    with pytest.raises(ValueError):
        deterministic_sample(df, "k")
    with pytest.raises(ValueError):
        deterministic_sample(df, "k", 10, strata_rates={"a": 1})


def test_sample_stratified_rates(spark):
    df = spark.createDataFrame(
        [(i, "hot" if i % 2 else "cold") for i in range(1000)], "k long, s string"
    )
    out = deterministic_sample(
        df, "k", strata_col="s", strata_rates={"hot": 1000}, default_rate_permille=0
    )
    rows = out.collect()
    assert len(rows) == 500 and all(r["s"] == "hot" for r in rows)


def test_pack_sequences_exact_math(spark):
    # one shard so the running order is just doc_id order
    docs = spark.createDataFrame([(i, "") for i in range(1, 6)], "doc_id long, text string")
    counts = {1: 100, 2: 300, 3: 200, 4: 50, 5: 500}
    tok = F.element_at(
        F.create_map(*[F.lit(x) for kv in counts.items() for x in kv]), F.col("doc_id")
    )
    out = {
        r["doc_id"]: (r["seq_id"], r["seq_offset"], r["n_tokens"])
        for r in pack_sequences(docs, tok, 512, 1).collect()
    }
    # cumulative starts: 0, 100, 400, 600, 650
    assert out[1] == (0, 0, 100)
    assert out[2] == (0, 100, 300)
    assert out[3] == (0, 400, 200)  # crosses the 512 boundary but STARTS in seq 0
    assert out[4] == (1, 88, 50)  # 600 = 512 + 88
    assert out[5] == (1, 138, 500)


def test_pack_sequences_sharding_balances_and_is_deterministic(spark):
    docs = spark.range(1000).select(F.col("id").alias("doc_id"), F.lit("").alias("text"))
    out = pack_sequences(docs, F.lit(10), 100, 8)
    per_shard = {r["shard"]: r["n"] for r in out.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    assert set(per_shard) == set(range(8))
    assert max(per_shard.values()) < 2 * min(per_shard.values())
    again = pack_sequences(docs.repartition(13), F.lit(10), 100, 8)
    assert out.exceptAll(again).count() == 0 and again.exceptAll(out).count() == 0


def _contam_fixture(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),  # shares 'quick brown fox' with bench
            (2, "totally different words here"),
            (3, "a quick brown fox appears twice quick brown fox"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "one quick brown fox ran away")], "doc_id long, text string"
    )
    return docs, bench


def test_contamination_hits_and_counts(spark):
    docs, bench = _contam_fixture(spark)
    got = {r["doc_id"]: r["n_hits"] for r in contamination_flags(docs, bench, n=3).collect()}
    assert got == {1: 1, 3: 1}  # doc 2 clean; doc 3's repeat counts once (distinct)


def test_contamination_benchmark_is_broadcast(spark):
    docs, bench = _contam_fixture(spark)
    plan = contamination_flags(docs, bench, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_hash_permille_range(spark):
    vals = [r["p"] for r in _ids(spark, 500).select(hash_permille(F.col("k")).alias("p")).collect()]
    assert all(0 <= v < 1000 for v in vals)
    assert len(set(vals)) > 300  # spreads


def _domains(spark):
    # 600 a / 300 b / 100 c — a is the oversized domain
    return (
        spark.range(1000)
        .withColumnRenamed("id", "k")
        .withColumn(
            "dom",
            F.when(F.col("k") < 600, "a").when(F.col("k") < 900, "b").otherwise("c"),
        )
    )


def test_domain_mix_binding_domain_keeps_everything(spark):
    from edna_dbt_library_spark.operators.curation import domain_mix_sample

    # weights make c the binding domain: scale = min(600/.4, 300/.3, 100/.3) = 333.3
    kept = domain_mix_sample(_domains(spark), "k", "dom", {"a": 0.4, "b": 0.3, "c": 0.3})
    by_dom = {r["dom"]: r["n"] for r in kept.groupBy("dom").agg(F.count("*").alias("n")).collect()}
    assert by_dom["c"] == 100  # rate 1000 — binding domain fully kept
    # thinned domains land near w*scale = 133.3 / 100.0 (hash-coin tolerance)
    assert abs(by_dom["a"] - 133) < 40 and abs(by_dom["b"] - 100) < 35


def test_domain_mix_drops_unlisted_domains_and_is_deterministic(spark):
    from edna_dbt_library_spark.operators.curation import domain_mix_sample

    df = _domains(spark)
    kept = domain_mix_sample(df, "k", "dom", {"a": 0.5, "b": 0.5})
    assert kept.where(F.col("dom") == "c").count() == 0
    a = {r["k"] for r in kept.collect()}
    b = {r["k"] for r in domain_mix_sample(df.repartition(13), "k", "dom", {"a": 0.5, "b": 0.5}).collect()}
    assert a == b and len(a) > 0
    assert kept.columns == df.columns  # original column order preserved


# ---------------------------------------------------------------------------
# incremental dedup (batch vs persistent fingerprint store)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_dedup_across_batches_and_replay(spark, tmp_path):
    from edna_dbt_library_spark.operators.dedup import run_incremental_dedup
    from edna_dbt_library_spark.sources import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    store = wh.relation("dedup", "fps")

    b1 = _docs(spark, [(1, "hello world"), (2, "Hello   WORLD"), (3, "unique one")])
    a1 = run_incremental_dedup(wh, store, b1)
    ids1 = sorted(r["doc_id"] for r in a1.collect())
    assert ids1 == [1, 3]  # 2 is a normalized dup of 1; min-id keeper wins

    # batch 2: one cross-batch dup, one new
    b2 = _docs(spark, [(4, "hello world"), (5, "fresh text")])
    a2 = run_incremental_dedup(wh, store, b2)
    assert sorted(r["doc_id"] for r in a2.collect()) == [5]

    # replaying batch 2 admits nothing (idempotent ingestion)
    a3 = run_incremental_dedup(wh, store, b2)
    assert a3.count() == 0

    # store holds exactly one row per unique fingerprint ever admitted
    stored = wh.read(store)
    assert stored.count() == stored.select("fp").distinct().count() == 3


def test_chunk_documents_boundaries_and_reassembly(spark):
    from edna_dbt_library_spark.operators.curation import chunk_documents

    text = "abcdefghijklmnopqrstuvwxyz"  # 26 chars
    df = _docs(spark, [(1, text)])
    rows = sorted(chunk_documents(df, 10, 3).collect(), key=lambda r: r["chunk_id"])
    # stride 7: starts 0,7,14,21 -> ceil((26-3)/7)=4 chunks
    assert [r["chunk_start"] for r in rows] == [0, 7, 14, 21]
    assert [r["chunk_text"] for r in rows] == [text[0:10], text[7:17], text[14:24], text[21:26]]
    # consecutive chunks overlap by exactly 3 chars
    for a, b in zip(rows, rows[1:]):
        assert a["chunk_text"][-3:] == b["chunk_text"][:3]
    # stride-concatenation reassembles the document exactly
    assert rows[0]["chunk_text"] + "".join(r["chunk_text"][3:] for r in rows[1:]) == text


def test_chunk_documents_short_empty_and_validation(spark):
    from edna_dbt_library_spark.operators.curation import chunk_documents

    df = _docs(spark, [(1, "ab"), (2, ""), (3, None)])
    rows = chunk_documents(df, 10, 5).collect()
    # doc shorter than the overlap still yields its single short chunk;
    # empty/NULL docs yield nothing
    assert len(rows) == 1 and rows[0]["doc_id"] == 1 and rows[0]["chunk_text"] == "ab"
    with pytest.raises(ValueError):
        chunk_documents(df, 10, 10)


def test_fast_hash_flag_speeds_shingles_without_changing_semantics(spark, monkeypatch):
    """SPARK_GRAFT_FAST_HASH swaps the shingle hash (md5 chain ->
    xxhash64): contamination output is identical on collision-free data,
    the sampling coin is PINNED to md5 (membership never moves with a perf
    flag), and the fast expression contains no md5 call."""
    from edna_dbt_library_spark.operators.dedup import minhash_word_value
    from edna_dbt_library_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    bench = docs.where(F.col("doc_id") % 10 == 0)
    corpus = docs.where(F.col("doc_id") % 10 != 0)

    base = {
        (r["doc_id"], r["n_hits"])
        for r in contamination_flags(corpus, bench, n=3).collect()
    }
    coin_base = {r["k"] for r in deterministic_sample(_ids(spark), "k", 100).collect()}

    monkeypatch.setenv("SPARK_GRAFT_FAST_HASH", "1")
    fast = {
        (r["doc_id"], r["n_hits"])
        for r in contamination_flags(corpus, bench, n=3).collect()
    }
    assert fast == base and len(base) > 0
    coin_fast = {r["k"] for r in deterministic_sample(_ids(spark), "k", 100).collect()}
    assert coin_fast == coin_base

    # the fast expression is md5-free and stays in the 60-bit range
    expr = str(minhash_word_value(F.lit("w"))._jc)
    assert "md5" not in expr and "xxhash64" in expr
    row = spark.range(1).select(
        minhash_word_value(F.lit("hello")).alias("h")
    ).collect()[0]
    assert 0 <= row["h"] < (1 << 60)


def test_repetition_stats_hand_computed(spark):
    from edna_dbt_library_spark.operators.curation import repetition_stats

    # "a b\na b\nc d": lines [a b, a b, c d] -> dup 2/3 instances; dup line
    # chars 6 over len(text)=11 (Gopher A1 denominator is ALL doc chars);
    # words a b a b c d -> top 2-gram "a b" x2 -> 2*3=6 chars of 11
    df = spark.createDataFrame([(1, "a b\na b\nc d")], "doc_id int, text string")
    r = repetition_stats(df).collect()[0]
    assert r["dup_line_frac"] == 2 / 3
    assert r["dup_line_char_frac"] == 6 / 11
    assert r["top_2gram_char_frac"] == 6 / 11
    assert r["dup_5gram_char_frac"] == 0.0


def test_repetition_itemless_docs_get_zero_rows(spark):
    """Every input doc gets a row: whitespace-only / NULL-text docs score
    0.0 on all signals and keep=True instead of silently vanishing."""
    from edna_dbt_library_spark.operators.curation import repetition_filter

    df = spark.createDataFrame(
        [(1, "  \n \n  "), (2, None), (3, ""), (4, "normal text here")],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_filter(df).collect()}
    assert set(rows) == {1, 2, 3, 4}
    for d in (1, 2, 3):
        assert rows[d]["keep"] is True
        assert rows[d]["dup_line_frac"] == 0.0
        assert rows[d]["dup_5gram_char_frac"] == 0.0


def test_repetition_dup_5gram_caps_at_one(spark):
    from edna_dbt_library_spark.operators.curation import repetition_stats

    # 6 x "x": both 5-grams are "x x x x x" (2 occurrences, 9 chars each)
    # -> 18/11 uncapped -> 1.0
    df = spark.createDataFrame([(1, "x x x x x x")], "doc_id int, text string")
    r = repetition_stats(df).collect()[0]
    assert r["dup_5gram_char_frac"] == 1.0


def test_repetition_short_doc_scores_zero_not_error(spark):
    from edna_dbt_library_spark.operators.curation import repetition_stats

    # 1 word: no 2..5-grams at all; single line occurs once
    df = spark.createDataFrame([(1, "hello")], "doc_id int, text string")
    r = repetition_stats(df).collect()[0]
    assert r["dup_line_frac"] == 0.0
    for n in (2, 3, 4):
        assert r[f"top_{n}gram_char_frac"] == 0.0
    assert r["dup_5gram_char_frac"] == 0.0


def test_repetition_filter_keep_flag_and_thresholds(spark):
    from edna_dbt_library_spark.operators.curation import repetition_filter

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam"),
            # long enough that the top n-gram (count 1 everywhere) covers
            # only a small char fraction — short docs legitimately fail the
            # top-n-gram signal, as in the published filter
            (2, "a quiet brown fox jumped over the lazy dog near riverbanks today "
                "while scattered autumn leaves drifted slowly across cold meadows "
                "under pale morning light and distant church bells rang softly "
                "then children walked home through narrow cobbled streets carrying "
                "warm bread from the corner bakery as evening settled gently over "
                "rooftops and gardens filled with late blooming chrysanthemums"),
        ],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r["keep"] for r in repetition_filter(df).collect()}
    assert got == {1: False, 2: True}
    # custom thresholds override; unknown signal names are rejected
    loose = {r["doc_id"]: r["keep"] for r in repetition_filter(df, thresholds=dict.fromkeys(
        ("dup_line_frac", "dup_line_char_frac", "top_2gram_char_frac",
         "top_3gram_char_frac", "top_4gram_char_frac", "dup_5gram_char_frac"), 10.0)).collect()}
    assert loose == {1: True, 2: True}
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unknown repetition signals"):
        repetition_filter(df, thresholds={"nope": 0.1})


def test_repetition_stats_stable_under_repartitioning(spark):
    from edna_dbt_library_spark.operators.curation import repetition_stats

    from edna_dbt_library_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    a = sorted(map(tuple, repetition_stats(docs).collect()))
    b = sorted(map(tuple, repetition_stats(docs.repartition(7)).collect()))
    assert a == b


def test_dedup_lines_across_docs_semantics(spark):
    """Boilerplate line survives only at min (doc_id, pos); short lines
    bypass; docs rebuilt in order; total coverage incl. all-dup docs."""
    from edna_dbt_library_spark.operators.curation import dedup_lines_across_docs

    boiler = "subscribe to our newsletter today"
    df = spark.createDataFrame(
        [
            (1, f"unique first line\n{boiler}\nshort\nanother unique line"),
            (2, f"{boiler}\ndifferent content here entirely"),
            (3, boiler),
            (4, None),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dedup_lines_across_docs(df, min_line_chars=10).collect()}
    assert set(rows) == {1, 2, 3}  # NULL text dropped, all-dup doc kept
    # doc 1 holds the first occurrence (pos 1) -> keeps everything
    assert rows[1]["text_deduped"] == f"unique first line\n{boiler}\nshort\nanother unique line"
    assert (rows[1]["n_lines"], rows[1]["n_kept"]) == (4, 4)
    # doc 2 loses the boilerplate line but keeps its own content
    assert rows[2]["text_deduped"] == "different content here entirely"
    assert (rows[2]["n_lines"], rows[2]["n_kept"]) == (2, 1)
    # doc 3 was nothing but boilerplate -> empty rebuild, still present
    assert rows[3]["text_deduped"] == "" and rows[3]["n_kept"] == 0


def test_dedup_lines_short_line_bypass_and_determinism(spark):
    from edna_dbt_library_spark.operators.curation import dedup_lines_across_docs

    df = spark.createDataFrame(
        [(1, "short\nshort\nshort"), (2, "short")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in dedup_lines_across_docs(df, min_line_chars=10).collect()}
    # 'short' < 10 chars: never deduplicated, even within one doc
    assert rows[1]["n_kept"] == 3 and rows[2]["n_kept"] == 1
    a = sorted(map(tuple, dedup_lines_across_docs(df).collect()))
    b = sorted(map(tuple, dedup_lines_across_docs(df.repartition(4)).collect()))
    assert a == b
    import pytest as _pytest
    with _pytest.raises(ValueError, match="min_line_chars"):
        dedup_lines_across_docs(df, min_line_chars=-1)


def test_curation_verdict_fused_single_scan(spark):
    """The fused production verdict matches the per-family operators
    value-for-value AND its plan is one scan with no keyed shuffle
    exchanges and no joins. The r13 scale-adaptive fan-out may add ONE
    round-robin exchange of the compact input rows on an under-parallel
    scan (it is a no-op at real scale, where the scan has >= cores
    files); that is the only exchange kind permitted. The input is
    pinned via localCheckpoint so the limit does not itself plan a
    SinglePartition exchange under the fan-out."""
    import re

    from edna_dbt_library_spark.functions.text import lang_id, pii_flags, quality_score
    from edna_dbt_library_spark.operators.curation import curation_verdict, repetition_filter
    from edna_dbt_library_spark.sources import load_table

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .limit(100)
        .localCheckpoint(eager=True)
    )
    v = curation_verdict(docs)
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert not re.search(r"(?<!Broadcast)(?<!Reused)Exchange (hash|range|Single)", plan), plan
    assert "Join" not in plan, plan
    rows = {r["doc_id"]: r for r in v.collect()}
    # repetition family agrees with the standalone operator
    rep = {r["doc_id"]: r for r in repetition_filter(docs).collect()}
    assert set(rows) == set(rep)
    for d, r in rows.items():
        assert r["dup_line_frac"] == rep[d]["dup_line_frac"]
        assert r["dup_5gram_char_frac"] == rep[d]["dup_5gram_char_frac"]
        assert r["keep_repetition"] == rep[d]["keep"]
    # scan-side families agree with the granular Column builders
    flags = pii_flags(F.col("text"))
    base = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            lang_id(F.col("text")).alias("pl"),
            quality_score(F.col("text")).alias("q"),
            flags["has_email"].alias("he"),
        ).collect()
    }
    for d, r in rows.items():
        assert (r["pred_lang"], r["quality"], r["has_email"]) == (
            base[d]["pl"], base[d]["q"], base[d]["he"])


def test_incremental_passage_dedup_across_batches(spark, tmp_path):
    from edna_dbt_library_spark.operators.dedup import run_incremental_passage_dedup
    from edna_dbt_library_spark.sources import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    store = wh.relation("dedup", "passage_fps")
    passage = ("the quick brown fox jumps over the lazy dog while distant "
               "church bells rang softly across the cold evening meadows")

    # batch 1: docs 1 and 2 share the passage (in-batch near-dup, min id
    # wins); doc 3 is independent
    b1 = _docs(spark, [
        (1, f"original article intro {passage} original article outro"),
        (2, f"reposted with new frame {passage} totally new comments below"),
        (3, "independent content with no shared passages whatsoever in it"),
    ])
    a1 = sorted(r["doc_id"] for r in run_incremental_passage_dedup(wh, store, b1).collect())
    assert a1 == [1, 3]

    # batch 2: doc 4 re-quotes the stored passage -> rejected; doc 5 fresh
    b2 = _docs(spark, [
        (4, f"a brand new wrapper around {passage} and some fresh words"),
        (5, "genuinely novel text that overlaps nothing stored so far okay"),
    ])
    a2 = sorted(r["doc_id"] for r in run_incremental_passage_dedup(wh, store, b2).collect())
    assert a2 == [5]

    # replaying batch 2 admits nothing (full-containment rule)
    a3 = run_incremental_passage_dedup(wh, store, b2)
    assert a3.count() == 0

    # the store's hash mode is PINNED: flipping the session-level fast-hash
    # env var between runs must NOT change the store fingerprints, or every
    # membership join would silently match nothing and admit all dups
    import os

    from edna_dbt_library_spark.operators.dedup import FAST_HASH_ENV

    old = os.environ.get(FAST_HASH_ENV)
    os.environ[FAST_HASH_ENV] = "1"
    try:
        a4 = run_incremental_passage_dedup(wh, store, b2)
        assert a4.count() == 0, "env flag leaked into the pinned store hash mode"
    finally:
        if old is None:
            os.environ.pop(FAST_HASH_ENV, None)
        else:
            os.environ[FAST_HASH_ENV] = old


def test_temperature_mix_sample_semantics(spark):
    """alpha=0.5 thins each domain to ~sqrt(count_min/count_d); alpha=1
    keeps natural proportions (rate 1000 everywhere); determinism across
    partitionings; the binding (smallest) domain keeps everything."""
    import math

    from edna_dbt_library_spark.operators import temperature_mix_sample
    from edna_dbt_library_spark.sources import load_table
    from pyspark.sql import functions as F

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    counts = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    cmin = min(counts.values())

    out = temperature_mix_sample(d, F.col("doc_id"), "lang", alpha=0.5)
    kept = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, c in counts.items():
        expected_rate = min(math.floor(math.sqrt(cmin / c) * 1000), 1000) / 1000
        # md5 coin is uniform: observed keep-rate within a loose binomial band
        assert abs(kept.get(lang, 0) / c - expected_rate) < 0.12, (lang, kept.get(lang), c)
    # smallest domain keeps all rows (rate clamps to 1000)
    smallest = min(counts, key=counts.get)
    assert kept[smallest] == counts[smallest]

    # alpha=1: natural proportions — nothing dropped
    assert temperature_mix_sample(d, F.col("doc_id"), "lang", alpha=1.0).count() == d.count()

    # deterministic membership across partitionings
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in temperature_mix_sample(
            d.repartition(13), F.col("doc_id"), "lang", alpha=0.5
        ).collect()
    )
    assert a == b


def test_corpus_dup_ngram_stats_hand_vectors_and_broadcast_path(spark):
    """Corpus-level duplicated-n-gram fraction: hand-checkable corpus
    where one 3-gram is shared across docs; shuffle and
    broadcast_frequent paths agree; sub-n docs are absent."""
    from edna_dbt_library_spark.operators import corpus_dup_ngram_stats

    rows = [
        (1, "the quick brown fox jumps"),   # grams: tqb qbf bfj fjp
        (2, "a lazy dog saw the quick brown fox"),  # shares "the quick brown"+"quick brown fox"
        (3, "completely different words entirely here"),
        (4, "to"),  # fewer than n tokens -> no row
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_permille"])
        for r in corpus_dup_ngram_stats(docs, n=3).collect()
    }
    # doc1: 3 distinct 3-grams, 2 shared with doc2 -> 666 permille
    assert got[1] == (3, 2, 666)
    # doc2: 6 grams, same 2 shared -> 333
    assert got[2] == (6, 2, 333)
    # doc3: 3 grams, none shared
    assert got[3] == (3, 0, 0)
    assert 4 not in got

    bc = {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_permille"])
        for r in corpus_dup_ngram_stats(docs, n=3, broadcast_frequent=True).collect()
    }
    assert bc == got


def test_duplicate_substring_spans_hand_vectors(spark):
    """ExactSubstr spans (Lee et al. 2021 style): within-doc repeats
    count toward min_count, overlapping windows merge, back-to-back
    (gap-0) windows merge, and a gap > k splits spans; shuffle and
    broadcast_frequent paths agree."""
    from edna_dbt_library_spark.operators import duplicate_substring_spans

    rows = [
        (1, "a b c d e f g h"),        # shares "a b c d" with doc 2
        (2, "x a b c d y z w"),
        (3, "p q r s p q r"),          # within-doc repeat of "p q r"
        (4, "m n o u v w"),            # "m n o" and "u v w" adjacent -> one span
        (5, "m n o"),
        (6, "u v w"),
        (7, "totally unique words only right here"),
        (8, "to"),                      # fewer than k tokens -> no grams
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in duplicate_substring_spans(docs, k=3).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["span_tokens"])
        )
    got = {k: sorted(v) for k, v in got.items()}
    assert got[1] == [(0, 3, 4)]            # abc@0 + bcd@1 overlap
    assert got[2] == [(1, 4, 4)]
    assert got[3] == [(0, 2, 3), (4, 6, 3)]  # pqr@0 / pqr@4: gap 4 > k -> split
    assert got[4] == [(0, 5, 6)]            # mno@0 + uvw@3: gap == k -> merged
    assert got[5] == [(0, 2, 3)]
    assert got[6] == [(0, 2, 3)]
    assert 7 not in got
    assert 8 not in got

    bc = {}
    for r in duplicate_substring_spans(docs, k=3, broadcast_frequent=True).collect():
        bc.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["span_tokens"])
        )
    assert {k: sorted(v) for k, v in bc.items()} == got

    # the cluster-scale pin (persist DISK_ONLY: fault-tolerant, off-heap)
    # must be result-identical to the localCheckpoint default (r14)
    dk = {}
    for r in duplicate_substring_spans(docs, k=3, pin_storage="disk").collect():
        dk.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["span_tokens"])
        )
    assert {k: sorted(v) for k, v in dk.items()} == got
    import pytest as _pytest

    with _pytest.raises(ValueError, match="pin_storage"):
        duplicate_substring_spans(docs, k=3, pin_storage="nope")


def test_scrub_duplicate_substrings_removes_spans(spark):
    """The destructive half: every token inside a duplicated span is
    cut, survivors keep their order, clean docs pass through unchanged
    (modulo lowercased token join)."""
    from edna_dbt_library_spark.operators import scrub_duplicate_substrings

    rows = [
        (1, "a b c d e f g h"),
        (2, "x a b c d y z w"),
        (3, "p q r s p q r"),
        (7, "Totally Unique words only right here"),
        (8, "to"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["scrubbed_text"], r["n_tokens"], r["kept_tokens"])
        for r in scrub_duplicate_substrings(docs, k=3).collect()
    }
    assert len(got) == len(rows)  # one row per input doc, always
    assert got[1] == ("e f g h", 8, 4)
    assert got[2] == ("x y z w", 8, 4)
    assert got[3] == ("s", 7, 1)
    assert got[7] == ("totally unique words only right here", 6, 6)
    assert got[8] == ("to", 1, 1)
