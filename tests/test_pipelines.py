"""End-to-end corpus curation pipeline (pipelines.curate_corpus):
stage ordering, monotone shrinking counts, dedup/keeper behavior,
determinism, trained-BPE wiring, and shard export."""

import pytest
from pyspark.sql import functions as F

from edna_dbt_library_spark.pipelines import curate_corpus
from edna_dbt_library_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _corpus(spark):
    """Fixture docs + planted junk: an exact duplicate pair, a near
    duplicate, and a repetitive garbage doc."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text").limit(60)
    base = docs.where(F.col("doc_id") == 3).collect()[0]["text"]
    planted = spark.createDataFrame(
        [
            (9001, base),  # exact duplicate of doc 3 (min-id keeper: 3 survives)
            (9002, base + " tail"),  # near duplicate
            (9003, ("spam " * 60).strip()),  # repetition-filter kill
        ],
        "doc_id long, text string",
    )
    return docs.unionByName(planted)


def test_curate_corpus_stages_and_counts(spark):
    rep = curate_corpus(_corpus(spark), min_quality=0.0)
    c = rep.counts
    assert c["input"] == 63
    # counts shrink monotonically through the kill stages
    assert c["input"] >= c["after_quality"] >= c["after_exact_dedup"] >= c["after_near_dedup"]
    # the repetitive doc dies at quality, the exact clone at stage 2
    kept_ids = {r["doc_id"] for r in rep.kept.select("doc_id").collect()}
    assert 9003 not in kept_ids
    assert 9001 not in kept_ids and 3 in kept_ids  # min-id keeper
    assert 9002 not in kept_ids  # near-dup cluster collapses to 3
    assert c["total_tokens"] > 0
    assert "n_tokens" in rep.kept.columns and "redacted" in rep.kept.columns


def test_curate_corpus_is_deterministic(spark):
    a = curate_corpus(_corpus(spark), min_quality=0.0)
    b = curate_corpus(_corpus(spark).repartition(7), min_quality=0.0)
    assert a.counts == b.counts
    assert sorted(map(tuple, a.kept.select("doc_id", "n_tokens").collect())) == sorted(
        map(tuple, b.kept.select("doc_id", "n_tokens").collect())
    )


def test_curate_corpus_with_trained_bpe_and_export(spark, tmp_path):
    from edna_dbt_library_spark.operators.tokenizer import train_bpe

    corpus = _corpus(spark)
    merges = train_bpe(corpus, num_merges=64)
    out = str(tmp_path / "shards")
    rep = curate_corpus(
        corpus, min_quality=0.0, bpe_merges=merges, out_path=out, n_shards=4
    )
    assert rep.counts["shards"] == 4
    written = spark.read.parquet(out)
    assert written.count() == rep.counts["after_near_dedup"]
    # BPE token counts made it through the export
    assert written.agg(F.sum("n_tokens")).collect()[0][0] == rep.counts["total_tokens"]


def test_curate_corpus_language_filter(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text").limit(40)
    all_langs = curate_corpus(docs, languages=("en", "de", "zh", "fr"), min_quality=0.0)
    en_only = curate_corpus(docs, languages=("en",), min_quality=0.0)
    assert en_only.counts["after_quality"] <= all_langs.counts["after_quality"]


def test_curate_corpus_staging_path_identical_kept_set(spark, tmp_path):
    """Durable parquet staging (staging_path=) must produce the exact
    kept set and stage counts of the localCheckpoint path, and leave
    one parquet directory per stage boundary on disk (the restart-safe
    artifact: a resumed run re-reads the last boundary instead of
    replaying the pipeline)."""
    import os

    corpus = _corpus(spark)
    ckpt = curate_corpus(corpus, min_quality=0.0)
    staged = curate_corpus(
        corpus, min_quality=0.0, staging_path=str(tmp_path / "staging")
    )
    assert staged.counts == ckpt.counts
    assert sorted(map(tuple, staged.kept.select("doc_id", "n_tokens").collect())) == sorted(
        map(tuple, ckpt.kept.select("doc_id", "n_tokens").collect())
    )
    stages = sorted(os.listdir(tmp_path / "staging"))
    assert stages == ["after_exact_dedup", "after_near_dedup", "after_quality"]
    # each boundary is independently readable parquet — the resume artifact
    for s in stages:
        back = spark.read.parquet(str(tmp_path / "staging" / s))
        assert back.count() == staged.counts[s]


def test_curate_corpus_perplexity_stage(spark):
    """CCNet-style perplexity filter: a fully-OOV gibberish document
    (scored against a clean reference LM) dies at the perplexity stage;
    without the stage (or with an infinite threshold) it survives."""
    from edna_dbt_library_spark.operators.retrieval import lm_cross_entropy

    langs = ("en", "de", "zh", "fr", "es")
    clean = load_table(spark, SF, "documents").select("doc_id", "text").limit(50)
    # unique OOV content words (no repetition-filter kill) glued with
    # English stopwords (so lang-id predicts 'en' and quality passes) —
    # every content bigram is unseen by the clean reference LM
    gib_words = " ".join(
        f"the zxq{i}v of jkw{i}po" for i in range(12)
    )
    gib = spark.createDataFrame(
        [(9050, gib_words)], "doc_id long, text string"
    )
    corpus = clean.unionByName(gib)

    scores = {
        r["doc_id"]: r["cross_entropy"]
        for r in lm_cross_entropy(corpus, train_documents=clean).collect()
    }
    gib_ce = scores[9050]
    assert gib_ce == max(v for v in scores.values() if v is not None)

    # control: no perplexity stage -> the gibberish doc survives
    rep0 = curate_corpus(corpus, languages=langs, min_quality=0.0)
    assert "after_perplexity" not in rep0.counts
    assert 9050 in {r["doc_id"] for r in rep0.kept.select("doc_id").collect()}

    rep = curate_corpus(
        corpus,
        languages=langs,
        min_quality=0.0,
        max_cross_entropy=gib_ce - 1e-3,
        lm_train_docs=clean,
    )
    assert rep.counts["after_perplexity"] <= rep.counts["after_exact_dedup"]
    kept_ids = {r["doc_id"] for r in rep.kept.select("doc_id").collect()}
    assert 9050 not in kept_ids
    # an infinite threshold keeps everything the hash stages kept
    rep_inf = curate_corpus(
        corpus, languages=langs, min_quality=0.0,
        max_cross_entropy=1e9, lm_train_docs=clean,
    )
    assert rep_inf.counts["after_perplexity"] == rep_inf.counts["after_exact_dedup"]
    assert 9050 in {r["doc_id"] for r in rep_inf.kept.select("doc_id").collect()}


def test_curate_corpus_media_dedup_stage(spark):
    """With media supplied, docs whose attached images are perceptual
    near-dups collapse to the min-id keeper; docs without media pass."""
    from tests.test_streaming_multimodal import _grad, _grad_bright, _noise, _png_rgb

    docs = load_table(spark, SF, "documents").select("doc_id", "text").limit(30)
    media = spark.createDataFrame(
        [
            (2, _png_rgb(64, 64, _grad)),
            (5, _png_rgb(64, 64, _grad_bright)),  # near-dup image of doc 2's
            (9, _png_rgb(64, 64, _noise)),
        ],
        "doc_id long, content binary",
    )
    rep0 = curate_corpus(docs, min_quality=0.0)
    kept0 = {r["doc_id"] for r in rep0.kept.select("doc_id").collect()}
    assert {2, 5, 9} <= kept0  # all three survive the text stages

    rep = curate_corpus(docs, min_quality=0.0, media=media, media_kind="image")
    assert rep.counts["after_media_dedup"] == rep.counts["after_near_dedup"] - 1
    kept_ids = {r["doc_id"] for r in rep.kept.select("doc_id").collect()}
    assert 2 in kept_ids and 5 not in kept_ids  # min-id keeper
    assert 9 in kept_ids  # distinct image survives
    assert (kept0 - {5}) == kept_ids  # media-less docs untouched


def test_curate_corpus_semantic_stage(spark):
    """With embeddings supplied, paraphrase-level redundancy dies in the
    semantic stage: planted near-identical vectors collapse to the
    min-id survivor, docs without vectors pass through untouched."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text").limit(50)
    emb = (
        load_table(spark, SF, "embeddings")
        .withColumnRenamed("vec_id", "doc_id")
        .where(F.col("doc_id") < 40)  # docs 40..49 have no vector
    )
    # make docs 7 and 11 semantic twins (identical vectors)
    twin = emb.where(F.col("doc_id") == 7).select(
        F.lit(11).cast("long").alias("doc_id"), "embedding", "label"
    )
    emb = emb.where(F.col("doc_id") != 11).unionByName(twin)

    rep = curate_corpus(
        docs, min_quality=0.0, embeddings=emb, semantic_threshold=0.999
    )
    assert "after_semantic_dedup" in rep.counts
    assert rep.counts["after_semantic_dedup"] <= rep.counts["after_near_dedup"]
    kept_ids = {r["doc_id"] for r in rep.kept.select("doc_id").collect()}
    if 7 in kept_ids:  # unless an earlier stage killed 7 itself
        assert 11 not in kept_ids
    # vectorless docs survive the semantic stage
    assert any(i >= 40 for i in kept_ids)


def test_curate_corpus_decontamination_stage(spark):
    """A doc quoting a benchmark prompt verbatim dies at the
    decontamination stage; unrelated docs pass untouched."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text").limit(40)
    leak_text = docs.where(F.col("doc_id") == 5).collect()[0]["text"]
    bench = spark.createDataFrame(
        [(1, " ".join(leak_text.split()[:8]))], "doc_id long, text string"
    )
    rep = curate_corpus(docs, min_quality=0.0, decontaminate_against=bench)
    assert "after_decontamination" in rep.counts
    assert rep.counts["after_decontamination"] < rep.counts["after_exact_dedup"]
    kept_ids = {r["doc_id"] for r in rep.kept.select("doc_id").collect()}
    assert 5 not in kept_ids
    # control: without the stage doc 5 survives
    rep0 = curate_corpus(docs, min_quality=0.0)
    assert 5 in {r["doc_id"] for r in rep0.kept.select("doc_id").collect()}


def test_streaming_ingest_feeds_curation_end_to_end(spark, tmp_path):
    """The full production flow composes: a JSONL drop folder streams
    through quarantine-aware ingest, the landed good rows get
    deterministic content ids, curate through the pipeline, take
    train/val/test labels, and export as shards — every count
    consistent across the chain."""
    import json as _json

    from edna_dbt_library_spark.operators.curation import hash_split
    from edna_dbt_library_spark.sources.ingest import with_ingest_ids
    from edna_dbt_library_spark.streaming import read_ingested, stream_jsonl_ingest
    from pyspark.sql import types as T

    docs = load_table(spark, SF, "documents").limit(30).collect()
    src = tmp_path / "drop"
    src.mkdir()
    lines = [
        _json.dumps({"url": f"http://ex.com/{r['doc_id']}", "text": r["text"]})
        for r in docs
    ] + ['{"broken line', _json.dumps({"url": None, "text": "no url"})]
    (src / "a.jsonl").write_text("\n".join(lines[:15]) + "\n")
    (src / "b.jsonl").write_text("\n".join(lines[15:]) + "\n")

    schema = T.StructType(
        [T.StructField("url", T.StringType()), T.StructField("text", T.StringType())]
    )
    store, cp = str(tmp_path / "store"), str(tmp_path / "cp")
    stream_jsonl_ingest(
        spark, str(src), schema, store, cp, required=("url", "text")
    ).awaitTermination(120)
    good, quar = read_ingested(spark, store)
    assert good.count() == 30 and quar.count() == 2

    ingested = with_ingest_ids(good, ("url", "text"))
    rep = curate_corpus(ingested, min_quality=0.0, out_path=str(tmp_path / "shards"), n_shards=2)
    assert rep.counts["input"] == 30
    final = hash_split(rep.kept, "doc_id")
    rows = final.select("doc_id", "split", "n_tokens").collect()
    assert len(rows) == rep.counts["after_near_dedup"] > 0
    assert {r["split"] for r in rows} <= {"train", "val", "test"}
    exported = spark.read.parquet(str(tmp_path / "shards"))
    assert exported.count() == len(rows)


def test_curate_corpus_strip_markup_stage(spark):
    """strip_markup=True: HTML-wrapped docs become equivalent to their
    plain-text originals — the exact-dedup stage proves it by collapsing
    a wrapped clone onto the plain doc."""
    docs = load_table(spark, SF, "documents").select("doc_id", "text").limit(20)
    base = docs.where(F.col("doc_id") == 3).collect()[0]["text"]
    wrapped = spark.createDataFrame(
        [(9100, f"<html><body><p>{base}</p><script>var x=1;</script></body></html>")],
        "doc_id long, text string",
    )
    corpus = docs.unionByName(wrapped)
    rep = curate_corpus(corpus, min_quality=0.0, strip_markup=True)
    kept_ids = {r["doc_id"] for r in rep.kept.select("doc_id").collect()}
    assert 9100 not in kept_ids and 3 in kept_ids  # stripped clone deduped onto 3
    # stripped: the clone survives quality as clean text and dies as an
    # EXACT duplicate of doc 3; unstripped the markup poisons scoring
    # and it dies at quality instead (measured stage counts)
    rep0 = curate_corpus(corpus, min_quality=0.0)
    assert rep.counts["after_quality"] == rep0.counts["after_quality"] + 1
    assert rep.counts["after_exact_dedup"] == rep0.counts["after_exact_dedup"]
