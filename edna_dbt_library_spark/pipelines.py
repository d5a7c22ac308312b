"""End-to-end corpus curation pipeline: the composed production flow a
training-data team runs, wiring the library's operators in the standard
order with one call.

Stage order follows the usual web-corpus recipe (each stage cuts volume
before the next, more expensive one runs):

1. **Quality + PII** — `curation_verdict`: ONE zero-shuffle scan scores
   language, quality, all Gopher repetition signals, and redacts PII;
   rows failing the keep flag / language / quality thresholds drop here,
   before anything shuffles.
2. **Exact dedup** — md5 fingerprint groupBy; the min-id keeper
   survives. One shuffle on a uniform key.
2a. **Decontamination** (optional) — drop docs sharing any word n-gram
   with a heldout benchmark set (broadcast hash semi-join).
2b. **Perplexity filter** (optional) — CCNet-style bigram-LM
   cross-entropy threshold against a clean reference corpus, applied
   after the cheap hash cut and before the shuffling near-dedup.
3. **Near dedup** — capped MinHash-LSH candidate pairs →
   connected-components clusters → min-id keeper. The stop-bucket cap
   is on by default (the measured 100 TB path, PLAN_AUDIT.md).
3b/3c. **Semantic / media dedup** (optional) — SemDeDup over supplied
   embeddings; perceptual near-dup (dHash / audio energy-delta
   fingerprints) over attached media bytes.
4. **Token counting** — trained BPE if merges are supplied, else the
   zero-shuffle regex estimate.
5. **Shard export** — deterministic shuffled parquet shards, ready for
   a data loader (skipped when ``out_path`` is None).

Every stage is individually tested and oracle/plan-audited; this module
only sequences them (no new distributed logic), returns per-stage row
counts for the run report, and keeps the whole flow deterministic:
same input -> same kept set, same ids, same shard layout.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class CurationReport:
    counts: dict[str, int] = field(default_factory=dict)
    kept: DataFrame | None = None


def _stager(staging_path: str | None):
    """Stage-boundary materializer. Without a staging path, stages pin
    to ``localCheckpoint`` (executor memory/disk — fast, but an executor
    loss replays the whole upstream pipeline, and each count is its own
    job). With ``staging_path``, every boundary is WRITTEN to parquet
    and re-read: one write job per stage, restart-safe lineage (the
    reference's durable temp-table pattern,
    incremental_partition_merge.sql:77-83), and the count comes from
    parquet footer metadata — Catalyst serves count() on a bare parquet
    scan without reading data. This is the 100 TB form."""

    if staging_path is None:

        def stage(df: DataFrame, name: str) -> tuple[DataFrame, int]:
            out = df.localCheckpoint(eager=True)
            return out, out.count()

    else:

        def stage(df: DataFrame, name: str) -> tuple[DataFrame, int]:
            path = os.path.join(staging_path, name)
            df.write.mode("overwrite").parquet(path)
            out = df.sparkSession.read.parquet(path)
            return out, out.count()  # metadata-only count over footers

    return stage


def curate_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    languages: tuple[str, ...] = ("en",),
    min_quality: float = 0.3,
    near_dup_threshold: float = 0.8,
    lsh_bucket_cap: int | None = 256,
    bpe_merges: list[tuple[str, str]] | None = None,
    embeddings: DataFrame | None = None,
    semantic_threshold: float = 0.9,
    semantic_cell_cap: int | None = 1000,
    max_cross_entropy: float | None = None,
    lm_train_docs: DataFrame | None = None,
    lm_alpha: float = 0.5,
    media: DataFrame | None = None,
    media_kind: str = "image",
    media_max_hamming: int = 3,
    decontaminate_against: DataFrame | None = None,
    decontamination_ngram: int = 3,
    out_path: str | None = None,
    n_shards: int = 16,
    shard_salt: str = "",
    staging_path: str | None = None,
    strip_markup: bool = False,
) -> CurationReport:
    """Run the full curation flow; returns a :class:`CurationReport`
    with per-stage surviving row counts and the final kept DataFrame
    (with ``redacted`` text, quality metadata, and ``n_tokens``).

    Stage counts are computed on materialized frames, so each stage's
    work runs once even though the report reads every stage's count.
    Pass ``staging_path`` to persist every stage boundary to parquet
    (restart-safe, metadata-only counts) instead of localCheckpoint —
    see :func:`_stager`; the kept set is identical either way (tested).

    ``max_cross_entropy`` switches on the CCNet-style perplexity filter
    (Wenzek et al., 2020): documents are scored by bigram-LM
    cross-entropy against ``lm_train_docs`` (a clean reference corpus —
    CCNet uses Wikipedia; defaults to the surviving corpus itself) and
    rows above the threshold drop AFTER exact dedup (cheap hash cut
    first) and BEFORE near-dedup, CCNet's own order. Unscoreable docs
    (< 2 tokens) pass — absence of evidence keeps the row, matching the
    semantic-stage convention for docs without vectors."""
    from edna_dbt_library_spark.operators.curation import curation_verdict
    from edna_dbt_library_spark.operators.dedup import (
        duplicate_clusters,
        jaccard_pairs,
        lsh_candidate_pairs,
    )
    from edna_dbt_library_spark.functions.text import approx_bpe_token_count, fingerprint

    report = CurationReport()
    stage = _stager(staging_path)
    report.counts["input"] = docs.count()

    # 0. markup stripping (optional, scan-side Column chain): raw crawl
    # HTML becomes text BEFORE anything scores it — script/style payload
    # would otherwise poison quality, language-id and every dedup stage
    if strip_markup:
        from edna_dbt_library_spark.functions.text import strip_html

        docs = docs.withColumn(text_col, strip_html(F.col(text_col)))

    # 1. quality + PII (zero-shuffle scan; thresholds applied here)
    scored = curation_verdict(docs, text_col=text_col, id_col=id_col)
    kept, report.counts["after_quality"] = stage(
        scored.where(
            F.col("keep_repetition")
            & F.col("pred_lang").isin(*languages)
            & (F.col("quality") >= min_quality)
        ),
        "after_quality",
    )

    # 2. exact dedup on the REDACTED text (redaction-equal docs are dups)
    kept = kept.withColumn("_fp", fingerprint(F.col("redacted")))
    keepers = kept.groupBy("_fp").agg(F.min(id_col).alias("_keep_id"))
    kept, report.counts["after_exact_dedup"] = stage(
        kept.join(keepers, "_fp")
        .where(F.col(id_col) == F.col("_keep_id"))
        .drop("_fp", "_keep_id"),
        "after_exact_dedup",
    )

    # 2a. benchmark decontamination (optional): docs sharing any word
    # n-gram with the heldout eval set drop before anything expensive —
    # the eval-leak sweep every training corpus runs (broadcast bench
    # hashes, no corpus shuffle; operators/curation.contamination_flags)
    if decontaminate_against is not None:
        from edna_dbt_library_spark.operators.curation import contamination_flags

        hits = contamination_flags(
            kept.select(F.col(id_col), F.col("redacted").alias("text")),
            decontaminate_against,
            n=decontamination_ngram,
            id_col=id_col,
        ).withColumnRenamed(id_col, "_ct_id")
        kept, report.counts["after_decontamination"] = stage(
            kept.join(hits, kept[id_col] == F.col("_ct_id"), "left_anti"),
            "after_decontamination",
        )

    # 2b. perplexity filter (optional, CCNet order: after the cheap
    # exact-hash cut, before the shuffling near-dedup stages)
    if max_cross_entropy is not None:
        from edna_dbt_library_spark.operators.retrieval import lm_cross_entropy

        lm = lm_cross_entropy(
            kept.select(F.col(id_col), F.col("redacted").alias("text")),
            train_documents=lm_train_docs,
            alpha=lm_alpha,
            id_col=id_col,
        ).withColumnRenamed("doc_id", "_lm_id")
        kept, report.counts["after_perplexity"] = stage(
            kept.join(lm, kept[id_col] == F.col("_lm_id"), "left")
            .where(
                F.col("cross_entropy").isNull()
                | (F.col("cross_entropy") <= max_cross_entropy)
            )
            .select(*scored.columns),
            "after_perplexity",
        )

    # 3. near dedup: capped LSH candidates -> exact Jaccard VERIFY ->
    # clusters -> min-id keeper. The verify step is not optional: LSH
    # candidates are a recall device, and clustering unverified
    # candidates transitively merges everything that merely shares a
    # band (on a shared-vocabulary corpus that is the entire corpus).
    # 3-gram shingles on BOTH stages: unigram word sets of unrelated
    # docs converge on small vocabularies (every doc covers the whole
    # vocabulary); only n-gram order separates them
    ddocs = kept.select(F.col(id_col), F.col("redacted").alias("text"))
    cands = lsh_candidate_pairs(ddocs, max_bucket_size=lsh_bucket_cap, shingle_n=3)
    pairs = jaccard_pairs(ddocs, cands, shingle_n=3).where(
        F.col("jaccard") >= near_dup_threshold
    )
    clusters = duplicate_clusters(pairs.select("doc_a", "doc_b")).withColumnRenamed(
        "doc_id", "_cl_id"
    )
    kept, report.counts["after_near_dedup"] = stage(
        kept.join(clusters, kept[id_col] == clusters["_cl_id"], "left")
        .where(F.col("cluster_id").isNull() | (F.col(id_col) == F.col("cluster_id")))
        .select(*scored.columns),
        "after_near_dedup",
    )

    # 3b. semantic dedup (optional): prunes paraphrase-level redundancy
    # the text stages can't see. embeddings carries (id_col, embedding,
    # label); only vectors for still-kept docs participate, and the
    # hot-cell cap is ON by default (PLAN_AUDIT.md "embedding stress").
    if embeddings is not None:
        from edna_dbt_library_spark.operators.similarity import semantic_dedup

        vecs = embeddings.join(kept.select(id_col), id_col)
        verdict = semantic_dedup(
            vecs,
            threshold=semantic_threshold,
            id_col=id_col,
            max_cell_size=semantic_cell_cap,
        ).withColumnRenamed("vec_id", "_sd_id")
        kept, report.counts["after_semantic_dedup"] = stage(
            kept.join(
                verdict.select("_sd_id", "keep"), kept[id_col] == F.col("_sd_id"), "left"
            )
            .where(F.coalesce(F.col("keep"), F.lit(True)))  # docs w/o vectors stay
            .select(*scored.columns),
            "after_semantic_dedup",
        )

    # 3c. media dedup (optional): perceptual near-dup on attached
    # image/audio bytes — re-encoded or re-leveled copies of the same
    # asset collapse to the min-id keeper even when their text differs.
    # Only still-kept docs hash (the expensive byte pass runs after every
    # text cut); docs without media pass through.
    if media is not None:
        from edna_dbt_library_spark.operators.dedup import duplicate_clusters
        from edna_dbt_library_spark.operators.multimodal import (
            audio_near_dup_pairs,
            image_near_dup_pairs,
        )

        if media_kind not in ("image", "audio"):
            raise ValueError(f"media_kind must be image|audio, got {media_kind!r}")
        m = media.select(F.col(id_col).alias("doc_id"), "content").join(
            kept.select(F.col(id_col).alias("doc_id")), "doc_id"
        )
        mpairs = (
            image_near_dup_pairs(m, max_hamming=media_max_hamming)
            if media_kind == "image"
            else audio_near_dup_pairs(m, max_hamming=media_max_hamming)
        )
        mclusters = duplicate_clusters(mpairs.select("doc_a", "doc_b")).withColumnRenamed(
            "doc_id", "_md_id"
        )
        kept, report.counts["after_media_dedup"] = stage(
            kept.join(mclusters, kept[id_col] == F.col("_md_id"), "left")
            .where(F.col("cluster_id").isNull() | (F.col(id_col) == F.col("cluster_id")))
            .select(*scored.columns),
            "after_media_dedup",
        )

    # 4. token counts (trained BPE when merges are provided)
    if bpe_merges:
        from edna_dbt_library_spark.operators.tokenizer import bpe_encode

        counts = bpe_encode(
            kept.select(F.col(id_col), F.col("redacted").alias("text")), bpe_merges
        )
        kept = kept.join(counts, id_col)
    else:
        kept = kept.withColumn("n_tokens", approx_bpe_token_count(F.col("redacted")))
    report.counts["total_tokens"] = int(
        kept.agg(F.sum("n_tokens").alias("t")).collect()[0]["t"] or 0
    )

    # 5. shard export
    if out_path is not None:
        from edna_dbt_library_spark.operators.curation import export_shuffled_shards

        export_shuffled_shards(kept, out_path, n_shards, key=id_col, salt=shard_salt)
        report.counts["shards"] = n_shards

    report.kept = kept
    return report
