"""Deduplication operators for LLM-data pipelines over a ``documents``-like
table: exact, fingerprint, MinHash+LSH, SimHash, and n-gram Jaccard.

Scale design (100 TB documents):
* Exact/fingerprint dedup is one hash-groupBy — a single shuffle on a
  uniformly distributed md5 key (no skew by construction).
* MinHash-LSH never compares all pairs: docs shuffle once to build
  signatures (groupBy doc), bands explode to (band, signature) buckets, and
  only same-bucket docs join — the classic shingle→minhash→band→bucket-join
  pipeline. Bucket skew (giant near-dup clusters) is handled by AQE skew
  join; candidate verification is a narrow join on doc_id.
* SimHash is one aggregation producing a 60-bit signature per doc;
  Hamming-neighbor search then groups on rotated prefixes (not implemented
  here — signatures alone already support blocking).
* Everything is md5/split/aggregate built-ins: deterministic across runs,
  partitionings and engines (the DuckDB oracle reproduces them exactly).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from edna_dbt_library_spark.functions.text import fingerprint, tokens


def exact_duplicate_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group by md5 of the raw text: (hash, keep_id = min id, n_docs)."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
    )


def fingerprint_duplicate_groups(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Like exact, but on the normalized fingerprint (case/whitespace/punct
    insensitive)."""
    return (
        docs.groupBy(fingerprint(F.col(text_col)).alias("fp"))
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
    )


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Return the surviving rows (min id per exact text hash)."""
    keep = exact_duplicate_groups(docs, text_col, id_col).select(F.col("keep_id").alias(id_col))
    return docs.join(keep, id_col, "left_semi")


def _word_set(text_col: str) -> Column:
    return F.array_distinct(tokens(F.col(text_col)))


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc MinHash signature over the distinct-word set.

    Hash family: ``md5('s<i>|' || word)`` per seed i, minimum taken
    *lexicographically* over the fixed-width hex digests — order-isomorphic
    to a uniform integer hash but reproducible in any engine with md5
    (deterministic dedup keys matter as much here as in the reference's
    UUIDv5, macros/utils/uuid_generation.sql). Signature columns are named
    mh0..mh{n-1}.
    """
    words = docs.select(F.col(id_col), F.explode(_word_set(text_col)).alias("w"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"s{i}|"), F.col("w")))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return words.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    docs: DataFrame,
    num_hashes: int = 8,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash-LSH candidate pairs: split the signature into ``bands`` bands
    of ``num_hashes//bands`` rows; docs sharing any full band signature
    become a candidate pair. Output: (doc_a, doc_b) with doc_a < doc_b,
    distinct."""
    rows_per_band = num_hashes // bands
    if rows_per_band * bands != num_hashes:
        raise ValueError("num_hashes must be divisible by bands")
    sig = minhash_signatures(docs, num_hashes, text_col, id_col)
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat(*[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]).alias("sig"),
        )
        for b in range(bands)
    ]
    buckets = sig.select(F.col(id_col), F.explode(F.array(*band_cols)).alias("bk")).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig")
    )
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(b, ["band", "sig"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def jaccard_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact word-set Jaccard for candidate pairs (the verify step after
    LSH). Joins the token sets in twice by doc id — narrow joins, no
    all-pairs blowup."""
    sets_df = docs.select(F.col(id_col), _word_set(text_col).alias("ws"))
    a = sets_df.select(F.col(id_col).alias("doc_a"), F.col("ws").alias("ws_a"))
    b = sets_df.select(F.col(id_col).alias("doc_b"), F.col("ws").alias("ws_b"))
    inter = F.size(F.array_intersect("ws_a", "ws_b")).cast("double")
    union = F.size(F.array_union("ws_a", "ws_b")).cast("double")
    return (
        pairs.join(a, "doc_a").join(b, "doc_b")
        .select("doc_a", "doc_b", F.round(inter / union, 6).alias("jaccard"))
    )


def near_duplicate_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 8,
    bands: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full near-dup pipeline: LSH candidates → exact Jaccard ≥ threshold."""
    cands = lsh_candidate_pairs(docs, num_hashes, bands, text_col, id_col)
    return jaccard_pairs(docs, cands, text_col, id_col).where(F.col("jaccard") >= threshold)


def simhash(
    docs: DataFrame,
    bits: int = 60,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc SimHash over distinct words: bit i of the signature is the
    sign of Σ_words (±1 by bit i of md5(word)). 60 bits so the word hash
    (15 hex chars) stays inside a signed 64-bit long in every engine.
    Output: (id, simhash_bits as a '0'/'1' string, msb first)."""
    if not 1 <= bits <= 60:
        raise ValueError("bits must be in [1, 60]")
    words = docs.select(F.col(id_col), F.explode(_word_set(text_col)).alias("w"))
    h = F.conv(F.substring(F.md5(F.col("w")), 1, 15), 16, 10).cast("long")
    words = words.withColumn("h", h)
    sums = [
        F.sum(F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"b{i}")
        for i in range(bits)
    ]
    agg = words.groupBy(id_col).agg(*sums)
    sig = F.concat(*[
        F.when(F.col(f"b{i}") > 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(bits - 1, -1, -1)
    ])
    return agg.select(F.col(id_col), sig.alias("simhash_bits"))
