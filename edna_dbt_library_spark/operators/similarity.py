"""Similarity search over an embedding column (``array<float>``).

Two strategies:
* ``brute_force_topk`` — broadcast the (small) query set against all
  candidates; one pass over the big side, no shuffle of the candidates at
  all. The right plan when |queries| is small: at 100 TB the candidate scan
  is embarrassingly parallel and the per-row work is a JVM HOF dot product
  inside codegen.
* ``lsh_bucketed_topk`` — sign-bit LSH bucketing: queries only join
  candidates in the same hyperplane-sign bucket, cutting compared pairs by
  ~2^dims at some recall cost. The bucket key is deterministic, so the
  join is a plain equi-join Catalyst can shuffle-partition (AQE handles
  bucket skew).

Ranking is made fully deterministic by rounding similarity to 6 decimals
and tie-breaking on candidate id — stable under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from edna_dbt_library_spark.functions.vectors import dot, norm, sign_bucket


def _ranked_topk(joined: DataFrame, k: int) -> DataFrame:
    # norms are precomputed per side BEFORE the join (see callers): the
    # naive cosine() would re-aggregate both norms for every (query,
    # candidate) pair — 3 array folds per pair instead of 1. The value is
    # bit-identical (same expression over the same doubles), only the
    # evaluation count changes.
    d = dot(F.col("q_embedding"), F.col("c_embedding"))
    sim = F.when(
        (F.col("q_norm") > 0) & (F.col("c_norm") > 0), d / (F.col("q_norm") * F.col("c_norm"))
    ).otherwise(F.lit(None).cast("double"))
    scored = joined.select("query_id", "vec_id", "label", F.round(sim, 6).alias("cosine_sim"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "vec_id", "label", "cosine_sim")
    )


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast cross-join of queries × candidates.

    ``queries`` needs columns (id_col, vec_col); candidates keep their
    ``label``. Self-matches (same id) are excluded.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("q_embedding"),
            norm(F.col(vec_col)).alias("q_norm"),
        )
    )
    c = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col("label"),
        F.col(vec_col).alias("c_embedding"),
        norm(F.col(vec_col)).alias("c_norm"),
    )
    joined = c.crossJoin(q).where(F.col("vec_id") != F.col("query_id"))
    return _ranked_topk(joined, k)


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.9,
    dims: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: sign-bucket LSH blocking,
    then exact cosine within each bucket, keeping pairs ≥ threshold.

    The self-join compares only same-bucket vectors (2^dims blocking), so
    the pair count scales with bucket sizes, not N² — same shape as the
    MinHash-LSH text pipeline, on vectors. Output: (id_a, id_b, cosine_sim)
    with id_a < id_b."""
    b = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("e"),
        norm(F.col(vec_col)).alias("n"),
        sign_bucket(F.col(vec_col), dims).alias("bucket"),
    ).localCheckpoint(eager=True)
    a, c = b.alias("a"), b.alias("b")
    d = dot(F.col("a.e"), F.col("b.e"))
    sim = F.when((F.col("a.n") > 0) & (F.col("b.n") > 0), d / (F.col("a.n") * F.col("b.n")))
    return (
        a.join(c, "bucket")
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(sim, 6).alias("cosine_sim"),
        )
        .where(F.col("cosine_sim") >= threshold)
    )


def lsh_bucketed_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dims: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k restricted to the query's sign-bit bucket."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_embedding"),
        norm(F.col(vec_col)).alias("q_norm"),
        sign_bucket(F.col(vec_col), dims).alias("bucket"),
    )
    c = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col("label"),
        F.col(vec_col).alias("c_embedding"),
        norm(F.col(vec_col)).alias("c_norm"),
        sign_bucket(F.col(vec_col), dims).alias("bucket"),
    )
    joined = c.join(F.broadcast(q), "bucket").where(F.col("vec_id") != F.col("query_id"))
    return _ranked_topk(joined, k)
