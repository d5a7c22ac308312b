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


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: an inverted-file index skeleton.

    * index build: every vector is assigned to its nearest "centroid" cell
      (centroids here are the first ``n_cells`` vectors by id — a
      deterministic stand-in for k-means centroids, keeping the whole
      operator oracle-checkable; swap in trained centroids in production).
    * search: each query probes its ``n_probe`` nearest cells and ranks
      only the vectors in those cells.

    Scale shape: assignment is a broadcast cross-join against n_cells rows
    (one pass over the corpus, done once at index-build time); search
    touches ~n_probe/n_cells of the data instead of all of it.
    """
    from edna_dbt_library_spark.operators.relational import top1_per_key

    cent = F.broadcast(
        embeddings.where(F.col(id_col) < n_cells).select(
            F.col(id_col).alias("cid"),
            F.col(vec_col).alias("ce"),
            norm(F.col(vec_col)).alias("cn"),
        )
    )

    def _cell_scores(df: DataFrame, out_id: str) -> DataFrame:
        side = df.select(
            F.col(id_col).alias(out_id),
            F.col(vec_col).alias("e"),
            norm(F.col(vec_col)).alias("n"),
            *([F.col("label")] if "label" in df.columns else []),
        )
        d = dot(F.col("e"), F.col("ce"))
        sim = F.when((F.col("n") > 0) & (F.col("cn") > 0), d / (F.col("n") * F.col("cn")))
        return side.crossJoin(cent).withColumn("c_sim", F.round(sim, 6))

    # index: nearest cell per vector (ties -> smallest cid)
    assigned = top1_per_key(
        _cell_scores(embeddings, "vec_id"),
        ["vec_id"],
        [F.col("c_sim").desc(), F.col("cid").asc()],
    ).select("vec_id", "label", "e", "n", F.col("cid").alias("cell"))

    # search: n_probe nearest cells per query
    from pyspark.sql import Window

    qs = _cell_scores(queries, "query_id")
    w = Window.partitionBy("query_id").orderBy(F.col("c_sim").desc(), F.col("cid").asc())
    probes = (
        qs.withColumn("__pr", F.row_number().over(w))
        .where(F.col("__pr") <= n_probe)
        .select("query_id", F.col("e").alias("q_embedding"), F.col("n").alias("q_norm"), F.col("cid").alias("cell"))
    )

    # each vector lives in exactly one cell and probed cells are distinct,
    # so every (query, candidate) pair appears at most once — no dedup step
    joined = assigned.join(F.broadcast(probes), "cell").where(F.col("vec_id") != F.col("query_id"))
    joined = joined.select(
        "query_id", "vec_id", "label",
        F.col("e").alias("c_embedding"), F.col("n").alias("c_norm"),
        "q_embedding", "q_norm",
    )
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
