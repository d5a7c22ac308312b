"""Bucketed co-located joins (shuffle-free plan), IVF ANN sanity, and
SQL-text models in the runner."""

import pytest
from pyspark.sql import functions as F

from edna_dbt_library_spark.operators.similarity import brute_force_topk, ivf_topk
from edna_dbt_library_spark.sources.bucketed import create_bucketed_table, join_is_shuffle_free
from edna_dbt_library_spark.sources.tables import load_table, register_views

SF = "/root/testdata/sf0.001"


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
        lineitem = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
        bo = create_bucketed_table(spark, orders, "b_orders", ["o_orderkey"], 4, ["o_orderkey"])
        bl = create_bucketed_table(spark, lineitem, "b_lineitem", ["l_orderkey"], 4, ["l_orderkey"])
        joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey)
        assert join_is_shuffle_free(joined), "bucketed equi-join should have no Exchange"
        # and it computes the same result as the plain join
        plain = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).count()
        assert joined.count() == plain
        # control: the un-bucketed join DOES shuffle
        assert not join_is_shuffle_free(lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey))
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_ivf_recall_vs_bruteforce(spark):
    emb = load_table(spark, SF, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, queries, k=10)
    approx = ivf_topk(emb, queries, k=10, n_cells=16, n_probe=4, train_iters=2)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    assert len(a) == len(e) == 50
    recall = len(e & a) / len(e)
    # probing 4/16 trained cells; measured 0.86-0.90 on the fixtures
    assert recall >= 0.7, f"IVF recall collapsed: {recall}"


def test_kmeans_cells_trains_and_is_deterministic(spark):
    from edna_dbt_library_spark.operators.similarity import kmeans_cells, quantize_vec

    emb = load_table(spark, SF, "embeddings")
    cent = kmeans_cells(emb, n_cells=16, iters=2)
    rows = {r["cid"]: list(r["cv"]) for r in cent.collect()}
    assert set(rows) == set(range(16))
    assert all(len(v) == 64 for v in rows.values())
    # training moved the centroids off their seed vectors (Lloyd update
    # really ran): at least half the cells differ from the seed
    seed = {
        r["vec_id"]: list(r["q"])
        for r in emb.where(F.col("vec_id") < 16)
        .select("vec_id", quantize_vec("embedding").alias("q"))
        .collect()
    }
    moved = sum(1 for cid, cv in rows.items() if cv != seed[cid])
    assert moved >= 8, f"only {moved}/16 centroids moved from their seeds"
    # bit-exact under repartitioning: pure integer arithmetic everywhere
    again = {r["cid"]: list(r["cv"]) for r in kmeans_cells(emb.repartition(7), n_cells=16, iters=2).collect()}
    assert again == rows


def test_kmeans_lowest_id_seed_handles_sparse_ids(spark):
    """seed="lowest-id" must take the true n_cells lowest ids: on a
    sparse, non-zero-based id space a `vid < n_cells` filter would pick
    ZERO seeds and every downstream IVF/outlier query would silently
    return empty. Centroids must also match the dense-id run exactly —
    the id remap is monotonic, so seeds, assignments and updates are the
    same vectors throughout."""
    from edna_dbt_library_spark.operators.similarity import kmeans_cells

    emb = load_table(spark, SF, "embeddings")
    sparse = emb.withColumn("vec_id", F.col("vec_id") * 1000 + 5_000_000)
    cent = {r["cid"]: list(r["cv"]) for r in kmeans_cells(sparse, n_cells=8, iters=1).collect()}
    assert set(cent) == set(range(8))
    dense = {r["cid"]: list(r["cv"]) for r in kmeans_cells(emb, n_cells=8, iters=1).collect()}
    assert cent == dense


def test_runner_sql_text_model(spark, tmp_path):
    from edna_dbt_library_spark.plans import Model, ModelNode, Runner
    from edna_dbt_library_spark.sources import Warehouse

    register_views(spark, SF)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    runner = Runner(wh=wh, project_name="analytics", context="")
    node = ModelNode(name="type_counts", fqn=["analytics", "ops", "staging", "type_counts"])
    runner.register(
        Model(node=node, sql="SELECT event_type, count(*) AS n FROM events GROUP BY event_type")
    )
    result = runner.run("type_counts", validate=False, register_metadata=False)
    out = wh.read(result["relation"])
    assert out.columns == ["event_type", "n"]
    assert out.count() == 5


def test_model_without_builder_or_sql_raises(spark):
    from edna_dbt_library_spark.plans import Model, ModelNode

    m = Model(node=ModelNode(name="x", fqn=[]))
    with pytest.raises(ValueError, match="neither"):
        m.build(spark)


def test_cell_outliers_exact_and_deterministic(spark):
    from edna_dbt_library_spark.operators.similarity import cell_outliers

    emb = load_table(spark, SF, "embeddings")
    out = cell_outliers(emb, n_cells=16, iters=2, top_k=3)
    rows = out.collect()
    # every cell yields at most top_k rows with ranks 1..k and
    # non-increasing distances
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r["cell"], []).append(r)
    for cell, rs in by_cell.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        dists = [r["dist"] for r in rs]
        assert dists == sorted(dists, reverse=True)
        assert all(d >= 0 for d in dists)
    # bit-exact under repartitioning (pure integer arithmetic)
    again = sorted(map(tuple, cell_outliers(emb.repartition(7), n_cells=16, iters=2, top_k=3).collect()))
    assert sorted(map(tuple, rows)) == again


def test_kmeans_hash_seeding_mode(spark):
    import pytest as _pytest

    from edna_dbt_library_spark.operators.similarity import kmeans_cells

    emb = load_table(spark, SF, "embeddings")
    hashed = {r["cid"]: list(r["cv"]) for r in kmeans_cells(emb, n_cells=8, iters=1, seed="hash").collect()}
    assert set(hashed) == set(range(8)) and all(len(v) == 64 for v in hashed.values())
    # deterministic under repartitioning, like the default seeding
    again = {r["cid"]: list(r["cv"]) for r in kmeans_cells(emb.repartition(5), n_cells=8, iters=1, seed="hash").collect()}
    assert again == hashed
    with _pytest.raises(ValueError, match="seed mode"):
        kmeans_cells(emb, seed="random")


def test_kmeans_empty_cell_inherits_previous_centroid(spark):
    """Seeds 0 and 1 are identical vectors: every point ties to cell 0
    (smaller cid wins), cell 1 goes empty and must keep its seed
    centroid instead of vanishing or going NULL."""
    from edna_dbt_library_spark.operators.similarity import kmeans_cells, quantize_vec

    rows = [
        (0, [1.0, 1.0]),
        (1, [1.0, 1.0]),  # duplicate of seed 0
        (2, [1.2, 0.9]),
        (3, [0.9, 1.1]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # one iteration: every point ties to cell 0, so cell 1 is empty for
    # that round (a second iteration would legitimately repopulate it
    # once cell 0's centroid moves off the seed)
    cent = {r["cid"]: list(r["cv"]) for r in kmeans_cells(emb, n_cells=2, iters=1).collect()}
    assert set(cent) == {0, 1}
    seed1 = list(
        emb.where("vec_id = 1").select(quantize_vec("embedding").alias("q")).collect()[0]["q"]
    )
    assert cent[1] == seed1  # empty cell inherited its seed
    assert cent[0] != seed1  # populated cell moved to the mean


def test_ivf_and_outliers_reuse_precomputed_centroids(spark):
    """centroids= skips training but is result-identical to the inline
    train (train-once / search-many production path, PLAN_AUDIT.md
    "embedding scale stress": training dominates end-to-end wall)."""
    from edna_dbt_library_spark.operators.similarity import cell_outliers, kmeans_cells

    emb = load_table(spark, SF, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    cent = kmeans_cells(emb, n_cells=16, iters=2)
    inline = ivf_topk(emb, queries, k=10, n_cells=16, n_probe=4, train_iters=2)
    reused = ivf_topk(emb, queries, k=10, n_cells=16, n_probe=4, centroids=cent)
    assert sorted(map(tuple, inline.collect())) == sorted(map(tuple, reused.collect()))
    o_inline = cell_outliers(emb, n_cells=16, iters=2, top_k=3)
    o_reused = cell_outliers(emb, n_cells=16, top_k=3, centroids=cent)
    assert sorted(map(tuple, o_inline.collect())) == sorted(map(tuple, o_reused.collect()))


def test_semantic_dedup_prunes_planted_duplicates(spark):
    """A planted group of near-identical vectors must collapse to one
    kept representative (the min id); unrelated vectors stay kept."""
    from edna_dbt_library_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, SF, "embeddings")
    # plant 3 copies of vector 7 (tiny perturbation keeps cosine ~1)
    clones = emb.where(F.col("vec_id") == 7).crossJoin(
        spark.range(3).select(F.col("id").alias("rep"))
    ).select(
        (F.col("vec_id") * 1000 + F.col("rep") + 1).alias("vec_id"),
        F.transform(
            "embedding", lambda x: (x * (F.lit(1.0) + F.col("rep").cast("double") / 1e5)).cast("float")
        ).alias("embedding"),
        F.col("label"),
    )
    corpus = emb.unionByName(clones)
    verdict = semantic_dedup(corpus, n_cells=8, iters=2, threshold=0.95)
    rows = {r["vec_id"]: r for r in verdict.collect()}
    assert len(rows) == corpus.count()
    group = [7, 7001, 7002, 7003]
    # all four live in one component rooted at 7; only 7 is kept
    assert all(rows[v]["cluster_id"] == 7 for v in group), [rows[v] for v in group]
    assert [v for v in group if rows[v]["keep"]] == [7]
    # keep flag is consistent: keeper iff singleton or component root
    for r in rows.values():
        assert r["keep"] == (r["cluster_id"] is None or r["vec_id"] == r["cluster_id"])


def test_semantic_dedup_without_label_column(spark):
    """Frames without a 'label' column are accepted (r4 ADVICE: the
    select was unconditional) — the verdict is identical modulo the
    NULLed label metadata."""
    from edna_dbt_library_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, SF, "embeddings")
    with_label = semantic_dedup(emb, n_cells=8, iters=2, threshold=0.9)
    no_label = semantic_dedup(emb.drop("label"), n_cells=8, iters=2, threshold=0.9)
    assert with_label.columns == no_label.columns
    a = sorted((r["vec_id"], r["cell"], r["cluster_id"], r["keep"]) for r in with_label.collect())
    b_rows = no_label.collect()
    assert all(r["label"] is None for r in b_rows)
    b = sorted((r["vec_id"], r["cell"], r["cluster_id"], r["keep"]) for r in b_rows)
    assert a == b


def test_semantic_dedup_reuses_centroids(spark):
    from edna_dbt_library_spark.operators.similarity import kmeans_cells, semantic_dedup

    emb = load_table(spark, SF, "embeddings")
    cent = kmeans_cells(emb, n_cells=8, iters=2)
    inline = semantic_dedup(emb, n_cells=8, iters=2, threshold=0.9)
    reused = semantic_dedup(emb, n_cells=8, threshold=0.9, centroids=cent)
    assert sorted(map(tuple, inline.collect())) == sorted(map(tuple, reused.collect()))


def test_semantic_dedup_cell_cap_bounds_pairs_and_stays_consistent(spark):
    """max_cell_size sub-buckets giant cells: the verdict still covers
    every vector exactly once, keep flags stay consistent, and the kill
    set can only SHRINK versus the exact run (pairs are a subset)."""
    from edna_dbt_library_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, SF, "embeddings")
    exact = {r["vec_id"]: r for r in semantic_dedup(emb, n_cells=4, iters=1, threshold=0.25).collect()}
    capped = {r["vec_id"]: r for r in semantic_dedup(
        emb, n_cells=4, iters=1, threshold=0.25, max_cell_size=40
    ).collect()}
    assert set(capped) == set(exact)
    for r in capped.values():
        assert r["keep"] == (r["cluster_id"] is None or r["vec_id"] == r["cluster_id"])
    killed_exact = sum(1 for r in exact.values() if not r["keep"])
    killed_capped = sum(1 for r in capped.values() if not r["keep"])
    assert 0 < killed_capped <= killed_exact
    # a vector with no duplicate in the exact run can't acquire one capped
    for v, r in exact.items():
        if r["cluster_id"] is None:
            assert capped[v]["cluster_id"] is None


def test_incremental_semantic_dedup_store(spark, tmp_path):
    """Incremental SemDeDup against a persistent store: batch 1 seeds
    centroids + kept vectors; batch 2's near-copies of stored content
    are rejected while genuinely new vectors are admitted; replaying a
    batch admits nothing (idempotent, like the text store)."""
    from edna_dbt_library_spark.operators.similarity import (
        run_incremental_semantic_dedup,
    )
    from edna_dbt_library_spark.sources import Warehouse

    wh = Warehouse(spark, str(tmp_path / "wh"))
    store = wh.relation("dedup", "vecstore")
    emb = load_table(spark, SF, "embeddings")

    b1 = emb.where(F.col("vec_id") < 100)
    a1 = run_incremental_semantic_dedup(wh, store, b1, n_cells=8, threshold=0.95)
    admitted1 = {r["vec_id"] for r in a1.collect()}
    assert len(admitted1) > 0
    assert wh.exists(wh.relation("dedup", "vecstore_centroids"))
    n_store_1 = wh.read(store).count()
    assert n_store_1 == len(admitted1)

    # batch 2: clones of stored vectors under NEW ids + genuinely new ones
    clones = emb.where(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform("embedding", lambda x: (x * F.lit(1.000001)).cast("float")).alias(
            "embedding"
        ),
        "label",
    )
    fresh = emb.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 160))
    a2 = run_incremental_semantic_dedup(
        wh, store, clones.unionByName(fresh), n_cells=8, threshold=0.95
    )
    admitted2 = {r["vec_id"] for r in a2.collect()}
    # every clone of an ADMITTED original is rejected; clones of vectors
    # that were themselves deduped away in batch 1 are covered by their
    # kept representative (>= cosine 0.95 transitively may not hold, so
    # only assert clones of admitted originals)
    clone_of_admitted = {v + 10_000 for v in admitted1 if v < 20}
    assert clone_of_admitted.isdisjoint(admitted2)
    assert any(v >= 100 for v in admitted2)  # fresh content got in
    assert wh.read(store).count() == n_store_1 + len(admitted2)

    # replay batch 1: nothing admitted, store unchanged
    a3 = run_incremental_semantic_dedup(wh, store, b1, n_cells=8, threshold=0.95)
    assert a3.count() == 0
    assert wh.read(store).count() == n_store_1 + len(admitted2)


def test_persisted_ivf_index_matches_inline_search(spark, tmp_path):
    """build_ivf_index + ivf_topk_indexed must return exactly what the
    inline ivf_topk returns for the same centroids — persistence cannot
    change a single ranked row. The index table is cell-clustered so
    probes skip row groups."""
    from edna_dbt_library_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk_indexed,
        kmeans_cells,
        ivf_topk,
    )
    from edna_dbt_library_spark.sources import Warehouse

    emb = load_table(spark, SF, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    index = wh.relation("ann", "emb_ivf")
    build_ivf_index(wh, index, emb, n_cells=16, iters=2)

    stored_cent = wh.read(wh.relation("ann", "emb_ivf_centroids"))
    inline = ivf_topk(emb, queries, k=10, n_cells=16, n_probe=4, centroids=stored_cent)
    indexed = ivf_topk_indexed(wh, index, queries, k=10, n_probe=4)
    assert sorted(map(tuple, indexed.collect())) == sorted(map(tuple, inline.collect()))
    # centroids persisted bit-exactly
    fresh = kmeans_cells(emb, n_cells=16, iters=2)
    assert sorted(map(tuple, stored_cent.collect())) == sorted(map(tuple, fresh.collect()))
    # index table carries cluster_by metadata for row-group locality
    assert wh.read_meta(index).cluster_by == ["cell"]


def test_int8_quantized_embeddings_roundtrip_and_search(spark, tmp_path):
    """int8 storage quantization: per-value error within scale/2, ~4x
    smaller parquet than float32, and brute-force cosine top-k over the
    dequantized vectors keeps high recall vs the exact ranking."""
    from edna_dbt_library_spark.functions.vectors import dequantize_int8, quantize_int8

    emb = load_table(spark, SF, "embeddings")
    packed = emb.select("vec_id", "label", quantize_int8("embedding").alias("p"))
    back = packed.select("vec_id", "label", dequantize_int8("p").alias("embedding"))

    # error bound: |x - deq| <= scale/2 + float slack, all rows/dims
    joined = emb.select("vec_id", F.col("embedding").alias("orig")).join(
        packed.select("vec_id", "p"), "vec_id"
    )
    viol = joined.where(
        F.exists(
            F.zip_with(
                "orig",
                dequantize_int8("p"),
                lambda a, b: F.abs(a.cast("double") - b.cast("double"))
                > (F.col("p.scale").cast("double") / 2 + 1e-6),
            ),
            lambda x: x,
        )
    ).count()
    assert viol == 0

    # zero vector edge
    z = spark.createDataFrame([(1, [0.0] * 4)], "vec_id long, embedding array<float>")
    zr = z.select(quantize_int8("embedding").alias("p")).collect()[0]["p"]
    assert zr["scale"] == 0.0 and list(zr["q"]) == [0, 0, 0, 0]

    # storage: int8 parquet much smaller than float32
    import os

    def du(d):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _d, fs in os.walk(d)
            for f in fs
            if f.endswith(".parquet")
        )

    emb.select("vec_id", "embedding").write.parquet(str(tmp_path / "f32"))
    packed.select("vec_id", "p").write.parquet(str(tmp_path / "i8"))
    assert du(str(tmp_path / "i8")) < 0.55 * du(str(tmp_path / "f32"))

    # search quality: recall@10 of dequantized brute force vs exact
    queries = emb.where(F.col("vec_id") < 5)
    exact = {(r["query_id"], r["vec_id"]) for r in brute_force_topk(emb, queries, k=10).collect()}
    approx = {
        (r["query_id"], r["vec_id"])
        for r in brute_force_topk(back, queries, k=10).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, recall


def test_similarity_ops_accept_labelless_frames(spark):
    """Round-5 verdict nit: `label` is optional caller metadata — every
    similarity operator must analyze (and run) on a bare
    (vec_id, embedding) frame, surfacing a typed-NULL label column."""
    from edna_dbt_library_spark.operators.similarity import (
        brute_force_topk,
        cell_outliers,
        ivf_topk,
        lsh_bucketed_topk,
    )

    emb = spark.createDataFrame(
        [(i, [float(i % 7) + 0.5, float((i * 3) % 5), 1.0]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    queries = emb.where(F.col("vec_id") < 3)

    for df in (
        brute_force_topk(emb, queries, k=3),
        lsh_bucketed_topk(emb, queries, k=3, dims=2),
        ivf_topk(emb, queries, k=3, n_cells=4, n_probe=2),
        cell_outliers(emb, n_cells=4, top_k=2),
    ):
        rows = df.collect()
        assert rows, df.columns
        assert all(r["label"] is None for r in rows)
        assert dict(df.dtypes)["label"] == "string"


def test_pq_adc_is_exact_when_quantization_error_is_zero(spark):
    """PQ correctness gate: when every subvector IS a codebook centroid
    (patterns enumerate the first n_cells ids in BOTH subspaces, so
    lowest-id seeding starts at the patterns and Lloyd keeps them), the
    ADC distance equals the exact integer squared-L2 — ranks, ties, and
    values all match brute force."""
    from edna_dbt_library_spark.operators.similarity import pq_adc_topk

    pats = [
        [0.0, 0.0, 0.0, 0.0],
        [1.0, 1.0, 1.0, 1.0],
        [2.0, 0.0, 2.0, 0.0],
        [0.0, 3.0, 0.0, 3.0],
    ]
    rows = []
    for i in range(40):
        a = pats[i % 4]
        b = pats[i % 4] if i < 4 else pats[(i // 4) % 4]
        rows.append((i, a + b, "x"))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    got = pq_adc_topk(
        emb, emb.where(F.col("vec_id") < 3), k=5, m=2, n_cells=4, train_iters=3
    )

    def sq(u, v):
        return sum((int(round(x * 1024)) - int(round(y * 1024))) ** 2 for x, y in zip(u, v))

    by_id = {r[0]: r[1] for r in rows}
    for qid in range(3):
        exact = sorted(((sq(by_id[qid], by_id[v]), v) for v in by_id if v != qid))[:5]
        mine = sorted(
            (r["adc_dist"], r["vec_id"])
            for r in got.where(F.col("query_id") == qid).collect()
        )
        assert exact == mine, (qid, exact, mine)


def test_pq_codes_compact_and_search_deterministic(spark):
    """PQ on the fixtures: codes are m small ints per vector (the RAM
    form of the index), search is bit-deterministic under repartition,
    and recall vs exact integer-L2 brute force clears a floor — iid
    synthetic embeddings are PQ's worst case (distance concentration),
    so the floor is deliberately modest; correctness is gated by the
    exactness test above and the ann_pq_adc_topk oracle replay."""
    from pyspark.sql import Window

    from edna_dbt_library_spark.operators.similarity import (
        _int_sqdist,
        pq_adc_topk,
        pq_codebooks,
        pq_encode,
        quantize_vec,
    )

    emb = load_table(spark, SF, "embeddings")
    q = emb.where(F.col("vec_id") < 5)
    cb = pq_codebooks(emb, m=4, n_cells=16, iters=2)
    assert cb.count() == 64  # 4 subspaces x 16 centroids
    codes = pq_encode(emb, cb)
    n_vec = emb.count()
    assert codes.count() == 4 * n_vec
    assert codes.agg(F.max("code")).first()[0] <= 15

    a = {(r["query_id"], r["vec_id"]) for r in pq_adc_topk(emb, q, k=10, codebooks=cb).collect()}
    b = {
        (r["query_id"], r["vec_id"])
        for r in pq_adc_topk(emb.repartition(13), q, k=10, codebooks=cb).collect()
    }
    assert a == b and len(a) == 50

    docs = emb.select(F.col("vec_id").alias("vid"), quantize_vec("embedding").alias("dq"))
    qs = q.select(F.col("vec_id").alias("query_id"), quantize_vec("embedding").alias("qq"))
    sc = (
        docs.crossJoin(F.broadcast(qs))
        .where(F.col("vid") != F.col("query_id"))
        .select("query_id", "vid", _int_sqdist(F.col("dq"), F.col("qq")).alias("d"))
    )
    w = Window.partitionBy("query_id").orderBy("d", "vid")
    exact = {
        (r["query_id"], r["vid"])
        for r in sc.withColumn("rk", F.row_number().over(w)).where("rk <= 10").collect()
    }
    recall = len(exact & a) / len(exact)
    assert recall >= 0.2, f"PQ recall collapsed: {recall}"


def test_ivf_pq_recall_and_subset_of_full_pq_scan(spark):
    """IVF+PQ (r8): probed-cell ADC must (a) keep useful recall vs the
    exact ranking, (b) agree with the FULL PQ scan's distance for every
    returned pair (the coarse quantizer only restricts candidates, never
    changes a distance), and (c) be deterministic under repartitioning."""
    from edna_dbt_library_spark.operators.similarity import ivf_pq_topk, pq_adc_topk

    emb = load_table(spark, SF, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    out = ivf_pq_topk(emb, queries, k=10, n_cells=16, n_probe=4, m=4, pq_cells=16)
    rows = out.collect()
    assert len(rows) == 50

    exact = brute_force_topk(emb, queries, k=10)
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in rows}
    recall = len(e & a) / len(e)
    # two lossy stages (4/16 probed cells x 4x16 PQ codes); measured ~0.5+
    assert recall >= 0.3, f"IVF+PQ recall collapsed: {recall}"

    full = {
        (r["query_id"], r["vec_id"]): r["adc_dist"]
        for r in pq_adc_topk(emb, queries, k=10_000).collect()
    }
    assert all(full[(r["query_id"], r["vec_id"])] == r["adc_dist"] for r in rows)

    again = ivf_pq_topk(emb.repartition(13), queries, k=10, n_cells=16, n_probe=4)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_pca_projection_from_exact_gram(spark):
    """PCA (r8): the Gram statistic is exact-integer (oracle-gated in
    the registry); here the driver-side eigendecomposition + cluster-side
    projection must (a) order components by captured variance, (b)
    capture exactly the eigenvalue mass the spectrum promises, and (c)
    be bit-deterministic under repartitioning (row-local folds over
    literal eigenvectors)."""
    import numpy as np

    from edna_dbt_library_spark.operators.similarity import (
        KMEANS_SCALE,
        embedding_gram,
        pca_project,
    )

    emb = load_table(spark, SF, "embeddings")
    k = 8
    gram = embedding_gram(emb).localCheckpoint(eager=True)
    proj = pca_project(emb, k=k, gram=gram)
    rows = proj.collect()
    n = emb.count()
    assert len(rows) == n and len(rows[0]) == k + 1

    # eigen mass accounting: sample variance of pc_c == lambda_c / (n*scale^2)
    G = np.zeros((64, 64))
    for r in gram.collect():
        G[r["i"], r["j"]] = G[r["j"], r["i"]] = float(r["g"])
    vals = np.sort(np.linalg.eigvalsh(G))[::-1]
    X = np.array([[r[f"pc{c}"] for c in range(k)] for r in rows])
    # projections are centered by construction -> E[pc] ~ 0
    sq = (X * X).sum(axis=0) * (KMEANS_SCALE**2)
    assert np.all(sq[:-1] >= sq[1:] - 1e-6)  # variance-ordered
    rel = np.abs(sq - vals[:k]) / np.maximum(vals[:k], 1.0)
    assert np.max(rel) < 1e-9, rel  # exactly the promised eigen mass

    again = pca_project(emb.repartition(13), k=k, gram=gram).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_random_projection_preserves_distances_and_is_deterministic(spark):
    """JL projection (r8): for sampled vector pairs the projected
    squared distance scaled by 1/k must concentrate around the original
    quantized squared distance (the JL guarantee the reduction is for),
    and the exact-integer fold must be bit-stable under repartitioning."""
    import statistics

    from edna_dbt_library_spark.operators.similarity import (
        quantize_vec,
        random_projection,
    )

    emb = load_table(spark, SF, "embeddings")
    k = 16
    proj = random_projection(emb, k=k)
    rows = proj.collect()
    by_vec = {}
    for r in rows:
        by_vec.setdefault(r["vec_id"], [0] * k)[r["j"]] = r["p"]
    qrows = {
        r["vec_id"]: r["qv"]
        for r in emb.select("vec_id", quantize_vec("embedding").alias("qv")).collect()
    }
    ids = sorted(by_vec)[:40]
    ratios = []
    for a, b in zip(ids[:-1], ids[1:]):
        d_orig = sum((x - y) ** 2 for x, y in zip(qrows[a], qrows[b]))
        d_proj = sum((x - y) ** 2 for x, y in zip(by_vec[a], by_vec[b])) / k
        if d_orig > 0:
            ratios.append(d_proj / d_orig)
    med = statistics.median(ratios)
    assert 0.5 < med < 2.0, med  # concentration around 1
    assert sum(1 for r in ratios if 0.2 < r < 5.0) >= 0.9 * len(ratios)

    again = random_projection(emb.repartition(13), k=k).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_pq_codebooks_fused_equals_per_slice_kmeans(spark):
    """The fused multi-subspace training (one corpus pass per Lloyd
    iteration) must be BIT-IDENTICAL to m independent kmeans_cells runs
    over the sliced vectors — disjoint sub-keyed lanes, same lowest-id
    seeds, same tie-breaks, same integer means. This is the lock that
    keeps the per-subspace oracle CTE chains valid."""
    from pyspark.sql import functions as F

    from edna_dbt_library_spark.operators.similarity import (
        KMEANS_SCALE,
        kmeans_cells,
        pq_codebooks,
    )
    from edna_dbt_library_spark.sources import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    m, n_cells, iters = 4, 16, 2
    fused = {
        (r["sub"], r["cid"]): tuple(r["cv"])
        for r in pq_codebooks(emb, m=m, n_cells=n_cells, iters=iters).collect()
    }
    dims = emb.select(F.size("embedding").alias("d")).first()["d"]
    d0 = dims // m
    per_slice = {}
    for s in range(m):
        sl = emb.select(
            "vec_id", F.slice(F.col("embedding"), s * d0 + 1, d0).alias("embedding")
        )
        for r in kmeans_cells(sl, n_cells, iters, KMEANS_SCALE).collect():
            per_slice[(s, r["cid"])] = tuple(r["cv"])
    assert fused == per_slice


def test_persisted_ivfpq_index_matches_inline_search(spark, tmp_path):
    """build_ivfpq_index + ivf_pq_topk_indexed must return exactly what
    the inline ivf_pq_topk returns for the same stored centroids AND
    codebooks — persistence cannot change a single ranked row, and the
    search never touches a float corpus vector."""
    from edna_dbt_library_spark.operators.similarity import (
        build_ivfpq_index,
        ivf_pq_topk,
        ivf_pq_topk_indexed,
    )
    from edna_dbt_library_spark.sources import Warehouse

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    index = wh.relation("ann", "emb_ivfpq")
    build_ivfpq_index(wh, index, emb, n_cells=16, m=4, pq_cells=16, iters=2)

    cent = wh.read(wh.relation("ann", "emb_ivfpq_centroids"))
    cb = wh.read(wh.relation("ann", "emb_ivfpq_codebooks"))
    inline = ivf_pq_topk(
        emb, queries, k=10, n_probe=4, centroids=cent, codebooks=cb
    )
    indexed = ivf_pq_topk_indexed(wh, index, queries, k=10, n_probe=4)
    assert sorted(map(tuple, indexed.collect())) == sorted(map(tuple, inline.collect()))
    assert wh.read_meta(index).cluster_by == ["cell"]
    # the index holds one cell + m codes per vector
    n_vec = emb.count()
    assert wh.read(index).count() == n_vec * 4


def test_fused_ivfpq_training_equals_separate_trainers(spark):
    """train_ivfpq (one corpus pass per iteration for BOTH quantizers)
    must be bit-identical to kmeans_cells + pq_codebooks — the lock
    that lets ivf_pq_topk swap in the fused trainer while the oracle
    CTE chains keep replaying the separate-trainer arithmetic. Also
    covers n_cells != pq_cells (different seed widths share one merged
    seed map)."""
    from edna_dbt_library_spark.operators.similarity import (
        KMEANS_SCALE,
        kmeans_cells,
        pq_codebooks,
        train_ivfpq,
    )

    emb = load_table(spark, SF, "embeddings")
    for n_cells, m, pq_cells in ((8, 4, 8), (4, 2, 8)):
        cent_f, cb_f = train_ivfpq(emb, n_cells, m, pq_cells, iters=2)
        cent_s = kmeans_cells(emb, n_cells, 2, KMEANS_SCALE, "vec_id", "embedding")
        cb_s = pq_codebooks(emb, m, pq_cells, 2, KMEANS_SCALE, "vec_id", "embedding")
        key_c = lambda r: int(r["cid"])
        assert sorted(map(tuple, cent_f.collect()), key=lambda t: t[0]) == sorted(
            map(tuple, cent_s.collect()), key=lambda t: t[0]
        ), (n_cells, m, pq_cells, "coarse")
        assert sorted(map(tuple, cb_f.collect())) == sorted(
            map(tuple, cb_s.collect())
        ), (n_cells, m, pq_cells, "books")


def test_append_to_ivfpq_index_equals_rebuild_encode(spark, tmp_path):
    """FAISS add-after-train shape: appending new vectors encoded with
    the index's FROZEN quantizers must leave the index row-set
    IDENTICAL to a from-scratch encode of the union with the same
    quantizers (deterministic exact-integer assignment), and the
    indexed search over the grown index must equal the inline search
    with those quantizers over the union."""
    from edna_dbt_library_spark.operators.similarity import (
        KMEANS_SCALE,
        _ivfpq_codes_cell,
        _pq_shape,
        append_to_ivfpq_index,
        build_ivfpq_index,
        ivf_pq_topk,
        ivf_pq_topk_indexed,
    )
    from edna_dbt_library_spark.sources import Warehouse

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    base = emb.where(F.col("vec_id") % 3 != 0)
    extra = emb.where(F.col("vec_id") % 3 == 0)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    index = wh.relation("ann", "grow_ivfpq")
    build_ivfpq_index(wh, index, base, n_cells=16, m=4, pq_cells=16, iters=2)
    append_to_ivfpq_index(wh, index, extra)

    cent = wh.read(wh.relation("ann", "grow_ivfpq_centroids"))
    cb = wh.read(wh.relation("ann", "grow_ivfpq_codebooks"))
    m, d0 = _pq_shape(cb)
    want = _ivfpq_codes_cell(emb, cent, cb, m, d0, KMEANS_SCALE, "vec_id", "embedding")
    assert sorted(map(tuple, wh.read(index).collect())) == sorted(
        map(tuple, want.collect())
    )

    queries = emb.where(F.col("vec_id") < 5)
    inline = ivf_pq_topk(emb, queries, k=10, n_probe=4, centroids=cent, codebooks=cb)
    indexed = ivf_pq_topk_indexed(wh, index, queries, k=10, n_probe=4)
    assert sorted(map(tuple, indexed.collect())) == sorted(
        map(tuple, inline.collect())
    )


def test_stream_ivfpq_index_drain_equals_batch_encode(spark, tmp_path):
    """Streaming ANN maintenance gate (LSM design): a full drain of
    stream_ivfpq_index must leave the LIVE code view IDENTICAL to a
    from-scratch encode of the source with the same frozen quantizers;
    a re-streamed vector REPLACES its codes via the delta segment
    (never a main-segment key scan); compact_ivfpq_index folds the
    delta back into a pure cell-clustered main segment with identical
    search results."""
    from edna_dbt_library_spark.operators.similarity import (
        KMEANS_SCALE,
        _ivfpq_codes_cell,
        _ivfpq_delta_rel,
        _ivfpq_live_codes,
        _pq_shape,
        build_ivfpq_index,
        compact_ivfpq_index,
        ivf_pq_topk_indexed,
    )
    from edna_dbt_library_spark.sources import TableMeta, Warehouse
    from edna_dbt_library_spark.streaming.incremental_stream import (
        stream_ivfpq_index,
    )

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    base = emb.where(F.col("vec_id") % 4 == 0)
    wh = Warehouse(spark, str(tmp_path / "wh"))
    index = wh.relation("ann", "stream_ivfpq")
    build_ivfpq_index(wh, index, base, n_cells=16, m=4, pq_cells=16, iters=2)
    n_main = wh.read(index).count()

    src = wh.relation("vec", "incoming")
    batch1 = emb.where(F.col("vec_id") % 4 == 1)
    wh.create_as(src, batch1, TableMeta())
    cp = str(tmp_path / "cp")
    stream_ivfpq_index(wh, src, index, cp).awaitTermination()

    cent = wh.read(wh.relation("ann", "stream_ivfpq_centroids"))
    cb = wh.read(wh.relation("ann", "stream_ivfpq_codebooks"))
    m, d0 = _pq_shape(cb)

    def encode(df):
        return _ivfpq_codes_cell(
            df, cent, cb, m, d0, KMEANS_SCALE, "vec_id", "embedding"
        )

    want = encode(base.unionAll(batch1))
    assert sorted(map(tuple, _ivfpq_live_codes(wh, index).collect())) == sorted(
        map(tuple, want.collect())
    )
    # the stream landed in the delta: main untouched by vid probes
    assert wh.read(index).count() == n_main
    assert wh.read(_ivfpq_delta_rel(wh, index)).count() > 0

    # second drain: new vectors + a re-streamed one (codes replaced)
    redo_id = batch1.select(F.min("vec_id")).first()[0]
    batch2 = emb.where(F.col("vec_id") % 4 == 2).unionAll(
        emb.where(F.col("vec_id") == redo_id)
    )
    wh.append(src, batch2)
    stream_ivfpq_index(wh, src, index, cp).awaitTermination()
    union = base.unionAll(emb.where(F.col("vec_id") % 4 == 1)).unionAll(
        emb.where(F.col("vec_id") % 4 == 2)
    )
    want2 = encode(union)
    got2 = _ivfpq_live_codes(wh, index)
    assert got2.where(F.col("vid") == redo_id).count() == 4  # m rows, once
    assert sorted(map(tuple, got2.collect())) == sorted(
        map(tuple, want2.collect())
    )

    # segment merge: search identical before and after the fold
    queries = emb.where(F.col("vec_id") < 5)
    pre = sorted(map(tuple, ivf_pq_topk_indexed(wh, index, queries, k=10).collect()))
    compact_ivfpq_index(wh, index)
    assert not wh.exists(_ivfpq_delta_rel(wh, index))
    assert wh.read(index).count() == union.count() * 4
    post = sorted(map(tuple, ivf_pq_topk_indexed(wh, index, queries, k=10).collect()))
    assert pre == post
