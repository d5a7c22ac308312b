"""Connected-components dedup clustering."""

from pyspark.sql import functions as F

from edna_dbt_library_spark.operators.dedup import duplicate_clusters, lsh_candidate_pairs
from edna_dbt_library_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a bigint, doc_b bigint")


def test_clusters_basic_chain_and_islands(spark):
    # chain 1-2-3-4 (one component), pair 10-11, isolated-by-absence 99
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    got = {r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_clusters_long_chain_converges(spark):
    # a path graph of length 12 needs multiple propagation rounds
    pairs = _pairs(spark, [(i, i + 1) for i in range(1, 13)])
    got = {r["doc_id"]: r["cluster_id"] for r in duplicate_clusters(pairs).collect()}
    assert set(got.values()) == {1}
    assert len(got) == 13


def test_clusters_on_lsh_pairs(spark):
    docs = load_table(spark, SF, "documents")
    pairs = lsh_candidate_pairs(docs, 8, 4, max_bucket_size=64)
    clusters = duplicate_clusters(pairs)
    rows = clusters.collect()
    assert len(rows) > 0
    # representative invariants: cluster_id <= doc_id, and every
    # representative is a member of its own cluster
    by_cluster = {}
    for r in rows:
        assert r["cluster_id"] <= r["doc_id"]
        by_cluster.setdefault(r["cluster_id"], set()).add(r["doc_id"])
    for rep, members in by_cluster.items():
        assert rep in members
    # pair endpoints always share a cluster
    label = {r["doc_id"]: r["cluster_id"] for r in rows}
    for p in pairs.collect():
        assert label[p["doc_a"]] == label[p["doc_b"]]
