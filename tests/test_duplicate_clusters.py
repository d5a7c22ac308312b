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


def test_winnowing_hand_computed_selection(spark):
    """k=2, window=2 over 'abcd': grams ab,bc,cd -> windows (ab,bc),(bc,cd);
    each fingerprint is the min hash of its window, positions are 1-based."""
    from edna_dbt_library_spark.operators.dedup import (
        minhash_word_value,
        winnowing_fingerprints,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "abcd")], "doc_id long, text string")
    got = {(r["fp"], r["first_window"]) for r in
           winnowing_fingerprints(df, k=2, window=2).collect()}
    h = {g: spark.range(1).select(minhash_word_value(F.lit(g)).alias("h")).collect()[0]["h"]
         for g in ("ab", "bc", "cd")}
    expect = {}
    for start, pair in ((1, ("ab", "bc")), (2, ("bc", "cd"))):
        fp = min(h[g] for g in pair)
        expect.setdefault(fp, start)
    assert got == set(expect.items())


def test_winnowing_shared_substring_guarantee_and_determinism(spark):
    """Docs sharing a substring of >= k+window-1 chars share a fingerprint;
    selection is stable under repartitioning."""
    from edna_dbt_library_spark.operators.dedup import winnowing_fingerprints

    shared = "the quick brown fox jumps over the lazy dog"
    df = spark.createDataFrame(
        [
            (1, f"left context before {shared} and some trailing text"),
            (2, f"completely different opening {shared} different ending too"),
            (3, "no overlap with anything else here at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    fps = winnowing_fingerprints(df, k=8, window=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared 44-char substring must share a fingerprint"
    # density sanity: winnowing selects far fewer fingerprints than grams
    n_grams = len("completely different opening " + shared + " different ending too") - 8 + 1
    assert len(by_doc[2]) < n_grams / 2
    a = sorted(map(tuple, fps.collect()))
    b = sorted(map(tuple, winnowing_fingerprints(df.repartition(5), k=8, window=4).collect()))
    assert a == b


def test_winnowing_short_docs_and_validation(spark):
    import pytest as _pytest

    from edna_dbt_library_spark.operators.dedup import winnowing_fingerprints

    df = spark.createDataFrame(
        [(1, "tiny"), (2, None), (3, "exactly11ch")], "doc_id long, text string"
    )
    rows = winnowing_fingerprints(df, k=8, window=4).collect()
    # doc 3 has exactly k+window-1 = 11 chars -> exactly one window
    assert {r["doc_id"] for r in rows} == {3}
    assert len(rows) == 1 and rows[0]["first_window"] == 1
    with _pytest.raises(ValueError, match="k and window"):
        winnowing_fingerprints(df, k=0)


def test_winnowing_segment_boundaries_exact_equality(spark):
    """Segment sizes at and around every boundary (1, tiny, mid, >= W,
    default) reproduce the unchunked fingerprint set bit-for-bit on a
    multi-KB doc, a mid-size doc and a too-short doc."""
    from edna_dbt_library_spark.operators.dedup import winnowing_fingerprints

    long_text = " ".join(f"tok{i % 37} w{(i * i) % 101}" for i in range(400))
    df = spark.createDataFrame(
        [(1, long_text), (2, long_text[100:1500]), (3, "short")],
        "doc_id long, text string",
    )
    ref = sorted(map(tuple, winnowing_fingerprints(df, k=8, window=4, segment=None).collect()))
    assert ref, "fixture must fingerprint"
    for seg in (1, 7, 64, 65536, 10_000_000):
        got = sorted(map(tuple, winnowing_fingerprints(df, k=8, window=4, segment=seg).collect()))
        assert got == ref, f"segment={seg} diverged from unchunked"
    import pytest

    with pytest.raises(ValueError, match="segment"):
        winnowing_fingerprints(df, segment=0)


def test_winnowing_overlap_pairs_finds_shared_passage(spark):
    from edna_dbt_library_spark.operators.dedup import winnowing_overlap_pairs

    passage = "the five boxing wizards jump quickly over every lazy dog tonight"
    rows = [
        (1, f"intro text alpha beta {passage} closing remarks one"),
        (2, f"unrelated opening words {passage} and a different tail"),
        (3, "completely disjoint content with nothing shared at all here"),
        (4, "another disjoint document with its own private words only"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_a"], r["doc_b"]): r["n_shared"]
           for r in winnowing_overlap_pairs(df, min_shared=3, max_bucket_size=None).collect()}
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] >= 3
    # raising min_shared above the overlap kills the pair
    assert winnowing_overlap_pairs(df, min_shared=10_000).count() == 0


# --- prefix-filtered exact Jaccard self-join (AllPairs) ---------------------


def _jje_docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),   # near-dup of 1
        (3, "alpha beta gamma delta epsilon zeta eta theta"),  # exact dup of 1
        (4, "totally different words with nothing in common here"),
        (5, "short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bf_pairs(spark, df, t_num, t_den, n=3):
    from edna_dbt_library_spark.functions.text import shingles

    ws = F.array_distinct(shingles(F.col("text"), n))
    s = df.select(F.col("doc_id").alias("id"), ws.alias("ws")).where(F.size("ws") > 0)
    a = s.select(F.col("id").alias("doc_a"), F.col("ws").alias("wa"))
    b = s.select(F.col("id").alias("doc_b"), F.col("ws").alias("wb"))
    return {
        (r["doc_a"], r["doc_b"], r["ni"], r["na"], r["nb"])
        for r in a.crossJoin(b)
        .where(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("wa", "wb")).cast("long").alias("ni"),
            F.size("wa").cast("long").alias("na"),
            F.size("wb").cast("long").alias("nb"),
        )
        .where((t_den + t_num) * F.col("ni") >= t_num * (F.col("na") + F.col("nb")))
        .collect()
    }


def test_jaccard_join_exact_hand_vectors(spark):
    from edna_dbt_library_spark.operators.dedup import jaccard_join_exact

    df = _jje_docs(spark)
    got = {
        (r["doc_a"], r["doc_b"], r["n_int"], r["n_a"], r["n_b"])
        for r in jaccard_join_exact(df, threshold=(3, 5), shingle_n=3).collect()
    }
    assert got == _bf_pairs(spark, df, 3, 5)
    # the exact dup pair (1,3): full intersection, permille 1000
    perm = {
        (r["doc_a"], r["doc_b"]): r["jacc_permille"]
        for r in jaccard_join_exact(df, threshold=(3, 5), shingle_n=3).collect()
    }
    assert perm[(1, 3)] == 1000


def test_jaccard_join_exact_matches_brute_force_on_fixture(spark, sf_dir):
    from edna_dbt_library_spark.operators.dedup import jaccard_join_exact

    docs = load_table(spark, sf_dir, "documents")
    got = {
        (r["doc_a"], r["doc_b"], r["n_int"], r["n_a"], r["n_b"])
        for r in jaccard_join_exact(docs, threshold=(3, 5), shingle_n=3).collect()
    }
    assert got == _bf_pairs(spark, docs, 3, 5)
    assert len(got) > 0  # the fixture's near-dup clusters must surface


def test_jaccard_join_exact_threshold_validation_and_cap(spark):
    import pytest as _pytest

    from edna_dbt_library_spark.operators.dedup import jaccard_join_exact

    df = _jje_docs(spark)
    with _pytest.raises(ValueError):
        jaccard_join_exact(df, threshold=(6, 5))
    # a huge cap changes nothing (every bucket is under it)
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_join_exact(
            df, threshold=(3, 5), shingle_n=3, max_prefix_bucket=10_000
        ).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in jaccard_join_exact(df, threshold=(3, 5), shingle_n=3).collect()
    }
    assert capped == exact


def test_incremental_jaccard_join_accumulates_to_full_corpus(spark, sf_dir, tmp_path):
    """Two batches through the persistent store == jaccard_join_exact over
    the whole corpus (exactness is order-independent even though the
    frozen first-batch order yields different candidates), and replaying
    an ingested batch emits nothing and leaves the store byte-stable."""
    from edna_dbt_library_spark.operators.dedup import (
        jaccard_join_exact,
        run_incremental_jaccard_join,
    )
    from edna_dbt_library_spark.sources import Warehouse

    docs = load_table(spark, sf_dir, "documents")
    wh = Warehouse(spark, str(tmp_path / "wh"))
    store = wh.relation("an", "jjstore")

    b1 = docs.where(F.col("doc_id") % 2 == 0)
    b2 = docs.where(F.col("doc_id") % 2 == 1)
    key = lambda r: (r["doc_a"], r["doc_b"], r["n_int"], r["n_a"], r["n_b"])  # noqa: E731
    p1 = {key(r) for r in run_incremental_jaccard_join(wh, store, b1).collect()}
    p2 = {key(r) for r in run_incremental_jaccard_join(wh, store, b2).collect()}
    full = {key(r) for r in jaccard_join_exact(docs, threshold=(3, 5), shingle_n=3).collect()}
    assert p1 | p2 == full
    assert not (p1 & p2)  # old-vs-old pairs are never re-emitted

    before = sorted(map(tuple, wh.read(store).collect()))
    replay = run_incremental_jaccard_join(wh, store, b1)
    assert replay.count() == 0
    assert sorted(map(tuple, wh.read(store).collect())) == before


def test_stream_jaccard_join_matches_one_shot(spark, sf_dir, tmp_path):
    """Two micro-batches drained through stream_jaccard_join == the
    one-shot whole-corpus jaccard_join_exact, with pair subdirs written
    through the pre-store-mutation pairs_sink; a fresh-checkpoint
    re-drain of the same source adds nothing (operator-level replay)."""
    from edna_dbt_library_spark.operators.dedup import jaccard_join_exact
    from edna_dbt_library_spark.sources import Warehouse
    from edna_dbt_library_spark.streaming import stream_jaccard_join

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src, pairs, ckpt, ckpt2 = (str(tmp_path / d) for d in ("src", "pairs", "ck1", "ck2"))
    wh = Warehouse(spark, str(tmp_path / "wh"))
    store = wh.relation("an", "sjj")

    docs.where(F.col("doc_id") % 2 == 0).write.parquet(src, mode="overwrite")
    stream = spark.readStream.schema(docs.schema).parquet(src)
    stream_jaccard_join(stream, wh, store, pairs, ckpt).awaitTermination(180)
    docs.where(F.col("doc_id") % 2 == 1).write.parquet(src, mode="append")
    stream = spark.readStream.schema(docs.schema).parquet(src)
    stream_jaccard_join(stream, wh, store, pairs, ckpt).awaitTermination(180)

    key = lambda r: (r["doc_a"], r["doc_b"], r["n_int"])  # noqa: E731
    streamed = {key(r) for r in spark.read.parquet(pairs).collect()}
    full = {key(r) for r in jaccard_join_exact(docs, threshold=(3, 5), shingle_n=3).collect()}
    assert streamed == full

    # operator-level replay: a fresh checkpoint re-reads everything; no
    # new ids -> the sink hook never fires -> pair set unchanged
    stream = spark.readStream.schema(docs.schema).parquet(src)
    stream_jaccard_join(stream, wh, store, pairs, ckpt2).awaitTermination(180)
    assert {key(r) for r in spark.read.parquet(pairs).collect()} == full


def test_incremental_jaccard_first_batch_crash_is_repairable(spark, sf_dir, tmp_path):
    """ADVICE r8: the first-batch commit point is the STORE create, which
    must come LAST — a crash mid-first-batch must leave exists(store)
    False so the retry re-runs the first path (CREATE OR REPLACE the
    auxiliaries), never the not-first path against a missing _order."""
    from edna_dbt_library_spark.operators.dedup import (
        jaccard_join_exact,
        run_incremental_jaccard_join,
    )
    from edna_dbt_library_spark.sources import Warehouse

    docs = load_table(spark, sf_dir, "documents")
    wh = Warehouse(spark, str(tmp_path / "wh"))
    store = wh.relation("an", "jjcrash")
    b1 = docs.where(F.col("doc_id") % 2 == 0)
    b2 = docs.where(F.col("doc_id") % 2 == 1)

    # crash injection: die exactly at the store create (the last step)
    orig = Warehouse.create_as

    def boom(self, rel, df, meta=None):
        if rel.identifier == "jjcrash":
            raise RuntimeError("injected crash at commit point")
        return orig(self, rel, df, meta)

    Warehouse.create_as = boom
    try:
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="injected crash"):
            run_incremental_jaccard_join(wh, store, b1)
    finally:
        Warehouse.create_as = orig
    # auxiliaries exist, store does not -> next call retries the FIRST path
    assert not wh.exists(store)
    assert wh.exists(wh.relation("an", "jjcrash_order"))
    assert wh.exists(wh.relation("an", "jjcrash_prefix"))

    key = lambda r: (r["doc_a"], r["doc_b"], r["n_int"], r["n_a"], r["n_b"])  # noqa: E731
    p1 = {key(r) for r in run_incremental_jaccard_join(wh, store, b1).collect()}
    p2 = {key(r) for r in run_incremental_jaccard_join(wh, store, b2).collect()}
    full = {key(r) for r in jaccard_join_exact(docs, threshold=(3, 5), shingle_n=3).collect()}
    assert p1 | p2 == full
