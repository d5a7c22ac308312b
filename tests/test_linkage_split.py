"""Edit-distance record linkage (operators/dedup.edit_distance_pairs)
and deterministic train/val/test assignment (operators/curation.hash_split)."""

import pytest
from pyspark.sql import functions as F

from edna_dbt_library_spark.operators.curation import hash_split
from edna_dbt_library_spark.operators.dedup import edit_distance_pairs
from edna_dbt_library_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_edit_distance_pairs_planted_typos(spark):
    rows = [
        (1, "jon smith"),
        (2, "john smith"),   # insertion: d=1 from 1
        (3, "jon smyth"),    # substitution: d=1 from 1
        (4, "mary jones"),
        (5, "mary janes"),   # substitution: d=1 from 4
        (6, "completely different"),
        (7, "aon smith"),    # d=1 from 1 but FIRST CHAR edited: blocked away
        (8, None),
        (9, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["doc_a"], r["doc_b"]): r["distance"]
        for r in edit_distance_pairs(df, max_dist=1).collect()
    }
    assert pairs[(1, 3)] == 1 and pairs[(4, 5)] == 1
    assert pairs[(1, 2)] == 1  # length differs by 1: neighbor band join
    assert (2, 3) not in pairs  # d=2: verified away
    assert all(6 not in p and 8 not in p and 9 not in p for p in pairs)
    # documented recall trade: the first-character block misses (1, 7)
    assert (1, 7) not in pairs


def test_edit_distance_pairs_blocked_subset_of_exhaustive(spark):
    """Every blocked pair is a TRUE pair (distance verified exactly),
    and blocking only ever loses first-character-edit pairs."""
    parts = load_table(spark, SF, "part").select("p_partkey", "p_name").limit(150)
    got = edit_distance_pairs(parts, text_col="p_name", id_col="p_partkey", max_dist=1)
    rows = [(r["doc_a"], r["doc_b"], r["distance"]) for r in got.collect()]
    names = {r["p_partkey"]: r["p_name"].lower() for r in parts.collect()}

    def lev(a, b):
        import functools

        @functools.lru_cache(maxsize=None)
        def d(i, j):
            if i == 0:
                return j
            if j == 0:
                return i
            return min(
                d(i - 1, j) + 1,
                d(i, j - 1) + 1,
                d(i - 1, j - 1) + (a[i - 1] != b[j - 1]),
            )

        return d(len(a), len(b))

    exhaustive = {
        (x, y): lev(names[x], names[y])
        for x in names
        for y in names
        if x < y and lev(names[x], names[y]) <= 1
    }
    for a, b, dist in rows:
        assert exhaustive[(a, b)] == dist  # no false positives, exact distances
    missed = set(exhaustive) - {(a, b) for a, b, _ in rows}
    for a, b in missed:  # only first-char edits may be missed
        assert names[a][0] != names[b][0], (names[a], names[b])


def test_edit_distance_pairs_no_duplicate_rows(spark):
    parts = load_table(spark, SF, "part").select("p_partkey", "p_name")
    got = edit_distance_pairs(parts, text_col="p_name", id_col="p_partkey", max_dist=1)
    n = got.count()
    assert n == got.select("doc_a", "doc_b").distinct().count() > 0


def test_hash_split_deterministic_and_consistent(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.repartition(7), "doc_id").collect()
    }
    assert a == b  # partitioning never changes membership
    # a DIFFERENT table sharing the key lands in the same split
    other = docs.select("doc_id", F.lit(1).alias("x"))
    c = {r["doc_id"]: r["split"] for r in hash_split(other, "doc_id").collect()}
    assert a == c
    # proportions land near 90/5/5 on 500 docs
    from collections import Counter

    frac = Counter(a.values())
    assert 0.8 <= frac["train"] / len(a) <= 0.97
    assert frac["val"] > 0 and frac["test"] > 0
    # salt re-deals the assignment
    d = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id", salt="v2").collect()}
    assert d != a


def test_hash_split_validation_and_plan(spark):
    docs = load_table(spark, SF, "documents").select("doc_id")
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(docs, "doc_id", {"train": 0.5, "test": 0.4})
    with pytest.raises(ValueError, match="at least one"):
        hash_split(docs, "doc_id", {})
    plan = (
        hash_split(docs, "doc_id")._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # zero-shuffle scan-side label
    assert "BatchEvalPython" not in plan


def test_edit_distance_pairs_collapse_exact(spark):
    """collapse_exact: distance-0 cliques never enumerate; cross-string
    pairs carry clique sizes and use min-id representatives."""
    rows = [
        (1, "red widget"),
        (2, "red widget"),   # exact dup of 1 -> same clique
        (7, "red widget"),   # and another
        (4, "red widgets"),  # d=1 from the clique string
        (5, "blue bolt"),
        (6, "blue boltz"),   # d=1 from 5
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    flat = {
        (r["doc_a"], r["doc_b"]): r["distance"]
        for r in edit_distance_pairs(df, max_dist=1).collect()
    }
    # uncollapsed enumerates the clique: (1,2),(1,7),(2,7) at distance 0
    assert flat[(1, 2)] == 0 and flat[(2, 7)] == 0
    got = {
        (r["doc_a"], r["doc_b"]): (r["distance"], r["n_a"], r["n_b"])
        for r in edit_distance_pairs(df, max_dist=1, collapse_exact=True).collect()
    }
    # clique pairs gone; representative (min id 1) pairs with 4 carrying n=3
    assert got == {(1, 4): (1, 3, 1), (5, 6): (1, 1, 1)}
