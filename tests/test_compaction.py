"""Warehouse small-file compaction (sources/warehouse.compact):
fragmented partitions rewritten to the byte-derived target count,
untouched partitions left alone, content identical, idempotent."""

import pytest
from pyspark.sql import functions as F

from edna_dbt_library_spark.sources import Relation, TableMeta, Warehouse


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def _frag_table(spark, wh, partitioned=True):
    """Create a table and fragment it with 5 tiny appends per partition."""
    rel = wh.relation("s", "t")
    meta = TableMeta(partition_by="p") if partitioned else TableMeta()
    base = spark.range(0).select(
        F.col("id").alias("k"), F.lit("x").alias("v"), F.lit("a").alias("p")
    )
    wh.create_as(rel, base, meta)
    for i in range(5):
        batch = spark.createDataFrame(
            [(i * 10 + j, f"v{i}{j}", p) for j in range(3) for p in ("a", "b")],
            "k long, v string, p string",
        ).coalesce(1)
        wh.append(rel, batch)
    return rel


def test_compact_reduces_files_and_preserves_rows(spark, wh):
    rel = _frag_table(spark, wh)
    before_stats = wh.partition_file_stats(rel)
    assert before_stats["a"][0] >= 5 and before_stats["b"][0] >= 5
    before_rows = sorted(map(tuple, wh.read(rel).collect()))

    report = wh.compact(rel, target_file_bytes=128 << 20)
    assert set(report) == {"a", "b"}
    for part, (nb, na) in report.items():
        assert na == 1 and nb >= 5
    after = wh.partition_file_stats(rel)
    assert after["a"][0] == 1 and after["b"][0] == 1
    assert sorted(map(tuple, wh.read(rel).collect())) == before_rows


def test_compact_is_idempotent_and_scoped(spark, wh):
    rel = _frag_table(spark, wh)
    wh.compact(rel)
    # second pass: nothing left to rewrite
    assert wh.compact(rel) == {}
    # fragment ONLY partition b again; a must not be rewritten
    for i in range(5):
        wh.append(
            rel,
            spark.createDataFrame([(100 + i, "nb", "b")], "k long, v string, p string").coalesce(1),
        )
    report = wh.compact(rel)
    assert set(report) == {"b"}


def test_compact_respects_target_file_bytes(spark, wh):
    rel = _frag_table(spark, wh)
    # absurdly small target: ceil(bytes/target) exceeds the current file
    # count, so nothing qualifies as fragmented -> no rewrite
    assert wh.compact(rel, target_file_bytes=1) == {}


def test_compact_unpartitioned_whole_table(spark, wh):
    rel = wh.relation("s", "u")
    meta = TableMeta(
        cluster_by=["k"], description="d", grants={"roles/viewer": ["g"]}
    )
    wh.create_as(rel, spark.range(0).select(F.col("id").alias("k")), meta)
    for i in range(4):
        wh.append(rel, spark.range(i * 5, i * 5 + 5).select(F.col("id").alias("k")).coalesce(1))
    assert wh.partition_file_stats(rel)[None][0] >= 4
    before = sorted(r["k"] for r in wh.read(rel).collect())
    report = wh.compact(rel)
    assert report[None][1] == 1
    assert sorted(r["k"] for r in wh.read(rel).collect()) == before
    # the whole-directory overwrite must not destroy the meta sidecar:
    # clustering order / grants / description survive compaction
    after = wh.read_meta(rel)
    assert after.cluster_by == ["k"]
    assert after.description == "d"
    assert after.grants == {"roles/viewer": ["g"]}
