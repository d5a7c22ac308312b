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


def test_zone_maps_prune_files_and_stay_fail_safe(spark, tmp_path):
    """File-level zone maps (Iceberg/Delta-style data skipping on
    non-partition columns): range reads open only intersecting files,
    pruned reads lose no rows vs the exact predicate, refresh is
    incremental (only new files' footers are opened), and stale or
    missing stats always fail SAFE (file kept)."""
    from pyspark.sql import functions as F

    from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse

    wh = Warehouse(spark, str(tmp_path))
    rel = wh.relation("s", "t")
    # 8 range-partitioned files: each covers a tight contiguous k-range
    df = (
        spark.range(8000)
        .select(F.col("id").alias("k"), (F.col("id") % 97).alias("v"))
        .repartitionByRange(8, "k")
    )
    wh.create_as(rel, df, TableMeta())
    r1 = wh.refresh_zone_maps(rel, ["k"])
    assert r1["added"] == r1["files_total"] and r1["dropped"] == 0

    kept, total = wh.prune_files(rel, "k", 2000, 2999)
    assert total >= 8 and len(kept) < total  # actually skipped files
    got = wh.read_pruned(rel, "k", 2000, 2999).where(F.col("k").between(2000, 2999))
    assert sorted(r["k"] for r in got.collect()) == list(range(2000, 3000))
    # superset contract: pruned-only read includes at least the range
    assert wh.read_pruned(rel, "k", 2000, 2999).count() >= 1000

    # unbounded sides
    klo, _ = wh.prune_files(rel, "k", lo=7500)
    assert 0 < len(klo) < total

    # incremental refresh: an append adds files; only those are harvested
    wh.append(rel, spark.createDataFrame([(100_000, 1)], "k long, v long").coalesce(1))
    r2 = wh.refresh_zone_maps(rel, ["k"])
    assert r2["added"] == 1 and r2["dropped"] == 0
    kept_new, total_new = wh.prune_files(rel, "k", 100_000, None)
    assert total_new == total + 1 and len(kept_new) == 1

    # stale stats fail safe: new file not yet refreshed is always kept
    wh.append(rel, spark.createDataFrame([(200_000, 1)], "k long, v long").coalesce(1))
    kept_stale, _ = wh.prune_files(rel, "k", 100_000, None)
    assert any("part-" in f for f in kept_stale) and len(kept_stale) == 2

    # column without harvested stats -> no pruning at all
    kept_v, total_v = wh.prune_files(rel, "v", 0, 1)
    assert len(kept_v) == total_v

    # empty intersection (after refresh, no stale fail-safe files remain)
    wh.refresh_zone_maps(rel, ["k"])
    none = wh.read_pruned(rel, "k", 10_000_000, 20_000_000)
    assert none.count() == 0 and set(none.columns) == {"k", "v"}


def test_bloom_sidecar_prunes_equality_and_stays_fail_safe(spark, tmp_path):
    """File-level bloom skipping (the point-lookup complement of zone
    maps): equality probes open only files whose filter admits the
    value, pruned reads lose no rows vs the exact predicate, refresh is
    incremental (only new files scanned), deleted files compact out of
    the sidecar, and stale/unindexed state always fails SAFE (kept)."""
    from pyspark.sql import functions as F

    from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse

    wh = Warehouse(spark, str(tmp_path))
    rel = wh.relation("s", "t")
    # 8 hash-partitioned files over a high-cardinality key: zone maps
    # would prune NOTHING here (every file spans ~the full id range)
    df = (
        spark.range(4000)
        .select(
            F.concat(F.lit("user-"), F.col("id")).alias("uid"),
            (F.col("id") % 97).alias("v"),
        )
        .repartition(8, "uid")
    )
    wh.create_as(rel, df, TableMeta())
    r1 = wh.refresh_bloom_sidecar(rel, ["uid"], m_bits=1 << 16)
    assert r1["added"] == r1["files_total"] >= 8 and r1["dropped"] == 0

    # a present value: its file is kept and the pruned read finds it
    kept, total = wh.bloom_prune_files(rel, "uid", "user-1234")
    assert 1 <= len(kept) < total
    got = wh.read_bloom_pruned(rel, "uid", "user-1234").where(F.col("uid") == "user-1234")
    assert got.count() == 1 and got.first()["v"] == 1234 % 97

    # an absent value prunes (almost) everything; exact read stays empty
    kept_abs, _ = wh.bloom_prune_files(rel, "uid", "user-999999")
    assert len(kept_abs) < total
    assert (
        wh.read_bloom_pruned(rel, "uid", "user-999999")
        .where(F.col("uid") == "user-999999")
        .count()
        == 0
    )

    # unindexed column / NULL probe -> no pruning at all
    assert wh.bloom_prune_files(rel, "v", 3) == (wh._live_data_files(rel), total)
    assert len(wh.bloom_prune_files(rel, "uid", None)[0]) == total

    # incremental refresh: append -> only the new file is scanned
    wh.append(
        rel,
        spark.createDataFrame([("user-fresh", 7)], "uid string, v long").coalesce(1),
    )
    # stale stats fail safe BEFORE refresh: the new file is always kept
    kept_stale, total_stale = wh.bloom_prune_files(rel, "uid", "user-fresh")
    assert total_stale == total + 1 and any(f not in kept for f in kept_stale)
    r2 = wh.refresh_bloom_sidecar(rel, ["uid"], m_bits=1 << 16)
    assert r2["added"] == 1 and r2["dropped"] == 0
    kept_new, _ = wh.bloom_prune_files(rel, "uid", "user-fresh")
    assert 1 <= len(kept_new) <= 2  # its file (+ rare fp)
    assert (
        wh.read_bloom_pruned(rel, "uid", "user-fresh").where(F.col("uid") == "user-fresh").count()
        == 1
    )

    # superset contract across every live uid at small m (fp allowed,
    # false NEGATIVES never): each uid's true file is always kept
    sample = [r["uid"] for r in wh.read(rel).limit(50).collect()]
    for uid in sample[:5]:
        assert (
            wh.read_bloom_pruned(rel, "uid", uid).where(F.col("uid") == uid).count() >= 1
        )

    # compaction after deletes: dropped files leave the sidecar
    import os

    victim = wh._live_data_files(rel)[0]
    os.remove(os.path.join(wh.path(rel), victim))
    r3 = wh.refresh_bloom_sidecar(rel, ["uid"], m_bits=1 << 16)
    assert r3["dropped"] == 1
    sidecar = spark.read.parquet(wh._bloom_dir(rel))
    assert sidecar.where(F.col("file") == victim).count() == 0


def test_optimize_layout_zorders_files_for_multi_dim_pruning(spark, tmp_path):
    """OPTIMIZE ZORDER analogue: a hash-scattered two-column table
    prunes nothing before optimize_layout and prunes on BOTH dimensions
    after; rows survive bit-identically; preserved sidecar configs are
    refreshed so skipping works immediately."""
    from pyspark.sql import functions as F

    from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse

    wh = Warehouse(spark, str(tmp_path))
    rel = wh.relation("s", "t")
    df = (
        spark.range(40_000)
        .select(
            (F.col("id") % 200).alias("x"),
            (F.pmod(F.xxhash64("id"), F.lit(200))).alias("y"),
            F.col("id").alias("payload"),
        )
        .repartition(16)  # hash scatter: every file spans both domains
    )
    wh.create_as(rel, df, TableMeta())
    wh.refresh_zone_maps(rel, ["x", "y"])
    kx0, total0 = wh.prune_files(rel, "x", 0, 9)
    ky0, _ = wh.prune_files(rel, "y", 0, 9)
    assert len(kx0) == total0 and len(ky0) == total0  # nothing prunable

    before = sorted(tuple(r) for r in wh.read(rel).collect())
    report = wh.optimize_layout(
        rel, cluster_by=["x", "y"], target_file_bytes=16 << 10, buckets=16
    )
    assert report  # something rewritten
    after = sorted(tuple(r) for r in wh.read(rel).collect())
    assert before == after  # content untouched

    kx1, total1 = wh.prune_files(rel, "x", 0, 9)
    ky1, _ = wh.prune_files(rel, "y", 0, 9)
    assert total1 >= 4  # enough files for pruning to be meaningful
    assert len(kx1) < total1 and len(ky1) < total1  # BOTH dims prune now
    got = wh.read_pruned(rel, "x", 0, 9).where(F.col("x").between(0, 9))
    assert got.count() == sum(1 for r in before if 0 <= r[0] <= 9)


def test_optimize_layout_partitioned_and_read_where_composition(spark, tmp_path):
    """Partitioned optimize: per-partition dynamic overwrite (root
    sidecars survive); read_where intersects bloom + zone-map pruning
    and equals the full-scan filter."""
    from pyspark.sql import functions as F

    from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse

    wh = Warehouse(spark, str(tmp_path))
    rel = wh.relation("s", "p")
    df = spark.range(20_000).select(
        F.when(F.col("id") % 2 == 0, "2024-01-01").otherwise("2024-01-02").alias("day"),
        (F.col("id") % 500).alias("k"),
        F.concat(F.lit("u-"), F.col("id")).alias("uid"),
    )
    wh.create_as(
        rel, df.repartition(8), TableMeta(partition_by="day", cluster_by=["k"])
    )
    wh.refresh_zone_maps(rel, ["k"])
    wh.refresh_bloom_sidecar(rel, ["uid"], m_bits=1 << 16)

    report = wh.optimize_layout(rel, target_file_bytes=16 << 10, buckets=16)
    assert set(report) == {"2024-01-01", "2024-01-02"}

    # zone maps refreshed by optimize: range prune works per partition
    kept, total = wh.prune_files(rel, "k", 0, 30)
    assert 0 < len(kept) < total

    # read_where == full-scan filter, on both pruners at once
    got = wh.read_where(rel, eq={"uid": "u-777"}, between={"k": (0, 499)})
    exact = wh.read(rel).where((F.col("uid") == "u-777") & F.col("k").between(0, 499))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exact.collect()))
    assert got.count() == 1

    # absent key: pruned to (almost) nothing, still exact-empty
    assert wh.read_where(rel, eq={"uid": "nope"}).count() == 0


def test_whole_table_compact_preserves_skipping_configs(spark, tmp_path):
    """The unpartitioned compact now goes through the sidecar-preserving
    overwrite: zone-map and bloom CONFIGS survive the whole-dir rewrite
    and a refresh re-indexes the new files."""
    from pyspark.sql import functions as F

    from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse

    wh = Warehouse(spark, str(tmp_path))
    rel = wh.relation("s", "c")
    df = spark.range(8_000).select(
        F.col("id").alias("k"), F.concat(F.lit("u-"), F.col("id")).alias("uid")
    )
    wh.create_as(rel, df.repartitionByRange(8, "k"), TableMeta())
    wh.refresh_zone_maps(rel, ["k"])
    wh.refresh_bloom_sidecar(rel, ["uid"], m_bits=1 << 16)

    rep = wh.compact(rel, target_file_bytes=1 << 30, min_files=1)
    assert rep  # rewrote to fewer files
    import json as _json

    zm_cols = wh.zone_map_columns(rel)
    bm = _json.load(open(wh._bloom_meta_path(rel)))
    assert zm_cols == ["k"] and bm["column_order"] == ["uid"]
    # stale after rewrite -> fail safe (all kept), refresh re-indexes
    wh.refresh_zone_maps(rel, zm_cols)
    wh.refresh_bloom_sidecar(rel, bm["column_order"], m_bits=bm["m"], k=bm["k"])
    kept, total = wh.bloom_prune_files(rel, "uid", "u-1")
    assert len(kept) >= 1
    assert wh.read_bloom_pruned(rel, "uid", "u-1").where(F.col("uid") == "u-1").count() == 1


def test_bloom_probe_after_compact_is_fail_safe_without_refresh(spark, tmp_path):
    """r8 advice (medium): the unpartitioned compact restores the bloom
    META sidecar but drops the _edna_bloom data dir — probing BEFORE the
    next refresh must fail safe (all live files kept, exact read), not
    crash on an empty sidecar glob."""
    from pyspark.sql import functions as F

    from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse

    wh = Warehouse(spark, str(tmp_path))
    rel = wh.relation("s", "cb")
    df = spark.range(4_000).select(
        F.col("id").alias("k"), F.concat(F.lit("u-"), F.col("id")).alias("uid")
    )
    wh.create_as(rel, df.repartitionByRange(8, "k"), TableMeta())
    wh.refresh_bloom_sidecar(rel, ["uid"], m_bits=1 << 16)
    rep = wh.compact(rel, target_file_bytes=1 << 30, min_files=1)
    assert rep
    import os as _os

    assert _os.path.exists(wh._bloom_meta_path(rel))  # meta survived
    # NO refresh: stale index with a missing/empty bloom data dir
    kept, total = wh.bloom_prune_files(rel, "uid", "u-1")
    assert kept == wh._live_data_files(rel) and total == len(kept)
    assert wh.read_bloom_pruned(rel, "uid", "u-1").where(F.col("uid") == "u-1").count() == 1


def test_table_with_only_sidecar_parquet_reads_as_empty(spark, tmp_path):
    """r8 advice (low): parquet files inside _-prefixed sidecar dirs must
    not count as data files — an emptied table whose bloom sidecar still
    holds parquet must take read()'s empty-schema path."""
    from pyspark.sql import functions as F

    from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse

    wh = Warehouse(spark, str(tmp_path))
    rel = wh.relation("s", "e")
    df = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("u-"), F.col("id")).alias("uid")
    )
    wh.create_as(rel, df, TableMeta())
    wh.refresh_bloom_sidecar(rel, ["uid"], m_bits=1 << 14)
    # drop every DATA file, keep the sidecars (bloom dir holds parquet)
    import os as _os

    for f in wh._live_data_files(rel):
        _os.remove(_os.path.join(wh.path(rel), f))
    assert not wh._has_data_files(rel)
    assert wh.exists(rel)  # meta sidecar still marks the table
    out = wh.read(rel)
    assert out.count() == 0 and set(out.columns) == {"k", "uid"}


def test_zonemap_v2_shards_incremental_append_and_v1_migration(spark, tmp_path):
    """r8: the sharded zone-map sidecar. An append-only refresh writes one
    NEW delta shard without touching existing shards (O(delta) metadata);
    a legacy v1 monolithic JSON is readable as-is and consolidated into
    the sharded layout on the next refresh."""
    import json as _json
    import os as _os

    from pyspark.sql import functions as F

    from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse

    wh = Warehouse(spark, str(tmp_path))
    rel = wh.relation("s", "zs")
    df = spark.range(10_000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    wh.create_as(rel, df.repartitionByRange(8, "k"), TableMeta())
    wh.refresh_zone_maps(rel, ["k"])
    d = wh._zonemap_dir(rel)
    shards0 = sorted(f for f in _os.listdir(d) if f.endswith(".parquet"))
    assert len(shards0) == 1
    mtime0 = _os.stat(_os.path.join(d, shards0[0])).st_mtime_ns
    kept, total = wh.prune_files(rel, "k", 2000, 2999)
    assert len(kept) < total

    # append-only: new files -> ONE new shard, first shard untouched
    more = spark.range(10_000, 20_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    wh.append(rel, more.repartitionByRange(4, "k"))
    rep = wh.refresh_zone_maps(rel, ["k"])
    assert rep["added"] >= 1 and rep["dropped"] == 0
    shards1 = sorted(f for f in _os.listdir(d) if f.endswith(".parquet"))
    assert len(shards1) == 2 and shards0[0] in shards1
    assert _os.stat(_os.path.join(d, shards0[0])).st_mtime_ns == mtime0
    kept_hi, total1 = wh.prune_files(rel, "k", 15_000, 15_999)
    assert 0 < len(kept_hi) < total1
    got = wh.read_pruned(rel, "k", 15_000, 15_999).where(F.col("k").between(15_000, 15_999))
    assert got.count() == 1000

    # legacy v1 migration: hand-write the old monolithic JSON on a fresh
    # table; prune reads it, refresh consolidates + removes it
    rel2 = wh.relation("s", "zv1")
    wh.create_as(rel2, df.repartitionByRange(4, "k"), TableMeta())
    files = wh._live_data_files(rel2)
    import pyarrow.parquet as pq

    v1 = {"columns": ["k"], "files": {}}
    for relp in files:
        md = pq.ParquetFile(_os.path.join(wh.path(rel2), relp)).metadata
        i = {md.schema.column(j).name: j for j in range(md.num_columns)}["k"]
        los = [md.row_group(r).column(i).statistics.min for r in range(md.num_row_groups)]
        his = [md.row_group(r).column(i).statistics.max for r in range(md.num_row_groups)]
        v1["files"][relp] = {"k": [min(los), max(his)]}
    with open(wh._zonemap_path(rel2), "w") as f:
        _json.dump(v1, f)
    kept_v1, total_v1 = wh.prune_files(rel2, "k", 0, 999)
    assert 0 < len(kept_v1) < total_v1
    rep2 = wh.refresh_zone_maps(rel2, ["k"])
    assert rep2["added"] == 0  # stats carried over, no footer re-read
    assert not _os.path.exists(wh._zonemap_path(rel2))  # v1 gone
    kept_v2, _ = wh.prune_files(rel2, "k", 0, 999)
    assert sorted(kept_v2) == sorted(kept_v1)


def test_zonemap_distributed_harvest_matches_driver_loop(spark, tmp_path):
    """>= 256 new files routes the footer harvest through Spark executors;
    the resulting index must prune identically to the driver-loop path."""
    from pyspark.sql import functions as F

    from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse

    wh = Warehouse(spark, str(tmp_path))
    rel = wh.relation("s", "zbig")
    df = spark.range(26_000).select(F.col("id").alias("k"))
    wh.create_as(rel, df.repartitionByRange(260, "k"), TableMeta())
    rep = wh.refresh_zone_maps(rel, ["k"])
    assert rep["added"] >= 256  # the distributed path actually ran
    kept, total = wh.prune_files(rel, "k", 100, 199)
    assert total >= 256 and len(kept) <= 3
    got = wh.read_pruned(rel, "k", 100, 199).where(F.col("k").between(100, 199))
    assert got.count() == 100
