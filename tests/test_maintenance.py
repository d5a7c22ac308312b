"""Auto-maintenance policy (operators/maintenance.py): planning is
metadata-only, thresholds trip on the right debt, execution clears the
debt (re-plan empty), reads are untouched, and the fragmentation rule
stays in lockstep with Warehouse.compact."""

import os

from pyspark.sql import functions as F

from edna_dbt_library_spark.operators.maintenance import (
    MaintenancePolicy,
    maintenance_plan,
    run_maintenance,
)
from edna_dbt_library_spark.sources import TableMeta, Warehouse, load_table


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _fragmented_table(spark, wh, n_appends=4):
    rel = wh.relation("m", "orders_like")
    base = spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") % 5).cast("long").alias("grp")
    )
    wh.create_as(rel, base.where("id < 100").repartition(4), TableMeta())
    for i in range(1, n_appends):
        wh.append(rel, base.where(f"id >= {i * 100} and id < {(i + 1) * 100}").repartition(4))
    return rel, base


def test_plan_trips_on_deletes_and_fragmentation_and_clears(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    rel, base = _fragmented_table(spark, wh)
    wh.delete_where(rel, "k % 7 = 0")
    expect = _rows(wh.read(rel))

    policy = MaintenancePolicy(
        delete_min_bytes=1, delete_ratio=0.0, target_file_bytes=1 << 30, min_files=2
    )
    plan = maintenance_plan(wh, tables=[rel], policy=policy)
    actions = {p["action"] for p in plan}
    assert actions == {"apply_deletes", "compact"}
    # planning touched nothing: sidecar still present, files unchanged
    assert len(wh._delete_files(rel)) > 0

    report = run_maintenance(wh, tables=[rel], policy=policy)
    assert all(p.get("executed") for p in report)
    assert _rows(wh.read(rel)) == expect
    # debt cleared: sidecar folded, partitions at target
    assert wh._delete_files(rel) == []
    assert maintenance_plan(wh, tables=[rel], policy=policy) == []


def test_fragmentation_rule_matches_compact_exactly(spark, tmp_path):
    """The partitions the plan names must be exactly the ones
    Warehouse.compact rewrites under the same thresholds."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    rel, _ = _fragmented_table(spark, wh)
    policy = MaintenancePolicy(target_file_bytes=1 << 30, min_files=2)
    plan = maintenance_plan(wh, tables=[rel], policy=policy)
    planned = next(p for p in plan if p["action"] == "compact")["partitions"]
    report = wh.compact(rel, target_file_bytes=1 << 30, min_files=2)
    assert set(planned) == {str(p) for p in report}


def test_ivfpq_delta_fold_policy(spark, tmp_path):
    from edna_dbt_library_spark.operators.similarity import (
        _ivfpq_delta_rel,
        build_ivfpq_index,
        ivf_pq_topk_indexed,
    )
    from edna_dbt_library_spark.streaming.incremental_stream import stream_ivfpq_index

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    wh = Warehouse(spark, str(tmp_path / "wh"))
    index = wh.relation("ann", "mivfpq")
    build_ivfpq_index(wh, index, emb.where(F.col("vec_id") % 4 != 3))
    src = wh.relation("vec", "in")
    wh.create_as(src, emb.where(F.col("vec_id") % 4 == 3), TableMeta())
    stream_ivfpq_index(wh, src, index, str(tmp_path / "cp")).awaitTermination()
    assert wh._has_data_files(_ivfpq_delta_rel(wh, index))

    qs = emb.where(F.col("vec_id") < 3)
    before = _rows(ivf_pq_topk_indexed(wh, index, qs, k=5))

    # below threshold: a big ratio floor leaves the delta alone
    lazy = MaintenancePolicy(delta_min_bytes=1 << 40)
    assert maintenance_plan(wh, ivfpq_indexes=[index], policy=lazy) == []

    eager = MaintenancePolicy(delta_min_bytes=1, delta_ratio=0.0)
    plan = run_maintenance(wh, ivfpq_indexes=[index], policy=eager)
    assert [p["action"] for p in plan] == ["compact_ivfpq_index"]
    assert not wh.exists(_ivfpq_delta_rel(wh, index))
    assert _rows(ivf_pq_topk_indexed(wh, index, qs, k=5)) == before
    assert maintenance_plan(wh, ivfpq_indexes=[index], policy=eager) == []


def test_bm25_delta_fold_policy(spark, tmp_path):
    from edna_dbt_library_spark.operators.retrieval import (
        _bm25_delta_rel,
        bm25_topk_indexed,
        build_bm25_index,
        refresh_bm25_stats,
    )
    from edna_dbt_library_spark.streaming.incremental_stream import stream_bm25_index

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").where(
        F.col("doc_id") < 40
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    index = wh.relation("txt", "mbm25")
    build_bm25_index(wh, index, docs.where("doc_id % 2 = 0"), n_files=2)
    src = wh.relation("txt", "in")
    wh.create_as(src, docs.where("doc_id % 2 = 1"), TableMeta())
    stream_bm25_index(wh, src, index, str(tmp_path / "cp")).awaitTermination()
    refresh_bm25_stats(wh, index)  # the documented post-window finalizer
    assert wh._has_data_files(_bm25_delta_rel(wh, index))

    probes = spark.createDataFrame([("q0", "data model table")], "query_id string, text string")
    before = _rows(bm25_topk_indexed(wh, index, probes, k=5))

    eager = MaintenancePolicy(delta_min_bytes=1, delta_ratio=0.0)
    plan = run_maintenance(wh, bm25_indexes=[index], policy=eager)
    assert [p["action"] for p in plan] == ["compact_bm25_index"]
    assert not wh.exists(_bm25_delta_rel(wh, index))
    assert _rows(bm25_topk_indexed(wh, index, probes, k=5)) == before
    assert maintenance_plan(wh, bm25_indexes=[index], policy=eager) == []


def test_agg_store_segment_policy(spark, sf_dir, tmp_path):
    from edna_dbt_library_spark.streaming.timeseries_stream import (
        read_continuous_aggregate,
        stream_continuous_aggregate,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    src, store, ckpt = (str(tmp_path / d) for d in ("src", "store", "ckpt"))
    for k in range(3):
        ev.where(F.col("event_id") % 3 == k).write.parquet(src, mode="append")
        stream_continuous_aggregate(
            spark.readStream.schema(ev.schema).parquet(src),
            ["user_id"], "ts", "cents", store, ckpt,
        ).awaitTermination(120)
    before = _rows(read_continuous_aggregate(spark, store, ["user_id"]))

    policy = MaintenancePolicy(max_agg_segments=2)
    plan = run_maintenance(wh, agg_stores=[(store, ["user_id"])], policy=policy)
    assert [p["action"] for p in plan] == ["compact_continuous_aggregate"]
    assert _rows(read_continuous_aggregate(spark, store, ["user_id"])) == before
    assert maintenance_plan(wh, agg_stores=[(store, ["user_id"])], policy=policy) == []

    # a threshold below the structural floor (merged + open tail = 2
    # live segments forever) must CONVERGE, not re-plan an empty fold
    floor = MaintenancePolicy(max_agg_segments=1)
    assert maintenance_plan(wh, agg_stores=[(store, ["user_id"])], policy=floor) == []


def test_clustering_depth_policy_reclusters(spark, tmp_path):
    """A clustered table decayed by full-domain appends (every file
    spans the whole key range) must trip the depth threshold; the
    policy's optimize_layout restores disjoint ranges and the re-plan
    is empty. The same-table compact action is suppressed while a
    recluster is planned (it would hash-rewrite the clustering away)."""
    from edna_dbt_library_spark.operators.maintenance import clustering_depth

    wh = Warehouse(spark, str(tmp_path / "wh"))
    rel = wh.relation("m", "clustered")
    base = spark.range(0, 60000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 1000).alias("v")
    )
    wh.create_as(rel, base.where("id % 16 = 0").coalesce(1), TableMeta(cluster_by=["k"]))
    for i in range(1, 16):  # each append spans the FULL k domain
        wh.append(rel, base.where(f"id % 16 = {i}").coalesce(1))
    wh.refresh_zone_maps(rel, ["k"])
    d0 = clustering_depth(wh, rel, "k")
    assert d0 is not None and d0 > 10  # every file overlaps ~all others

    expect = _rows(wh.read(rel))
    policy = MaintenancePolicy(
        max_cluster_depth=4.0,
        min_files_for_recluster=8,
        target_file_bytes=16 << 10,
        min_files=1,  # frag rule WOULD fire — must be suppressed
    )
    plan = maintenance_plan(wh, tables=[rel], policy=policy)
    assert [p["action"] for p in plan] == ["optimize_layout"]
    assert plan[0]["depth"] > 10

    run_maintenance(wh, tables=[rel], policy=policy)
    assert _rows(wh.read(rel)) == expect
    d1 = clustering_depth(wh, rel, "k")
    assert d1 is not None and d1 < d0 / 2  # ranges now (near-)disjoint

    assert maintenance_plan(wh, tables=[rel], policy=policy) == []


def test_clustering_depth_fail_safe_none(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "wh"))
    rel = wh.relation("m", "plain")
    wh.create_as(
        rel,
        spark.range(0, 50).select(F.col("id").alias("k")),
        TableMeta(cluster_by=["k"]),
    )
    # no zone maps -> None, and the plan never guesses
    assert clustering_depth_import()(wh, rel, "k") is None
    assert maintenance_plan(
        wh, tables=[rel],
        policy=MaintenancePolicy(min_files_for_recluster=1, min_files=999),
    ) == []


def clustering_depth_import():
    from edna_dbt_library_spark.operators.maintenance import clustering_depth

    return clustering_depth


def test_bm25_stats_staleness_policy(spark, tmp_path):
    """A streamed window below the fold threshold must still surface
    its stats debt (the r10 verdict's What's-wrong #1): the upsert
    drops the _edna_stats_stale marker, maintenance_plan emits
    refresh_bm25_stats from one os.stat, and post-run indexed serving
    is bit-identical to the per-call build — without anyone calling
    the finalizer by hand."""
    from edna_dbt_library_spark.operators.retrieval import (
        _bm25_delta_rel,
        bm25_stats_stale,
        bm25_topk,
        bm25_topk_indexed,
        build_bm25_index,
    )
    from edna_dbt_library_spark.streaming.incremental_stream import (
        stream_bm25_index,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").where(
        F.col("doc_id") < 40
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    index = wh.relation("txt", "sbm25")
    build_bm25_index(wh, index, docs.where("doc_id % 2 = 0"), n_files=2)
    assert not bm25_stats_stale(wh, index)
    src = wh.relation("txt", "in")
    wh.create_as(src, docs.where("doc_id % 2 = 1"), TableMeta())
    stream_bm25_index(wh, src, index, str(tmp_path / "cp")).awaitTermination()
    # NO manual refresh_bm25_stats: the debt must be visible
    assert bm25_stats_stale(wh, index)

    lazy = MaintenancePolicy()  # delta is tiny: fold threshold NOT hit
    plan = maintenance_plan(wh, bm25_indexes=[index], policy=lazy)
    assert [p["action"] for p in plan] == ["refresh_bm25_stats"]
    # planning is pure: marker still there, delta untouched
    assert bm25_stats_stale(wh, index)

    run_maintenance(wh, bm25_indexes=[index], policy=lazy)
    assert not bm25_stats_stale(wh, index)
    assert wh._has_data_files(_bm25_delta_rel(wh, index))  # no fold
    assert maintenance_plan(wh, bm25_indexes=[index], policy=lazy) == []
    # serving heals: indexed == per-call on the live corpus
    probes = spark.createDataFrame(
        [("q0", "data model table")], "query_id string, text string"
    )
    assert _rows(bm25_topk_indexed(wh, index, probes, k=5)) == _rows(
        bm25_topk(docs, probes, k=5)
    )


def test_bm25_stats_staleness_rides_the_fold(spark, tmp_path):
    """When the delta ALSO crossed the fold threshold, one compact
    action carries the stats refresh — never two actions for one
    index."""
    from edna_dbt_library_spark.operators.retrieval import (
        bm25_stats_stale,
        build_bm25_index,
    )
    from edna_dbt_library_spark.streaming.incremental_stream import (
        stream_bm25_index,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").where(
        F.col("doc_id") < 40
    )
    wh = Warehouse(spark, str(tmp_path / "wh"))
    index = wh.relation("txt", "cbm25")
    build_bm25_index(wh, index, docs.where("doc_id % 2 = 0"), n_files=2)
    src = wh.relation("txt", "in")
    wh.create_as(src, docs.where("doc_id % 2 = 1"), TableMeta())
    stream_bm25_index(wh, src, index, str(tmp_path / "cp")).awaitTermination()
    assert bm25_stats_stale(wh, index)

    eager = MaintenancePolicy(delta_min_bytes=1, delta_ratio=0.0)
    plan = maintenance_plan(wh, bm25_indexes=[index], policy=eager)
    assert [p["action"] for p in plan] == ["compact_bm25_index"]
    run_maintenance(wh, bm25_indexes=[index], policy=eager)
    assert not bm25_stats_stale(wh, index)
    assert maintenance_plan(wh, bm25_indexes=[index], policy=eager) == []


def test_vacuum_policy_sweeps_crashed_txn_only_when_idle(spark, tmp_path):
    """Crashed-DML debt: a pending marker idle past crashed_txn_age_s
    trips a vacuum action (pure os.stat planning); a YOUNG marker —
    possibly an in-flight statement — never does, and the executed
    sweep re-applies the age gate. Reads are identical throughout."""
    import pytest

    from edna_dbt_library_spark.sources.warehouse import InjectedCrash

    wh = Warehouse(spark, str(tmp_path / "wh"))
    rel = wh.relation("m", "t")
    base = spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("amt")
    )
    wh.create_as(rel, base, TableMeta())
    before = _rows(wh.read(rel))
    wh._txn_crash_point = "before_commit"
    with pytest.raises(InjectedCrash):
        wh.delete_where(rel, "k < 5")
    wh._txn_crash_point = None
    (txid,) = wh._pending_txids(rel)
    marker = os.path.join(wh._pending_dir(rel), f"{txid}.json")

    policy = MaintenancePolicy(crashed_txn_age_s=300.0)
    # fresh marker: could be in-flight — not vacuum's business
    assert maintenance_plan(wh, tables=[rel], policy=policy) == []

    import time

    old = time.time() - 400.0
    os.utime(marker, (old, old))
    plan = maintenance_plan(wh, tables=[rel], policy=policy)
    assert [p["action"] for p in plan] == ["vacuum"]
    assert plan[0]["txids"] == [txid]
    assert wh._pending_txids(rel)  # planning is pure

    run_maintenance(wh, tables=[rel], policy=policy)
    assert wh._pending_txids(rel) == []
    assert _rows(wh.read(rel)) == before  # orphans never became visible
    assert maintenance_plan(wh, tables=[rel], policy=policy) == []
    # the swept table retries cleanly
    assert wh.delete_where(rel, "k < 5")["n_deleted"] == 5


def test_vacuum_age_gate_spares_reactivated_marker(spark, tmp_path):
    """Warehouse.vacuum(older_than_s=...) must skip a marker younger
    than the gate even when called directly — the run-time re-check
    that protects a statement that went active between plan and run."""
    import pytest

    from edna_dbt_library_spark.sources.warehouse import InjectedCrash

    wh = Warehouse(spark, str(tmp_path / "wh"))
    rel = wh.relation("m", "t2")
    wh.create_as(
        rel,
        spark.range(0, 20).select(F.col("id").alias("k")),
        TableMeta(),
    )
    wh._txn_crash_point = "before_commit"
    with pytest.raises(InjectedCrash):
        wh.delete_where(rel, "k < 3")
    wh._txn_crash_point = None
    assert len(wh._pending_txids(rel)) == 1
    v = wh.vacuum(rel, older_than_s=300.0)
    assert v["txns_swept"] == 0
    assert len(wh._pending_txids(rel)) == 1
    v = wh.vacuum(rel)  # manual call: caller vouches, sweeps all
    assert v["txns_swept"] == 1
    assert wh._pending_txids(rel) == []


def test_mview_freshness_policy(spark, tmp_path):
    """Stale materialized views are a planned debt class: sources that
    moved past the promoted watermark (appends, sidecar-only deletes,
    updates) trip a refresh_materialized_view action from a pure
    manifest-vs-listing diff; fresh views plan nothing; the executed
    refresh restores direct-derivation equality and the re-plan is
    empty."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    l = wh.relation("s", "mvl")
    r = wh.relation("s", "mvr")
    wh.create_as(
        l,
        spark.createDataFrame(
            [(i, i % 3, 10 * i) for i in range(12)], "l_id long, grp long, lv long"
        ).coalesce(1),
        TableMeta(),
    )
    wh.create_as(
        r,
        spark.createDataFrame(
            [(100 + j, j % 3, j) for j in range(5)], "r_id long, grp long, rv long"
        ).coalesce(1),
        TableMeta(),
    )
    wh.sql(
        "CREATE MATERIALIZED VIEW s__mv UNIQUE KEYS (l_id, r_id) "
        "AS SELECT * FROM s__mvl JOIN s__mvr USING (grp)"
    )
    wh.sql(
        "CREATE MATERIALIZED VIEW s__agv AS SELECT grp, sum(lv) AS t, "
        "count(*) AS n FROM s__mvl GROUP BY grp"
    )
    assert maintenance_plan(wh, mview_schemas=["s"]) == []  # fresh

    # a sidecar-only DELETE must read as movement (data files unchanged)
    wh.sql("DELETE FROM s__mvr WHERE r_id = 101")
    plan = maintenance_plan(wh, mview_schemas=["s"])
    assert [(p["action"], p["target"]) for p in plan] == [
        ("refresh_materialized_view", "s.mv")
    ]
    assert plan[0]["kind"] == "join" and "right" in plan[0]["reason"]

    # an append on the shared left side trips BOTH views
    wh.append(
        l, spark.createDataFrame([(50, 1, 500)], "l_id long, grp long, lv long").coalesce(1)
    )
    plan = maintenance_plan(wh, mview_schemas=["s"])
    assert sorted(p["target"] for p in plan) == ["s.agv", "s.mv"]
    # planning is pure: the join view still serves the stale state
    assert wh.read(wh.relation("s", "mv")).where("l_id = 50").count() == 0

    report = run_maintenance(wh, mview_schemas=["s"])
    assert all(p.get("executed") for p in report)
    direct = (
        wh.read(l).join(wh.read(r), "grp").select("grp", "l_id", "r_id", "lv", "rv")
    )
    got = wh.read(wh.relation("s", "mv")).select("grp", "l_id", "r_id", "lv", "rv")
    assert _rows(got) == _rows(direct)
    agg = wh.read(wh.relation("s", "agv")).select("grp", "t", "n")
    dagg = wh.read(l).groupBy("grp").agg(
        F.sum("lv").alias("t"), F.count(F.lit(1)).cast("long").alias("n")
    )
    assert _rows(agg) == _rows(dagg)
    assert maintenance_plan(wh, mview_schemas=["s"]) == []

    # the distinct kind's freshness rides its level-1 (child) watermark
    wh.sql(
        "CREATE MATERIALIZED VIEW s__dv AS "
        "SELECT grp, count(DISTINCT lv) AS nd FROM s__mvl GROUP BY grp"
    )
    assert maintenance_plan(wh, mview_schemas=["s"]) == []
    wh.sql("UPDATE s__mvl SET lv = 7 WHERE l_id = 2")
    plan = maintenance_plan(wh, mview_schemas=["s"])
    assert sorted(p["target"] for p in plan) == ["s.agv", "s.dv", "s.mv"]
    run_maintenance(wh, mview_schemas=["s"])
    ddv = wh.read(l).groupBy("grp").agg(F.count_distinct("lv").alias("nd"))
    assert _rows(wh.read(wh.relation("s", "dv")).select("grp", "nd")) == _rows(ddv)
    assert maintenance_plan(wh, mview_schemas=["s"]) == []


def test_mview_freshness_sees_crash_between_distinct_levels(spark, tmp_path):
    """The distinct view's LEVEL-2 staleness is a planned debt: after a
    crash between the two levels (level 1 landed and promoted, level 2
    never ran) on a then-quiet source, the source-vs-level-1 diff is
    clean but the CHILD moved past the level-2 watermark — the sweep
    must still plan a refresh and run_maintenance must converge the
    target (r11 verdict wrong #1)."""
    from edna_dbt_library_spark.operators.materializations import (
        run_incremental_agg_view,
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = wh.relation("s", "dsrc")
    wh.create_as(
        src,
        spark.createDataFrame(
            [(i, i % 3, i % 5) for i in range(20)], "id long, grp long, v long"
        ),
        TableMeta(),
    )
    wh.sql(
        "CREATE MATERIALIZED VIEW s__dv2 AS "
        "SELECT grp, count(DISTINCT v) AS nd FROM s__dsrc GROUP BY grp"
    )
    assert maintenance_plan(wh, mview_schemas=["s"]) == []

    # the crash scenario, constructed directly: DML the source, then
    # run ONLY level 1 (the child sync) — exactly what a crash between
    # the levels leaves behind; the source now reads fresh against the
    # promoted level-1 watermark while the child is ahead of level 2
    wh.sql("DELETE FROM s__dsrc WHERE v = 2")
    child = wh.relation("s", "dv2__elems")
    run_incremental_agg_view(
        wh, src, child, ["grp", "v"], {"_n": ("count", "*")},
        where="`v` IS NOT NULL",
    )
    plan = maintenance_plan(wh, mview_schemas=["s"])
    assert [(p["action"], p["target"]) for p in plan] == [
        ("refresh_materialized_view", "s.dv2")
    ]
    assert "child" in plan[0]["reason"]
    run_maintenance(wh, mview_schemas=["s"])
    direct = wh.read(src).groupBy("grp").agg(F.count_distinct("v").alias("nd"))
    assert _rows(wh.read(wh.relation("s", "dv2")).select("grp", "nd")) == _rows(
        direct
    )
    assert maintenance_plan(wh, mview_schemas=["s"]) == []


def test_run_maintenance_refresh_handles_dunder_schema(spark, tmp_path):
    """run_maintenance executes a refresh with the plan's exact
    (schema, name) pair — a schema containing '__' must resolve to the
    right relation (the old SQL-text round trip re-split on the first
    '__' and refreshed a nonexistent view; ADVICE r11)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = wh.relation("a__b", "src")
    tgt = wh.relation("a__b", "agv")
    wh.create_as(
        src,
        spark.createDataFrame(
            [(i, i % 3, i) for i in range(12)], "id long, grp long, v long"
        ).coalesce(1),
        TableMeta(),
    )
    wh.sql(
        "CREATE MATERIALIZED VIEW tgt AS SELECT grp, sum(v) AS t, "
        "count(*) AS n FROM src GROUP BY grp",
        {"tgt": tgt, "src": src},
    )
    wh.append(src, spark.createDataFrame([(50, 1, 500)], "id long, grp long, v long").coalesce(1))
    report = run_maintenance(wh, mview_schemas=["a__b"])
    assert [p["action"] for p in report] == ["refresh_materialized_view"]
    direct = wh.read(src).groupBy("grp").agg(
        F.sum("v").alias("t"), F.count(F.lit(1)).cast("long").alias("n")
    )
    assert _rows(wh.read(tgt).select("grp", "t", "n")) == _rows(direct)
    assert maintenance_plan(wh, mview_schemas=["a__b"]) == []


def test_vacuum_staging_gate_uses_newest_tree_mtime(spark, tmp_path):
    """A staging dir whose ROOT mtime is old but whose nested
    task-attempt files are fresh is a LIVE write — vacuum's age gate
    must look at the newest mtime anywhere under the dir, not the
    root's (set once at write start; ADVICE r11)."""
    import time

    wh = Warehouse(spark, str(tmp_path / "wh"))
    rel = wh.relation("m", "t3")
    wh.create_as(
        rel, spark.range(0, 10).select(F.col("id").alias("k")), TableMeta()
    )
    staging = os.path.join(wh.path(rel), "_temporary", "0", "attempt_1")
    os.makedirs(staging)
    part = os.path.join(staging, "part-0001.parquet")
    with open(part, "wb") as f:
        f.write(b"x")  # freshly written task output
    old = time.time() - 3600
    for p in (
        os.path.join(wh.path(rel), "_temporary"),
        os.path.join(wh.path(rel), "_temporary", "0"),
        staging,
    ):
        os.utime(p, (old, old))  # dir mtimes all stale; the FILE is fresh
    v = wh.vacuum(rel, older_than_s=300.0)
    assert v["staging_removed"] == 0
    assert os.path.exists(part)
    os.utime(part, (old, old))  # write finished long ago: now sweepable
    v = wh.vacuum(rel, older_than_s=300.0)
    assert v["staging_removed"] == 1
    assert not os.path.exists(os.path.join(wh.path(rel), "_temporary"))


def test_mview_freshness_covers_extrema_kind(spark, tmp_path):
    """kind == 'extrema' views are freshness-swept off their
    extview:<tid> watermark: a moved source plans a refresh and
    run_maintenance converges the view to the direct min/max."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = wh.relation("s", "xsrc")
    wh.create_as(
        src,
        spark.createDataFrame(
            [(i, i % 3, i * 7 % 31) for i in range(20)],
            "id long, grp long, v long",
        ),
        TableMeta(),
    )
    wh.sql(
        "CREATE MATERIALIZED VIEW s__xv AS SELECT grp, min(v) AS lo, "
        "max(v) AS hi FROM s__xsrc GROUP BY grp"
    )
    assert maintenance_plan(wh, mview_schemas=["s"]) == []
    wh.sql("DELETE FROM s__xsrc WHERE v > 25")
    plan = maintenance_plan(wh, mview_schemas=["s"])
    assert [(p["action"], p["target"], p["kind"]) for p in plan] == [
        ("refresh_materialized_view", "s.xv", "extrema")
    ]
    run_maintenance(wh, mview_schemas=["s"])
    direct = wh.read(src).groupBy("grp").agg(
        F.min("v").alias("lo"), F.max("v").alias("hi")
    )
    assert _rows(wh.read(wh.relation("s", "xv")).select("grp", "lo", "hi")) == _rows(
        direct
    )
    assert maintenance_plan(wh, mview_schemas=["s"]) == []


def test_mview_freshness_covers_join_agg_kind(spark, tmp_path):
    """kind == 'join_agg' views are freshness-swept on all THREE edges:
    either base table moving past the child join view's watermarks, or
    the child moving past the level-2 aggregate watermark (the
    crash-between-levels class)."""
    from edna_dbt_library_spark.operators.materializations import (
        run_incremental_agg_view,
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    l = wh.relation("s", "jal")
    r = wh.relation("s", "jar")
    wh.create_as(
        l,
        spark.createDataFrame(
            [(i, i % 4, i) for i in range(20)], "fid long, j long, amt long"
        ),
        TableMeta(),
    )
    wh.create_as(
        r,
        spark.createDataFrame([(j, j % 2) for j in range(4)], "j long, grp long"),
        TableMeta(),
    )
    wh.sql(
        "CREATE MATERIALIZED VIEW s__jag UNIQUE KEYS (fid, j) AS "
        "SELECT grp, sum(amt) AS total, count(*) AS n "
        "FROM s__jal JOIN s__jar USING (j) GROUP BY grp"
    )
    assert maintenance_plan(wh, mview_schemas=["s"]) == []

    # a dim-side delete trips the right edge
    wh.sql("DELETE FROM s__jar WHERE j = 3")
    plan = maintenance_plan(wh, mview_schemas=["s"])
    assert [(p["action"], p["target"], p["kind"]) for p in plan] == [
        ("refresh_materialized_view", "s.jag", "join_agg")
    ]
    assert "right" in plan[0]["reason"]
    run_maintenance(wh, mview_schemas=["s"])

    def direct():
        return (
            wh.read(l)
            .join(wh.read(r), "j")
            .groupBy("grp")
            .agg(
                F.sum("amt").alias("total"),
                F.count(F.lit(1)).cast("long").alias("n"),
            )
        )

    assert _rows(
        wh.read(wh.relation("s", "jag")).select("grp", "total", "n")
    ) == _rows(direct())
    assert maintenance_plan(wh, mview_schemas=["s"]) == []

    # crash between levels: the JOIN child lands, level 2 never runs —
    # both bases then read fresh; only the child edge catches it
    wh.sql("DELETE FROM s__jal WHERE fid % 5 = 1")
    from edna_dbt_library_spark.operators.materializations import (
        run_incremental_join_view,
    )

    child = wh.relation("s", "jag__join")
    run_incremental_join_view(wh, l, r, child, "fid", "j", ["j"])
    plan = maintenance_plan(wh, mview_schemas=["s"])
    assert [(p["target"], p["kind"]) for p in plan] == [("s.jag", "join_agg")]
    assert "child" in plan[0]["reason"]
    run_maintenance(wh, mview_schemas=["s"])
    assert _rows(
        wh.read(wh.relation("s", "jag")).select("grp", "total", "n")
    ) == _rows(direct())
    assert maintenance_plan(wh, mview_schemas=["s"]) == []


def test_mview_freshness_covers_agg_distinct_kind(spark, tmp_path):
    """kind == 'agg_distinct' views are freshness-swept on all five
    edges — including the serve edge: children synced but the serve
    rewrite crashed leaves every child watermark promoted, and only
    the children-vs-serve snapshots catch the stale target."""
    from edna_dbt_library_spark.operators.materializations import (
        run_incremental_agg_view,
        run_incremental_distinct_view,
    )

    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = wh.relation("s", "mdsrc")
    wh.create_as(
        src,
        spark.createDataFrame(
            [(i, i % 3, i, i % 4) for i in range(24)],
            "id long, grp long, amt long, u long",
        ).coalesce(1),
        TableMeta(),
    )
    wh.sql(
        "CREATE MATERIALIZED VIEW s__md AS SELECT grp, count(*) AS n, "
        "sum(amt) AS total, count(DISTINCT u) AS nu FROM s__mdsrc GROUP BY grp"
    )
    assert maintenance_plan(wh, mview_schemas=["s"]) == []

    # source moved: both source edges due
    wh.sql("DELETE FROM s__mdsrc WHERE id % 6 = 1")
    plan = maintenance_plan(wh, mview_schemas=["s"])
    assert [(p["action"], p["target"], p["kind"]) for p in plan] == [
        ("refresh_materialized_view", "s.md", "agg_distinct")
    ]
    run_maintenance(wh, mview_schemas=["s"])

    def direct():
        return (
            wh.read(src)
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n"),
                F.sum("amt").alias("total"),
                F.count_distinct("u").alias("nu"),
            )
        )

    assert _rows(
        wh.read(wh.relation("s", "md")).select("grp", "n", "total", "nu")
    ) == _rows(direct())
    assert maintenance_plan(wh, mview_schemas=["s"]) == []

    # crash AFTER both children sync, BEFORE the serve rewrite: every
    # child watermark promoted, only the serve edges see the debt
    wh.sql("UPDATE s__mdsrc SET u = 9 WHERE id % 4 = 2")
    child_a = wh.relation("s", "md__agg")
    child_d = wh.relation("s", "md__dcnt")
    run_incremental_agg_view(
        wh, src, child_a, ["grp"],
        {"n": ("count", "*"), "total": ("sum", "amt")},
    )
    run_incremental_distinct_view(wh, src, child_d, ["grp"], "u", out="nu")
    plan = maintenance_plan(wh, mview_schemas=["s"])
    assert [(p["target"], p["kind"]) for p in plan] == [("s.md", "agg_distinct")]
    assert "serve" in plan[0]["reason"]
    run_maintenance(wh, mview_schemas=["s"])
    assert _rows(
        wh.read(wh.relation("s", "md")).select("grp", "n", "total", "nu")
    ) == _rows(direct())
    assert maintenance_plan(wh, mview_schemas=["s"]) == []


def test_auto_discovery_plans_forgotten_targets(spark, tmp_path):
    """maintenance_plan(wh) with NO target lists sweeps the whole
    warehouse: a debt-bearing table nobody listed is planned anyway;
    discovery classifies index pairs by their companion tables and
    keeps them (and the companions) out of the generic table sweep;
    mview schemas join the freshness sweep automatically."""
    import time

    import pytest

    from edna_dbt_library_spark.operators.maintenance import discover_targets
    from edna_dbt_library_spark.sources.warehouse import InjectedCrash

    wh = Warehouse(spark, str(tmp_path / "wh"))
    # the "forgotten" table with crashed-txn debt
    rel = wh.relation("m", "forgotten")
    wh.create_as(
        rel, spark.range(0, 30).select(F.col("id").alias("k")), TableMeta()
    )
    wh._txn_crash_point = "before_commit"
    with pytest.raises(InjectedCrash):
        wh.delete_where(rel, "k < 3")
    wh._txn_crash_point = None
    (txid,) = wh._pending_txids(rel)
    old = time.time() - 400.0
    os.utime(os.path.join(wh._pending_dir(rel), f"{txid}.json"), (old, old))

    # a persisted BM25 index (main + _stats [+ _delta]) and a stale MV
    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma w{i % 7} w{i % 3}") for i in range(40)],
        "doc_id long, text string",
    )
    from edna_dbt_library_spark.operators.retrieval import build_bm25_index

    idx = wh.relation("m", "bm25idx")
    build_bm25_index(wh, idx, docs)
    src = wh.relation("m", "mvsrc")
    wh.create_as(
        src,
        spark.createDataFrame(
            [(i, i % 3, i) for i in range(12)], "id long, grp long, v long"
        ),
        TableMeta(),
    )
    wh.sql(
        "CREATE MATERIALIZED VIEW m__amv AS SELECT grp, sum(v) AS t, "
        "count(*) AS n FROM m__mvsrc GROUP BY grp"
    )
    wh.append(src, spark.createDataFrame([(50, 1, 5)], "id long, grp long, v long"))

    d = discover_targets(wh)
    names = {(r.schema, r.identifier) for r in d["tables"]}
    assert ("m", "forgotten") in names and ("m", "mvsrc") in names
    assert ("m", "bm25idx") not in names  # index: LSM-fold territory
    assert ("m", "bm25idx_stats") not in names  # companion excluded
    assert [(r.schema, r.identifier) for r in d["bm25_indexes"]] == [
        ("m", "bm25idx")
    ]
    assert d["mview_schemas"] == ["m"]

    plan = maintenance_plan(wh, policy=MaintenancePolicy(crashed_txn_age_s=300.0))
    acts = {(p["action"], p["target"]) for p in plan}
    assert ("vacuum", "m.forgotten") in acts
    assert ("refresh_materialized_view", "m.amv") in acts
    run_maintenance(wh, policy=MaintenancePolicy(crashed_txn_age_s=300.0))
    assert wh._pending_txids(rel) == []
    assert maintenance_plan(wh) == []


def test_auto_maintain_service_tick_clears_debt_and_logs(spark, tmp_path):
    """The scheduled maintainer (auto_maintain → maintenance_tick):
    injected debt across three classes (delete sidecar + fragmentation,
    crashed txn, stale MV) is cleared by ONE tick with auto-discovered
    targets, one maintenance_log row lands per executed action, and a
    re-tick plans (and logs) nothing."""
    import time

    import pytest

    from edna_dbt_library_spark.operators.maintenance import (
        auto_maintain,
        maintenance_tick,
    )
    from edna_dbt_library_spark.sources.warehouse import InjectedCrash

    wh = Warehouse(spark, str(tmp_path / "wh"))
    # class 1: deletes + fragmentation
    rel, base = _fragmented_table(spark, wh)
    wh.delete_where(rel, "k % 7 = 0")
    expect = _rows(wh.read(rel))
    # class 2: crashed txn, idle past the age gate
    rel2 = wh.relation("m", "crashy")
    wh.create_as(
        rel2, spark.range(0, 30).select(F.col("id").alias("k")), TableMeta()
    )
    wh._txn_crash_point = "before_commit"
    with pytest.raises(InjectedCrash):
        wh.delete_where(rel2, "k < 3")
    wh._txn_crash_point = None
    (txid,) = wh._pending_txids(rel2)
    old = time.time() - 400.0
    os.utime(os.path.join(wh._pending_dir(rel2), f"{txid}.json"), (old, old))
    # class 3: stale MV
    src = wh.relation("m", "amsrc")
    wh.create_as(
        src,
        spark.createDataFrame(
            [(i, i % 3, i) for i in range(12)], "id long, grp long, v long"
        ),
        TableMeta(),
    )
    wh.sql(
        "CREATE MATERIALIZED VIEW m__amv2 AS SELECT grp, sum(v) AS t, "
        "count(*) AS n FROM m__amsrc GROUP BY grp"
    )
    wh.append(src, spark.createDataFrame([(50, 1, 5)], "id long, grp long, v long"))

    policy = MaintenancePolicy(
        delete_min_bytes=1, delete_ratio=0.0, target_file_bytes=1 << 30,
        min_files=2, crashed_txn_age_s=300.0,
    )
    n = auto_maintain(wh, interval_s=0.01, max_ticks=1, policy=policy)
    assert n == 1

    # debt cleared across all three classes
    assert wh._delete_files(rel) == []
    assert wh._pending_txids(rel2) == []
    assert _rows(wh.read(rel)) == expect
    mv = wh.relation("m", "amv2")
    assert _rows(wh.read(mv).where("grp = 1").select("t")) == _rows(
        wh.read(src).where("grp = 1").groupBy().agg(F.sum("v").alias("t"))
    )

    # one log row per executed action, in the _maintenance schema
    # (underscore-prefixed: discovery never sweeps the log itself)
    log = wh.relation("_maintenance", "log")
    assert wh.exists(log)
    rows = wh.read(log).collect()
    acts = {(r["action"], r["target"]) for r in rows}
    assert ("vacuum", "m.crashy") in acts
    assert ("refresh_materialized_view", "m.amv2") in acts
    assert any(a in {x[0] for x in acts} for a in ("apply_deletes", "compact"))
    assert all(r["executed"] for r in rows)
    n_logged = len(rows)

    # idle re-tick: plans nothing, logs nothing (stop_when_idle exits)
    n = auto_maintain(
        wh, interval_s=0.01, max_ticks=3, stop_when_idle=True, policy=policy
    )
    assert n == 1
    assert wh.read(log).count() == n_logged
    # direct tick API parity: idle tick returns an empty plan
    assert maintenance_tick(wh, policy=policy) == []


def test_mview_freshness_covers_agg_having_kind(spark, tmp_path):
    """kind == 'agg_having' is freshness-swept on BOTH levels: source
    past the state child's watermark, AND a crash after the child
    synced but before the σ serve promoted (the serve edge)."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    src = wh.relation("s", "hfsrc")
    wh.create_as(
        src,
        spark.createDataFrame(
            [(i, i % 3, 1) for i in range(12)], "id long, grp long, v long"
        ),
        TableMeta(),
    )
    wh.sql(
        "CREATE MATERIALIZED VIEW s__hfv AS SELECT grp, count(*) AS n "
        "FROM s__hfsrc GROUP BY grp HAVING n > 2"
    )
    assert maintenance_plan(wh, tables=[], mview_schemas=["s"]) == []

    # level-1 edge: source DML past the child watermark
    wh.append(src, spark.createDataFrame([(50, 1, 1)], "id long, grp long, v long"))
    plan = maintenance_plan(wh, tables=[], mview_schemas=["s"])
    assert [(p["target"], p["kind"]) for p in plan] == [("s.hfv", "agg_having")]
    run_maintenance(wh, tables=[], mview_schemas=["s"])
    assert maintenance_plan(wh, tables=[], mview_schemas=["s"]) == []

    # serve edge: demote the promoted havview note to pending — the
    # state child reads synced but the target σ did not land
    child = wh.relation("s", "hfv__state")
    note = f"havview:{wh.relation('s', 'hfv').table_id}"
    snaps = [sn for sn in wh.list_snapshots(child) if sn.get("note") == note]
    assert snaps
    wh.set_snapshot_note(child, snaps[-1]["version"], note + "!pending")
    plan = maintenance_plan(wh, tables=[], mview_schemas=["s"])
    assert [(p["target"], p["kind"]) for p in plan] == [("s.hfv", "agg_having")]
    run_maintenance(wh, tables=[], mview_schemas=["s"])
    assert maintenance_plan(wh, tables=[], mview_schemas=["s"]) == []


def test_mview_freshness_covers_multiway_and_left_join_kinds(spark, tmp_path):
    """Freshness edges for the r13 kinds: a 3-table join_agg chain is
    due when the DEEP dim moves (the chain edge), and a left_join view
    is due on either side's DML."""
    wh = Warehouse(spark, str(tmp_path / "wh"))
    f = wh.relation("s", "mwf")
    d1 = wh.relation("s", "mwd1")
    d2 = wh.relation("s", "mwd2")
    wh.create_as(
        f,
        spark.createDataFrame(
            [(i, i % 3, i % 2, i) for i in range(12)],
            "fid long, j1 long, j2 long, amt long",
        ),
        TableMeta(),
    )
    wh.create_as(
        d1, spark.createDataFrame([(j, j) for j in range(3)], "j1 long, a long"),
        TableMeta(),
    )
    wh.create_as(
        d2, spark.createDataFrame([(j, 5 + j) for j in range(2)], "j2 long, b long"),
        TableMeta(),
    )
    wh.sql(
        "CREATE MATERIALIZED VIEW s__mwv UNIQUE KEYS (fid, j1, j2) AS "
        "SELECT a, b, sum(amt) AS t, count(*) AS n "
        "FROM s__mwf JOIN s__mwd1 USING (j1) JOIN s__mwd2 USING (j2) "
        "GROUP BY a, b"
    )
    assert maintenance_plan(wh, tables=[], mview_schemas=["s"]) == []
    # the DEEP dim moves: only the chain's second-level edge sees it
    wh.update_where(d2, "j2 = 1", {"b": "99"})
    plan = maintenance_plan(wh, tables=[], mview_schemas=["s"])
    assert [(p["target"], p["kind"]) for p in plan] == [("s.mwv", "join_agg")]
    run_maintenance(wh, tables=[], mview_schemas=["s"])
    assert maintenance_plan(wh, tables=[], mview_schemas=["s"]) == []

    # left_join kind rides the joinview edges
    lf = wh.relation("s", "ljf")
    ld = wh.relation("s", "ljd")
    wh.create_as(
        lf, spark.createDataFrame([(1, 0), (2, 1)], "fid long, k long"),
        TableMeta(),
    )
    wh.create_as(
        ld, spark.createDataFrame([(10, 0, 7)], "rid long, k long, rv long"),
        TableMeta(),
    )
    wh.sql(
        "CREATE MATERIALIZED VIEW s__ljmv UNIQUE KEYS (fid, rid) AS "
        "SELECT * FROM s__ljf LEFT JOIN s__ljd USING (k)"
    )
    plan = maintenance_plan(wh, tables=[], mview_schemas=["s"])
    assert plan == []
    wh.append(ld, spark.createDataFrame([(11, 1, 8)], "rid long, k long, rv long"))
    plan = maintenance_plan(wh, tables=[], mview_schemas=["s"])
    assert [(p["target"], p["kind"]) for p in plan] == [("s.ljmv", "left_join")]
    run_maintenance(wh, tables=[], mview_schemas=["s"])
    assert maintenance_plan(wh, tables=[], mview_schemas=["s"]) == []
    mv = wh.relation("s", "ljmv")
    assert wh.read(mv).where("fid = 2 AND rv = 8").count() == 1
