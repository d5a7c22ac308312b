"""§2C/§2F tests: naming resolution, schema flattener, contract checks,
catalog upsert, and the end-to-end runner lifecycle."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from edna_dbt_library_spark.plans import (
    ContractError,
    DataproductEntry,
    FieldPath,
    Model,
    ModelNode,
    Runner,
    catalog_relation,
    dataproduct_id,
    flatten_schema,
    generate_alias_name,
    generate_schema_name,
    get_deployed_relation,
    get_missing_columns,
    is_registered_dataproduct,
    upsert_dataproduct_entry,
    validate_preview_where_clause,
    validate_semantic_versioning,
)
from edna_dbt_library_spark.sources import Relation, Warehouse


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


NODE = ModelNode(
    name="orders_daily",
    fqn=["analytics", "sales", "dataproduct", "orders_daily"],
    description="daily orders",
)


def test_generate_schema_name():
    assert generate_schema_name(None, NODE, project_name="proj", default_schema="dflt", context="ci") == "dflt"
    dev = generate_schema_name(None, NODE, project_name="proj", default_schema="dflt", context="dev")
    assert dev.startswith("dbt_cloud_user_")
    assert generate_schema_name(None, NODE, project_name="proj", default_schema="dflt", context="") == "proj_sales"
    curated = ModelNode(name="x", fqn=["analytics", "sales", "staging"])
    assert (
        generate_schema_name(None, curated, project_name="proj", default_schema="dflt", context="")
        == "proj_sales_curated"
    )


def test_generate_alias_name_versions():
    # no version -> bare name
    assert generate_alias_name(None, ModelNode(name="m", fqn=[])) == "m"
    # dataproduct version 1 / 1.0 -> no suffix (trim('.0') quirk)
    n = ModelNode(name="m", fqn=[], config={"dataproduct": {"version": "1.0", "owner": "o"}})
    assert generate_alias_name(None, n) == "m"
    n2 = ModelNode(name="m", fqn=[], config={"dataproduct": {"version": "2.1", "owner": "o"}})
    assert generate_alias_name(None, n2) == "m_v2-1"
    # node version fallback
    n3 = ModelNode(name="m", fqn=[], version="3")
    assert generate_alias_name(None, n3) == "m_v3"
    # custom override wins
    assert generate_alias_name("  custom  ", n2) == "custom"


def test_get_deployed_relation_rewrites_dev_schema():
    rel = Relation(schema="dbt_cloud_user_9", identifier="orders_daily")
    dep = get_deployed_relation(rel, NODE, context="dev")
    assert dep.schema == "analytics_sales"
    cur = ModelNode(name="x", fqn=["analytics", "sales", "curated"])
    dep2 = get_deployed_relation(rel, cur, context="ci")
    assert dep2.schema == "analytics_sales_curated"
    # prod: unchanged
    assert get_deployed_relation(rel, NODE, context="").schema == "dbt_cloud_user_9"


def test_flatten_schema_nested_paths():
    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField(
                "s",
                T.StructType(
                    [
                        T.StructField("x", T.StringType()),
                        T.StructField("y", T.StructType([T.StructField("z", T.DoubleType())])),
                    ]
                ),
            ),
            T.StructField(
                "arr", T.ArrayType(T.StructType([T.StructField("e", T.IntegerType())]))
            ),
        ]
    )
    paths = {fp.field_path for fp in flatten_schema(schema)}
    assert paths == {"a", "s", "s.x", "s.y", "s.y.z", "arr", "arr.e"}


def test_get_missing_columns_struct_exempt():
    old = [FieldPath("a", "BIGINT"), FieldPath("s", "STRUCT<X: STRING>"), FieldPath("s.x", "STRING")]
    new = [FieldPath("a", "BIGINT")]
    missing = {c.field_path for c in get_missing_columns(old, new)}
    assert missing == {"s.x"}  # container 's' exempt, leaf not


@pytest.mark.parametrize("good", ["1.0", "2.1.3", "10.2.3.4", 2.1])
def test_semver_ok(good):
    validate_semantic_versioning(good)


@pytest.mark.parametrize("bad", ["1", "1.2.3.4.5", "a.b", "1.x"])
def test_semver_bad(bad):
    with pytest.raises(ContractError):
        validate_semantic_versioning(bad)


def test_preview_where_clause(spark):
    df = spark.range(5).select(F.col("id").alias("a"))
    validate_preview_where_clause(df, "a > 2")
    with pytest.raises(ContractError):
        validate_preview_where_clause(df, "nonexistent_column > 2")


def test_catalog_upsert_and_lookup(spark, wh):
    entry = DataproductEntry(
        description="d", display_name="Orders", domain="proj", dataproduct_group="sales",
        dataset_id="proj_sales", table_name="orders_daily", dbt_id="model.proj.orders_daily",
        owner="team", columns=[("a", "BIGINT", "col a")], labels=[("env", "prod")],
        row_count=10, size_bytes=1000, version="2.0", name="orders_daily",
    )
    assert not is_registered_dataproduct(wh, "proj_sales", "orders_daily")
    upsert_dataproduct_entry(wh, entry)
    assert is_registered_dataproduct(wh, "proj_sales", "orders_daily")
    row1 = wh.read(catalog_relation(wh)).collect()[0]
    assert row1["id"] == dataproduct_id("proj_sales", "orders_daily")
    assert row1["bigquery"]["datasetId"] == "proj_sales"
    assert row1["columns"][0]["description"] == "col a"
    registered_time = row1["registeredTime"]

    # second upsert: update, registeredTime preserved, still one row
    entry.description = "updated"
    upsert_dataproduct_entry(wh, entry)
    rows = wh.read(catalog_relation(wh)).collect()
    assert len(rows) == 1
    assert rows[0]["description"] == "updated"
    assert rows[0]["registeredTime"] == registered_time

    # different table -> second row
    entry2 = DataproductEntry(
        description="d2", display_name="Other", domain="proj", dataproduct_group="sales",
        dataset_id="proj_sales", table_name="other", dbt_id="model.proj.other",
        owner="team", name="other",
    )
    upsert_dataproduct_entry(wh, entry2)
    assert wh.read(catalog_relation(wh)).count() == 2


def test_runner_end_to_end_dataproduct(spark, wh):
    runner = Runner(wh=wh, project_name="analytics", context="")

    node = ModelNode(
        name="user_values",
        fqn=["analytics", "sales", "dataproduct", "user_values"],
        config={"dataproduct": {"owner": "team-x", "version": "2.0"}},
        description="per-user totals",
        columns={
            "user_id": {"description": "user key"},
            "total": {"description": "sum of values"},
        },
        path="sales/dataproduct/user_values.sql",
    )

    def builder(s):
        from edna_dbt_library_spark.sources.tables import load_table

        ev = load_table(s, "/root/testdata/sf0.001", "events")
        return ev.groupBy("user_id").agg(F.round(F.sum("value"), 2).alias("total"))

    runner.register(Model(node=node, builder=builder))
    result = runner.run("user_values")
    target = result["relation"]
    assert target.schema == "analytics_sales" and target.identifier == "user_values_v2"
    assert wh.read(target).count() > 0
    # registered in the catalog with size info
    assert is_registered_dataproduct(wh, "analytics_sales", "user_values_v2")
    row = wh.read(catalog_relation(wh)).collect()[0]
    assert row["rowCount"] == wh.read(target).count()
    assert row["owner"] == "team-x"

    # re-run: validation passes against deployed schema, update not insert
    runner.run("user_values")
    assert wh.read(catalog_relation(wh)).count() == 1

    # contract: dropping a column from a registered product fails
    def builder_dropped(s):
        from edna_dbt_library_spark.sources.tables import load_table

        ev = load_table(s, "/root/testdata/sf0.001", "events")
        return ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))

    node2 = ModelNode(
        name="user_values", fqn=node.fqn, config=node.config, description="v2",
        columns={"user_id": {"description": "user key"}, "n": {"description": "count"}},
    )
    runner.register(Model(node=node2, builder=builder_dropped))
    with pytest.raises(ContractError, match="can't be changed"):
        runner.run("user_values")


def test_runner_contract_failures(spark, wh):
    runner = Runner(wh=wh, project_name="analytics", context="")
    # missing owner
    node = ModelNode(
        name="no_owner", fqn=["analytics", "sales", "dataproduct", "no_owner"],
        config={"dataproduct": {}}, description="x",
    )
    runner.register(Model(node=node, builder=lambda s: s.range(1)))
    with pytest.raises(ContractError, match="owner"):
        runner.run("no_owner")
    # curated placement rejected for dataproducts
    node2 = ModelNode(
        name="misplaced", fqn=["analytics", "sales", "curated", "misplaced"],
        config={"dataproduct": {"owner": "t"}}, description="x",
        columns={"id": {"description": "d"}},
    )
    runner.register(Model(node=node2, builder=lambda s: s.range(1)))
    with pytest.raises(ContractError, match="dataproduct"):
        runner.run("misplaced")
    # missing description
    node3 = ModelNode(
        name="no_desc", fqn=["analytics", "sales", "dataproduct", "no_desc"],
        config={"dataproduct": {"owner": "t"}},
        columns={"id": {"description": "d"}},
    )
    runner.register(Model(node=node3, builder=lambda s: s.range(1)))
    with pytest.raises(ContractError, match="description"):
        runner.run("no_desc")


# ---------------------------------------------------------------------------
# grants + persist_docs epilogue (reference: incremental_log.sql:27,161-166)


def test_grants_and_persist_docs_roundtrip(spark, wh):
    from edna_dbt_library_spark.operators.materializations import IncrementalLogConfig

    runner = Runner(wh=wh, project_name="analytics", context="")
    node = ModelNode(
        name="granted",
        fqn=["analytics", "sales", "curated", "granted"],
        config={
            "grants": {"roles/viewer": ["user:a@x", "group:g@x"], "roles/editor": "user:e@x"},
            "persist_docs": {"relation": True, "columns": True},
        },
        description="granted model",
        columns={"id": {"description": "the id"}},
    )
    runner.register(Model(node=node, builder=lambda s: s.range(3).select(F.col("id"))))
    result = runner.run("granted", validate=False, register_metadata=False)
    target = result["relation"]
    # string grantee normalized to a list; lists deduped+sorted
    assert result["grants"] == {
        "roles/viewer": ["group:g@x", "user:a@x"],
        "roles/editor": ["user:e@x"],
    }
    meta = wh.read_meta(target)
    assert meta.grants == result["grants"]
    assert meta.description == "granted model"
    assert meta.column_descriptions == {"id": "the id"}

    # table rebuild replaces the relation -> standing grants revoked:
    # recorded state becomes exactly the new config
    node.config["grants"] = {"roles/viewer": ["user:b@x"]}
    result2 = runner.run("granted", validate=False, register_metadata=False)
    assert result2["grants"] == {"roles/viewer": ["user:b@x"]}
    assert wh.read_meta(target).grants == {"roles/viewer": ["user:b@x"]}


def test_grants_merge_on_incremental_append(spark, wh):
    import datetime as dt

    from edna_dbt_library_spark.operators.materializations import IncrementalLogConfig

    runner = Runner(wh=wh, project_name="analytics", context="")
    node = ModelNode(
        name="inc_granted",
        fqn=["analytics", "sales", "curated", "inc_granted"],
        config={"grants": {"roles/viewer": ["user:a@x"]}},
    )

    def builder(s):
        return s.createDataFrame(
            [(1, dt.datetime(2024, 1, 1, 10))], "id bigint, ts timestamp"
        )

    runner.register(
        Model(
            node=node,
            builder=builder,
            materialization="incremental_log",
            mat_config=IncrementalLogConfig(run_window_column="ts", dev_ci=False),
        )
    )
    r1 = runner.run("inc_granted", validate=False, register_metadata=False)
    assert r1["grants"] == {"roles/viewer": ["user:a@x"]}
    # in-place append keeps standing grants and merges new ones (no revoke)
    node.config["grants"] = {"roles/viewer": ["user:b@x"]}
    r2 = runner.run("inc_granted", validate=False, register_metadata=False)
    assert r2["grants"] == {"roles/viewer": ["user:a@x", "user:b@x"]}


def test_grants_validation_rejects_malformed_config(spark, wh):
    from edna_dbt_library_spark.plans.grants import validate_grant_config

    with pytest.raises(ValueError, match="mapping"):
        validate_grant_config(["roles/viewer"])
    with pytest.raises(ValueError, match="privilege"):
        validate_grant_config({"": ["user:a@x"]})
    with pytest.raises(ValueError, match="grantees"):
        validate_grant_config({"roles/viewer": [1, 2]})
    # a model with a bad grants config fails BEFORE writing anything
    runner = Runner(wh=wh, project_name="analytics", context="")
    node = ModelNode(
        name="badgrant",
        fqn=["analytics", "sales", "curated", "badgrant"],
        config={"grants": "roles/viewer"},
    )
    runner.register(Model(node=node, builder=lambda s: s.range(1)))
    with pytest.raises(ValueError, match="mapping"):
        runner.run("badgrant", validate=False, register_metadata=False)
    assert not wh.exists(runner.target_relation(runner.models["badgrant"]))


def test_runner_profile_gate_blocks_drifted_batch(spark, wh):
    """The content gate in the publish lifecycle: run 1 stores the
    baseline profile with the table; run 2 with same-shaped content
    passes and refreshes it; run 3 with a NULL-flooded column fails
    BEFORE anything is written (the deployed table keeps run 2's
    rows)."""
    from edna_dbt_library_spark.plans import ProfileGateConfig
    from edna_dbt_library_spark.sources.tables import load_table

    runner = Runner(wh=wh, project_name="analytics", context="")
    node = ModelNode(
        name="gated_events",
        fqn=["analytics", "sales", "gated_events"],
        path="sales/gated_events.sql",
    )
    state = {"mode": "clean"}

    def builder(s):
        ev = load_table(s, "/root/testdata/sf0.001", "events").select(
            "event_id", "event_type", "value"
        )
        if state["mode"] == "drifted":
            ev = ev.withColumn(
                "event_type",
                F.when(F.col("event_id") % 3 < 2, F.lit(None).cast("string")).otherwise(
                    F.col("event_type")
                ),
            )
        return ev

    runner.register(
        Model(node=node, builder=builder, profile_gate=ProfileGateConfig(exact=True))
    )
    r1 = runner.run("gated_events", validate=False, register_metadata=False)
    assert r1["profile_gate"] == "passed"
    target = r1["relation"]
    assert wh.read_profile(target) is not None
    baseline_rows = sorted(map(tuple, wh.read_profile(target).collect()))

    r2 = runner.run("gated_events", validate=False, register_metadata=False)
    assert r2["profile_gate"] == "passed"

    state["mode"] = "drifted"
    n_before = wh.read(target).count()
    with pytest.raises(ContractError, match="event_type.null_frac"):
        runner.run("gated_events", validate=False, register_metadata=False)
    # nothing was written and the baseline is still the clean profile
    assert wh.read(target).count() == n_before
    assert sorted(map(tuple, wh.read_profile(target).collect())) == baseline_rows


def test_warehouse_profile_survives_unpartitioned_compact(spark, wh):
    from edna_dbt_library_spark.operators.profiling import profile_columns
    from edna_dbt_library_spark.sources import TableMeta

    rel = wh.relation("s", "p")
    wh.create_as(rel, spark.range(0).select(F.col("id").alias("k")), TableMeta())
    for i in range(4):
        wh.append(rel, spark.range(i * 5, i * 5 + 5).select(F.col("id").alias("k")).coalesce(1))
    wh.write_profile(rel, profile_columns(wh.read(rel), exact=True))
    before = sorted(map(tuple, wh.read_profile(rel).collect()))
    report = wh.compact(rel)
    assert report[None][1] == 1
    assert sorted(map(tuple, wh.read_profile(rel).collect())) == before
    # the profile sidecar is invisible to table reads
    assert wh.read(rel).count() == 20


def test_warehouse_expire_partitions(spark, wh):
    from edna_dbt_library_spark.sources import TableMeta

    rel = wh.relation("s", "r")
    df = spark.createDataFrame(
        [(i, f"2024-01-{d:02d}") for d in (1, 2, 3, 10) for i in range(3)],
        "k long, p string",
    )
    wh.create_as(rel, df, TableMeta(partition_by="p"))
    dropped = wh.expire_partitions(rel, keep_from="2024-01-03")
    assert dropped == ["2024-01-01", "2024-01-02"]
    left = wh.read(rel)  # partition values read back type-inferred (DATE)
    assert sorted(str(r["p"]) for r in left.select("p").distinct().collect()) == [
        "2024-01-03",
        "2024-01-10",
    ]
    # idempotent; unpartitioned tables refuse
    assert wh.expire_partitions(rel, keep_from="2024-01-03") == []
    rel2 = wh.relation("s", "u2")
    wh.create_as(rel2, spark.range(3).select(F.col("id").alias("k")), TableMeta())
    with pytest.raises(ValueError, match="unpartitioned"):
        wh.expire_partitions(rel2, keep_from="2024-01-01")


def test_runner_scd2_snapshot_materialization(spark, wh):
    """The Runner dispatches dbt-snapshot semantics: two incremental
    runs through the lifecycle converge to the same history the direct
    operator computes from the full batch."""
    from edna_dbt_library_spark.operators.materializations import Scd2Config
    from edna_dbt_library_spark.sources.tables import load_table

    runner = Runner(wh=wh, project_name="analytics", context="")
    node = ModelNode(name="user_hist", fqn=["analytics", "s", "user_hist"], path="s/u.sql")
    state = {"half": 1}

    def builder(s):
        ev = load_table(s, "/root/testdata/sf0.001", "events").select(
            "user_id", "ts", "event_type"
        )
        return ev.where(F.col("ts") <= "2024-01-15") if state["half"] == 1 else ev

    runner.register(
        Model(
            node=node,
            builder=builder,
            materialization="scd2_snapshot",
            mat_config=Scd2Config(unique_key="user_id", event_time="ts",
                                  tiebreakers=["event_type"]),
        )
    )
    r1 = runner.run("user_hist", validate=False, register_metadata=False)
    state["half"] = 2
    r2 = runner.run("user_hist", validate=False, register_metadata=False)
    target = r2["relation"]
    got = wh.read(target)
    assert {"valid_from", "valid_to", "is_current"} <= set(got.columns)
    # one current row per user, history contiguous
    cur = got.where("is_current").groupBy("user_id").count().collect()
    assert all(r["count"] == 1 for r in cur)
    # missing config refuses
    runner.register(Model(node=ModelNode(name="bad", fqn=["analytics", "s", "bad"]),
                          builder=builder, materialization="scd2_snapshot"))
    with pytest.raises(ValueError, match="Scd2Config"):
        runner.run("bad", validate=False, register_metadata=False)


def test_runner_snapshot_before_write_enables_rollback(spark, wh):
    """snapshot_before_write: after all gates pass, the Runner snapshots
    the CURRENT target so a bad batch that slips past schema/profile
    gates is still rollback-able via Warehouse.restore. The first run
    (no prior table) takes no snapshot; expiry honors snapshot_keep_last."""
    runner = Runner(wh=wh, project_name="analytics", context="")
    node = ModelNode(name="rolled", fqn=["analytics", "s", "rolled"], path="s/r.sql")
    state = {"n": 3}

    def builder(s):
        return s.range(state["n"]).select(F.col("id").alias("k"))

    runner.register(Model(node=node, builder=builder,
                          snapshot_before_write=True, snapshot_keep_last=2))
    r1 = runner.run("rolled", validate=False, register_metadata=False)
    assert "pre_write_snapshot" not in r1  # nothing existed to snapshot
    target = r1["relation"]
    assert wh.list_snapshots(target) == []

    state["n"] = 5
    r2 = runner.run("rolled", validate=False, register_metadata=False)
    v = r2["pre_write_snapshot"]
    assert wh.read(target).count() == 5
    # rollback: restore returns the pre-second-run (3-row) state
    wh.restore(target, v)
    assert wh.read(target).count() == 3

    # keep_last=2: a third and fourth run expire the oldest snapshot
    state["n"] = 7
    runner.run("rolled", validate=False, register_metadata=False)
    state["n"] = 9
    runner.run("rolled", validate=False, register_metadata=False)
    versions = [s["version"] for s in wh.list_snapshots(target)]
    assert len(versions) == 2 and v not in versions


def test_runner_maintains_zone_maps_after_writes(spark, wh):
    """zone_map_columns: every successful non-view write refreshes the
    file-level min/max sidecar incrementally, so range reads prune
    files without any separate maintenance step."""
    from edna_dbt_library_spark.operators.materializations import (
        PartitionMergeConfig,
        PartitionSpec,
    )

    runner = Runner(wh=wh, project_name="analytics", context="")
    node = ModelNode(name="zoned", fqn=["analytics", "s", "zoned"], path="s/z.sql")
    state = {"lo": 0, "hi": 4000}

    def builder(s):
        # day derived from the k-range -> each day-partition file covers
        # a tight contiguous k range the zone map can prune on
        return s.range(state["lo"], state["hi"]).select(
            F.col("id").alias("k"),
            F.to_timestamp(
                F.date_add(F.lit("2024-01-01").cast("date"),
                           F.expr("int(id div 1000) % 365"))
            ).alias("ts"),
        )

    cfg = PartitionMergeConfig(partition_by=PartitionSpec("ts"), unique_key="k")
    runner.register(Model(node=node, builder=builder,
                          materialization="incremental_partition_merge",
                          mat_config=cfg, zone_map_columns=["k"]))
    r1 = runner.run("zoned", validate=False, register_metadata=False)
    target = r1["relation"]
    assert r1["zone_maps"]["added"] == r1["zone_maps"]["files_total"] > 0

    kept, total = wh.prune_files(target, "k", 0, 999)
    assert 0 < len(kept) < total

    # incremental append only harvests the new files
    state["lo"], state["hi"] = 100_000, 104_000
    r2 = runner.run("zoned", validate=False, register_metadata=False)
    assert 0 < r2["zone_maps"]["added"] < r2["zone_maps"]["files_total"]
    kept2, total2 = wh.prune_files(target, "k", 100_000, None)
    assert 0 < len(kept2) < total2
    got = wh.read_pruned(target, "k", 100_000, None).where(F.col("k") >= 100_000)
    assert got.count() == 4000


def test_runner_maintains_bloom_sidecars_after_writes(spark, wh):
    """bloom_columns: every successful non-view write refreshes the
    file-level Bloom sidecar incrementally, so equality probes on a
    high-cardinality column skip files with no maintenance step."""
    from edna_dbt_library_spark.operators.materializations import (
        PartitionMergeConfig,
        PartitionSpec,
    )

    runner = Runner(wh=wh, project_name="analytics", context="")
    node = ModelNode(name="bloomed", fqn=["analytics", "s", "bloomed"], path="s/b.sql")
    state = {"lo": 0, "hi": 4000}

    def builder(s):
        return s.range(state["lo"], state["hi"]).select(
            F.concat(F.lit("u-"), F.col("id")).alias("uid"),
            F.to_timestamp(
                F.date_add(F.lit("2024-01-01").cast("date"),
                           F.expr("int(id div 1000) % 365"))
            ).alias("ts"),
        )

    cfg = PartitionMergeConfig(partition_by=PartitionSpec("ts"), unique_key="uid")
    runner.register(Model(node=node, builder=builder,
                          materialization="incremental_partition_merge",
                          mat_config=cfg, bloom_columns=["uid"]))
    r1 = runner.run("bloomed", validate=False, register_metadata=False)
    target = r1["relation"]
    assert r1["blooms"]["added"] == r1["blooms"]["files_total"] > 0

    kept, total = wh.bloom_prune_files(target, "uid", "u-1234")
    assert 0 < len(kept) < total

    # incremental append only indexes the new files
    state["lo"], state["hi"] = 100_000, 104_000
    r2 = runner.run("bloomed", validate=False, register_metadata=False)
    assert 0 < r2["blooms"]["added"] <= r2["blooms"]["files_total"]
    got = wh.read_bloom_pruned(target, "uid", "u-100001").where(F.col("uid") == "u-100001")
    assert got.count() == 1
