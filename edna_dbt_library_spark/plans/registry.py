"""Model registry + runner: the engine's replacement for dbt's
parse→compile→materialize lifecycle (SURVEY.md §3.4).

A Model is a named Python function ``(spark) -> DataFrame`` (the analogue
of a compiled SELECT) plus a ModelNode carrying fqn/config/meta. The
runner resolves env-aware naming, executes contract pre-hooks, dispatches
to the configured materialization, and runs catalog registration
post-hooks — the same orchestration the reference's materialization macros
and hooks perform, minus Jinja.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from edna_dbt_library_spark.operators.materializations import (
    IncrementalLogConfig,
    PartitionMergeConfig,
    run_incremental_log,
    run_incremental_partition_merge,
)
from edna_dbt_library_spark.plans.catalog import is_registered_dataproduct, register_dataproduct_metadata
from edna_dbt_library_spark.plans.contracts import validate_dataproduct
from edna_dbt_library_spark.plans.naming import (
    ModelNode,
    generate_alias_name,
    generate_schema_name,
    get_deployed_relation,
)
from edna_dbt_library_spark.sources.warehouse import Relation, TableMeta, Warehouse


@dataclass
class ProfileGateConfig:
    """Content-contract gate for the publish lifecycle: the batch's
    column profile is checked against the baseline stored with the
    deployed table (operators/profiling.profile_drift) BEFORE anything
    is written; on a passing run the baseline refreshes. The schema
    gate (validate_dataproduct) catches shape breaks, this catches a
    batch that kept its schema but lost its content."""

    columns: list[str] | None = None  # None -> every column
    null_frac_tol: float = 0.05
    distinct_frac_tol: float = 0.5
    top_frac_tol: float = 0.2
    exact: bool = False  # HLL++ distinct counts by default at scale
    update_baseline: bool = True


@dataclass
class Model:
    node: ModelNode
    builder: Callable[[SparkSession], DataFrame] | None = None
    sql: str | None = None  # SQL-text model (the dbt-style compiled SELECT)
    materialization: str = "table"  # table | view | incremental_log | incremental_partition_merge | scd2_snapshot
    mat_config: object | None = None  # IncrementalLogConfig | PartitionMergeConfig
    profile_gate: ProfileGateConfig | None = None
    #: snapshot the existing target BEFORE each write (warehouse time
    #: travel, hardlink-cheap): every run becomes rollback-able —
    #: Warehouse.restore(target, version) undoes a bad batch that
    #: slipped past the schema and profile gates
    snapshot_before_write: bool = False
    snapshot_keep_last: int = 3
    #: columns to maintain file-level min/max zone maps for (data
    #: skipping on non-partition columns): after every successful
    #: non-view write the Runner refreshes the sidecar incrementally —
    #: O(new files) footer reads, zero data bytes
    zone_map_columns: list[str] | None = None
    #: columns to maintain file-level Bloom sidecars for (equality
    #: skipping on high-cardinality columns where min/max prunes
    #: nothing): refreshed incrementally after every successful
    #: non-view write — one distributed scan of only the NEW files
    bloom_columns: list[str] | None = None

    def build(self, spark: SparkSession) -> DataFrame:
        if self.builder is not None:
            return self.builder(spark)
        if self.sql is not None:
            return spark.sql(self.sql)
        raise ValueError(f"model '{self.node.name}' has neither a builder nor sql text")


@dataclass
class Runner:
    wh: Warehouse
    project_name: str
    default_schema: str = "analytics"
    context: str | None = None  # None -> env DBT_CLOUD_INVOCATION_CONTEXT
    models: dict[str, Model] = field(default_factory=dict)

    def register(self, model: Model) -> None:
        self.models[model.node.name] = model

    def model(self, name=None, fqn=None, materialization="table", mat_config=None, **node_kwargs):
        """Decorator: ``@runner.model(fqn=[...], ...)`` over a builder fn."""

        def deco(fn):
            node = ModelNode(name=name or fn.__name__, fqn=fqn or [], **node_kwargs)
            if not node.unique_id:
                node.unique_id = f"model.{self.project_name}.{node.name}"
            self.register(Model(node=node, builder=fn, materialization=materialization, mat_config=mat_config))
            return fn

        return deco

    # -- naming --------------------------------------------------------------
    def target_relation(self, model: Model) -> Relation:
        node = model.node
        schema = generate_schema_name(
            node.config.get("schema"),
            node,
            project_name=self.project_name,
            default_schema=self.default_schema,
            context=self.context,
        )
        alias = generate_alias_name(node.config.get("alias"), node)
        return self.wh.relation(schema.strip(), alias)

    # -- lifecycle -----------------------------------------------------------
    def run(self, name: str, *, validate: bool = True, register_metadata: bool = True) -> dict:
        model = self.models[name]
        node = model.node
        spark = self.wh.spark
        target = self.target_relation(model)
        from edna_dbt_library_spark.plans.grants import validate_grant_config
        from edna_dbt_library_spark.sources.tables import strip_raw_ns_cols

        # validate the grants config up front (dbt: compile-time error),
        # before any data is written
        validate_grant_config(node.config.get("grants"))
        existed_before = self.wh.exists(target)

        df = strip_raw_ns_cols(model.build(spark))

        deployed = get_deployed_relation(target, node, context=self.context)
        registered = is_registered_dataproduct(self.wh, deployed.schema, deployed.identifier)

        if validate:
            deployed_schema = None
            if self.wh.exists(deployed):
                from edna_dbt_library_spark.operators.materializations import read_table

                # read_table hides the engine-internal _pdate partition
                # column (BigQuery's partition pseudo-column is likewise
                # absent from COLUMN_FIELD_PATHS)
                deployed_schema = read_table(self.wh, deployed).schema
            validate_dataproduct(
                node=node,
                model_df=df,
                deployed_schema=deployed_schema,
                deployed_schema_name=deployed.schema,
                is_registered=registered,
            )

        current_profile = None
        if model.profile_gate is not None:
            from edna_dbt_library_spark.operators.profiling import (
                enforce_profile_drift,
                profile_columns,
            )

            gate = model.profile_gate
            # pin the profile once: the SAME evaluated stats are both
            # enforced and (on pass) persisted as the next baseline — a
            # nondeterministic builder can't enforce one profile and
            # write another, and the batch isn't scanned twice
            current_profile = profile_columns(
                df, gate.columns, exact=gate.exact
            ).localCheckpoint(eager=True)
            baseline = self.wh.read_profile(target)
            if baseline is not None:
                # fail BEFORE any write: a drifted batch never lands
                enforce_profile_drift(
                    baseline,
                    current_profile,
                    null_frac_tol=gate.null_frac_tol,
                    distinct_frac_tol=gate.distinct_frac_tol,
                    top_frac_tol=gate.top_frac_tol,
                )

        pre_version = None
        if model.snapshot_before_write and existed_before:
            # after every gate has passed, right before the first write:
            # the version captures the exact state a restore returns to
            pre_version = self.wh.snapshot(
                target, note=f"pre-write {node.name}"
            )
            self.wh.expire_snapshots(target, keep_last=model.snapshot_keep_last)

        if model.materialization == "incremental_log":
            cfg = model.mat_config or IncrementalLogConfig()
            result = run_incremental_log(
                self.wh, target, df, cfg,
                domain=node.domain or self.project_name,
                model_name=node.name,
                node_unique_id=node.unique_id,
            )
        elif model.materialization == "incremental_partition_merge":
            cfg = model.mat_config
            if cfg is None:
                raise ValueError("incremental_partition_merge requires a PartitionMergeConfig")
            result = run_incremental_partition_merge(self.wh, target, df, cfg)
        elif model.materialization == "scd2_snapshot":
            from edna_dbt_library_spark.operators.materializations import (
                run_scd2_snapshot,
            )

            cfg = model.mat_config
            if cfg is None:
                raise ValueError("scd2_snapshot requires a Scd2Config")
            result = run_scd2_snapshot(self.wh, target, df, cfg)
        elif model.materialization == "table":
            self.wh.create_as(target, df, TableMeta())
            result = {"action": "table", "relation": target}
        elif model.materialization == "view":
            df.createOrReplaceTempView(f"{target.schema}__{target.identifier}")
            result = {"action": "view", "relation": target}
        else:
            raise ValueError(f"unknown materialization '{model.materialization}'")

        if model.materialization != "view":
            # grants + persisted-docs epilogue (reference:
            # incremental_log.sql:161-166). should_revoke mirrors dbt: only
            # a replaced relation invalidates standing grants — a no-op /
            # pure-append incremental run keeps them and merges new ones.
            from edna_dbt_library_spark.plans.grants import apply_grants, persist_docs

            full_refresh = bool(getattr(model.mat_config, "full_refresh", False))
            replaced = (
                model.materialization == "table"
                or full_refresh
                or result.get("action") in ("create", "create_empty")
            )
            should_revoke = existed_before and replaced
            result["grants"] = apply_grants(
                self.wh, target, node.config.get("grants"), should_revoke
            )
            result["persisted_docs"] = persist_docs(self.wh, target, node)

        if (
            current_profile is not None
            and model.profile_gate.update_baseline
            and model.materialization != "view"
        ):
            # the batch passed: it becomes the next run's baseline
            self.wh.write_profile(target, current_profile)
            result["profile_gate"] = "passed"

        if model.zone_map_columns and model.materialization != "view":
            result["zone_maps"] = self.wh.refresh_zone_maps(
                target, model.zone_map_columns
            )

        if model.bloom_columns and model.materialization != "view":
            result["blooms"] = self.wh.refresh_bloom_sidecar(
                target, model.bloom_columns
            )

        if pre_version is not None:
            result["pre_write_snapshot"] = pre_version

        if register_metadata and model.materialization != "view":
            register_dataproduct_metadata(
                self.wh, node=node, target=target, project_name=self.project_name
            )
        return result
