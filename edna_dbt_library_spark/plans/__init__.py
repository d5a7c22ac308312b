from edna_dbt_library_spark.plans.catalog import (
    CATALOG_SCHEMA,
    DataproductEntry,
    catalog_relation,
    dataproduct_id,
    is_registered_dataproduct,
    register_dataproduct_metadata,
    upsert_dataproduct_entry,
)
from edna_dbt_library_spark.plans.config import get_config_or_meta, is_defined, quote_replace
from edna_dbt_library_spark.plans.contracts import (
    ContractError,
    FieldPath,
    check_column_deletion_and_descriptions,
    flatten_schema,
    get_missing_columns,
    validate_dataproduct,
    validate_preview_where_clause,
    validate_semantic_versioning,
)
from edna_dbt_library_spark.plans.naming import (
    ModelNode,
    generate_alias_name,
    generate_schema_name,
    get_deployed_relation,
)
from edna_dbt_library_spark.plans.registry import Model, ProfileGateConfig, Runner
from edna_dbt_library_spark.plans.scale_lint import ScaleFinding, assert_scale_clean, explain_scale

__all__ = [
    "CATALOG_SCHEMA",
    "DataproductEntry",
    "catalog_relation",
    "dataproduct_id",
    "is_registered_dataproduct",
    "register_dataproduct_metadata",
    "upsert_dataproduct_entry",
    "get_config_or_meta",
    "is_defined",
    "quote_replace",
    "ContractError",
    "FieldPath",
    "check_column_deletion_and_descriptions",
    "flatten_schema",
    "get_missing_columns",
    "validate_dataproduct",
    "validate_preview_where_clause",
    "validate_semantic_versioning",
    "ModelNode",
    "generate_alias_name",
    "generate_schema_name",
    "get_deployed_relation",
    "Model",
    "ProfileGateConfig",
    "ScaleFinding",
    "assert_scale_clean",
    "explain_scale",
    "Runner",
]
