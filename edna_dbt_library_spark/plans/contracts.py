"""Data-product schema contracts (reference §2C:
macros/product_registration/validate_dataproduct.sql).

All checks run on the driver over ``StructType`` metadata — no data scans.
The nested-field flattener replaces BigQuery's
INFORMATION_SCHEMA.COLUMN_FIELD_PATHS: it emits the dotted path of every
field *including* STRUCT containers, exactly like COLUMN_FIELD_PATHS does.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from edna_dbt_library_spark.plans.config import get_config_or_meta, is_defined
from edna_dbt_library_spark.plans.naming import ModelNode


class ContractError(Exception):
    """Raised when a data-product contract is violated (the analogue of the
    reference's raise_compiler_error)."""


@dataclass(frozen=True)
class FieldPath:
    field_path: str
    data_type: str


def flatten_schema(schema: T.StructType, prefix: str = "") -> list[FieldPath]:
    """Dotted field paths with types, containers included
    (reference: validate_dataproduct.sql:103-118 reads COLUMN_FIELD_PATHS,
    which lists both `address` STRUCT<...> and `address.city` STRING)."""
    out: list[FieldPath] = []
    for f in schema.fields:
        path = f"{prefix}{f.name}"
        out.append(FieldPath(path, f.dataType.simpleString().upper()))
        inner = f.dataType
        if isinstance(inner, T.ArrayType) and isinstance(inner.elementType, T.StructType):
            inner = inner.elementType
        if isinstance(inner, T.StructType):
            out.extend(flatten_schema(inner, prefix=f"{path}."))
    return out


def get_missing_columns(old: list[FieldPath], new: list[FieldPath]) -> list[FieldPath]:
    """Columns present in the deployed schema but not the new one —
    STRUCT/RECORD containers exempt (reference:
    validate_dataproduct.sql:93-101)."""
    new_set = set(new)
    return [
        c
        for c in old
        if c not in new_set and not ("RECORD" in c.data_type or "STRUCT" in c.data_type)
    ]


def validate_semantic_versioning(v) -> None:
    """2-4 dot-separated numeric parts (reference:
    validate_dataproduct.sql:120-131)."""
    parts = str(v).split(".")
    if len(parts) > 4 or len(parts) < 2:
        raise ContractError(
            "Version string portion was too short or too long. Use format: "
            "major.minor.(build).(revision)"
        )
    for part in parts:
        if not re.fullmatch(r"\d+", part):
            raise ContractError(f"each part of version must be a number. '{part}' is not a number")


def validate_preview_where_clause(model_df: DataFrame, where_clause: str) -> None:
    """Smoke-compile ``SELECT * FROM (model) WHERE {clause}`` — Catalyst
    analysis validates the predicate without executing anything (the
    reference runs a temp-view CTAS for the same effect,
    validate_dataproduct.sql:39-43)."""
    try:
        model_df.filter(where_clause).schema  # analysis happens lazily here
    except Exception as e:
        raise ContractError(f"invalid previewWhereClause {where_clause!r}: {e}") from e


def validate_is_in_dataproduct_dataset(deployed_schema: str) -> None:
    """reference: validate_dataproduct.sql:45-52."""
    if deployed_schema.split("_")[-1] == "curated":
        raise ContractError(
            "Models for registered dataproducts must be in a subfolder called dataproduct "
            "under your dataproductgroup. e.g: models/example/dataproduct/mymodel.sql"
        )


def check_column_deletion_and_descriptions(
    new_schema: T.StructType,
    deployed_schema: T.StructType | None,
    node: ModelNode,
    is_registered: bool,
) -> None:
    """Registered products may not lose columns; every column needs a
    description in the model definition (reference:
    validate_dataproduct.sql:66-91)."""
    new_cols = flatten_schema(new_schema)
    if is_registered and deployed_schema is not None:
        old_cols = flatten_schema(deployed_schema)
        missing = get_missing_columns(old_cols, new_cols)
        if missing:
            raise ContractError(
                "Schema of registered dataproduct can't be changed. Missing columns: "
                + ", ".join(c.field_path for c in missing)
            )
    model_columns = node.columns or {}
    for col in new_cols:
        meta = model_columns.get(col.field_path) or {}
        if not is_defined(meta.get("description")):
            raise ContractError(
                f"Dataproduct columns must have a description, missing description for {col.field_path}"
            )


def validate_dataproduct(
    *,
    node: ModelNode,
    model_df: DataFrame,
    deployed_schema: T.StructType | None,
    deployed_schema_name: str,
    is_registered: bool,
) -> None:
    """Full validation orchestration (reference:
    validate_dataproduct.sql:1-37): unregister guard → owner → preview
    clause → semver → dataset placement → description → column contract."""
    dataproduct = get_config_or_meta(node.config, node.meta, "dataproduct")
    is_dataproduct = is_defined(dataproduct) or bool(node.config.get("datacatalog", False))

    if is_registered and not is_dataproduct:
        raise ContractError("Can't unregister dataproduct.")
    if not is_dataproduct:
        return

    owner = dataproduct.get("owner") if is_defined(dataproduct) else node.config.get("group")
    if not is_defined(owner):
        raise ContractError("Dataproduct owner must be set")

    preview = (
        dataproduct.get("previewWhereClause")
        if is_defined(dataproduct)
        else node.config.get("previewWhereClause")
    )
    if is_defined(preview):
        validate_preview_where_clause(model_df, preview)

    version = dataproduct.get("version") if is_defined(dataproduct) else None
    if is_defined(version):
        validate_semantic_versioning(version)

    validate_is_in_dataproduct_dataset(deployed_schema_name)

    if not is_defined(node.description):
        raise ContractError("Dataproducts must have a description")

    check_column_deletion_and_descriptions(model_df.schema, deployed_schema, node, is_registered)
