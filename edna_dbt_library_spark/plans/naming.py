"""Environment-aware schema/alias naming (reference §2F):
macros/generate_schema_name.sql, macros/generate_alias_name.sql,
macros/product_registration/helpers.sql (get_deployed_relation).

A model node's FQN path is [domain, dataproduct_group, layer, name]; prod
schemas are ``{project}_{group}`` for the dataproduct layer and
``{project}_{group}_curated`` otherwise; dev runs write to a per-user
scratch schema and ci to the target default.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from edna_dbt_library_spark.sources.warehouse import Relation


@dataclass
class ModelNode:
    """The subset of a dbt node the naming/contract layers need."""

    name: str
    fqn: list[str]  # [domain, group, layer, ...]
    config: dict = field(default_factory=dict)
    meta: dict = field(default_factory=dict)
    description: str = ""
    columns: dict = field(default_factory=dict)  # name -> {"description": ...}
    version: str | None = None
    path: str = ""
    unique_id: str = ""

    @property
    def domain(self) -> str:
        return self.fqn[0] if self.fqn else ""

    @property
    def group(self) -> str:
        return self.fqn[1] if len(self.fqn) > 1 else ""

    @property
    def layer(self) -> str:
        return self.fqn[2] if len(self.fqn) > 2 else ""


def invocation_context() -> str:
    return os.environ.get("DBT_CLOUD_INVOCATION_CONTEXT", "")


def generate_schema_name(
    custom_schema_name: str | None,
    node: ModelNode,
    *,
    project_name: str,
    default_schema: str,
    context: str | None = None,
) -> str:
    """reference: macros/generate_schema_name.sql:1-23 — ci uses the target
    schema, dev a per-user schema, prod the fqn-derived name."""
    ctx = invocation_context() if context is None else context
    if ctx == "ci":
        return default_schema
    if ctx == "dev":
        return f"dbt_cloud_user_{os.environ.get('DBT_USER_ID', '')}"
    if node.layer == "dataproduct":
        return f"{project_name}_{node.group}"
    return f"{project_name}_{node.group}_curated"


def generate_alias_name(custom_alias_name: str | None = None, node: ModelNode | None = None) -> str:
    """reference: macros/generate_alias_name.sql:1-26 — version suffix
    ``_v{major[-minor]}`` from the dataproduct config (or node version);
    v1 gets no suffix; custom override wins.

    NB the reference's ``version | trim('.0')`` strips '.' and '0'
    characters from both ends (Jinja trim-with-chars), so '2.0' -> '2' and
    '10.0' -> '1' — quirk preserved.
    """
    from edna_dbt_library_spark.plans.config import get_config_or_meta, is_defined

    v = None
    dataprod = get_config_or_meta(node.config, node.meta, "dataproduct") if node else None
    if is_defined(dataprod) and is_defined(dataprod.get("version")):
        v = str(dataprod.get("version")).strip(".0")
        if v == "1":
            v = ""
    elif node is not None and node.version:
        v = str(node.version)

    if custom_alias_name:
        return custom_alias_name.strip()
    if is_defined(v):
        return f"{node.name}_v{v.replace('.', '-')}"
    return node.name


def get_deployed_relation(target_relation: Relation, node: ModelNode, *, context: str | None = None) -> Relation:
    """In dev/ci, rewrite the schema to the prod naming derived from the
    FQN so catalog lookups hit the deployed table
    (reference: macros/product_registration/helpers.sql:26-53)."""
    ctx = invocation_context() if context is None else context
    if ctx not in ("dev", "ci"):
        return target_relation
    deploy_schema = target_relation.schema
    if len(node.fqn) >= 3:
        domain, group, layer = node.fqn[0].lower(), node.fqn[1].lower(), node.fqn[2].lower()
        if layer == "curated":
            deploy_schema = f"{domain}_{group}_curated"
        elif layer == "dataproduct":
            deploy_schema = f"{domain}_{group}"
    return Relation(
        schema=deploy_schema,
        identifier=target_relation.identifier,
        database=target_relation.database,
    )
