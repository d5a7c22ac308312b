"""Grants + persisted-docs epilogue for the runner.

Parity targets: the reference materializations end every run with
``apply_grants(target_relation, grant_config, should_revoke)`` and
``persist_docs(target_relation, model)`` (reference:
macros/materialization/incremental_log.sql:27,161-166 and
incremental_partition_merge.sql epilogue).

A parquet-path warehouse has no ACL engine, so this layer implements the
orchestration contract — config validation, revoke-vs-merge semantics,
and durable recording in the table's metadata sidecar — without
pretending to enforce. A deployment backed by a real catalog (Unity,
Glue, Ranger) would swap the `_record` step for actual GRANT/REVOKE
calls; everything upstream (the runner, the config surface, the
semantics) is already in place.
"""

from __future__ import annotations

from edna_dbt_library_spark.sources.warehouse import Relation, Warehouse


def validate_grant_config(grant_config: object) -> dict[str, list[str]]:
    """Normalize/validate a dbt-style grants config: a mapping of
    privilege -> grantee or list of grantees. Raises on malformed input
    (dbt surfaces these as compile errors)."""
    if grant_config is None:
        return {}
    if not isinstance(grant_config, dict):
        raise ValueError(f"grants config must be a mapping, got {type(grant_config).__name__}")
    out: dict[str, list[str]] = {}
    for priv, grantees in grant_config.items():
        if not isinstance(priv, str) or not priv.strip():
            raise ValueError(f"grants: privilege must be a non-empty string, got {priv!r}")
        if isinstance(grantees, str):
            grantees = [grantees]
        if not isinstance(grantees, (list, tuple)) or not all(
            isinstance(g, str) and g.strip() for g in grantees
        ):
            raise ValueError(f"grants[{priv!r}]: grantees must be a string or list of strings")
        # de-dup, stable order (dbt treats grants as sets)
        out[priv.strip()] = sorted(set(g.strip() for g in grantees))
    return out


def apply_grants(
    wh: Warehouse,
    rel: Relation,
    grant_config: object,
    should_revoke: bool,
) -> dict[str, list[str]]:
    """Record the model's grants on the target relation.

    dbt semantics (apply_grants + should_revoke): when the relation was
    just (re)created — ``should_revoke`` True — standing grants are stale,
    so the recorded state is *replaced* by the config (a diff-and-revoke
    against the old state). On an in-place incremental run standing grants
    remain valid and the config is *merged* in (grant-only, no revoke).
    Returns the resulting recorded grants.
    """
    cfg = validate_grant_config(grant_config)
    meta = wh.read_meta(rel)
    current = dict(meta.grants or {})
    if should_revoke:
        new = cfg
    else:
        new = dict(current)
        for priv, grantees in cfg.items():
            new[priv] = sorted(set(new.get(priv, [])) | set(grantees))
    if new != current or meta.grants is None:
        meta.grants = new
        wh.write_meta(rel, meta)
    return new


def persist_docs(wh: Warehouse, rel: Relation, node) -> dict:
    """Record relation/column descriptions per the model's persist_docs
    config (dbt: {"relation": bool, "columns": bool}; absent -> no-op,
    matching BigQuery's default)."""
    pd_cfg = node.config.get("persist_docs") or {}
    if not isinstance(pd_cfg, dict):
        raise ValueError(f"persist_docs config must be a mapping, got {type(pd_cfg).__name__}")
    recorded: dict = {}
    if not pd_cfg:
        return recorded
    meta = wh.read_meta(rel)
    changed = False
    if pd_cfg.get("relation"):
        desc = node.description or ""
        if meta.description != desc:
            meta.description = desc
            changed = True
        recorded["description"] = desc
    if pd_cfg.get("columns"):
        cols = {
            name: (spec or {}).get("description", "")
            for name, spec in (node.columns or {}).items()
        }
        if meta.column_descriptions != cols:
            meta.column_descriptions = cols
            changed = True
        recorded["column_descriptions"] = cols
    if changed:
        wh.write_meta(rel, meta)
    return recorded
