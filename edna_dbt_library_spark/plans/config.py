"""Config resolution helpers (reference §2F:
macros/utils/config_helpers.sql, macros/product_registration/helpers.sql)."""

from __future__ import annotations


def get_config_or_meta(config: dict, meta: dict, key: str, default=None):
    """meta dict first, then top-level config (reference:
    macros/utils/config_helpers.sql:1-15)."""
    meta = meta or {}
    config = config or {}
    if meta.get(key) is not None:
        return meta[key]
    return config.get(key, default)


def is_defined(item) -> bool:
    """defined ∧ not None ∧ ≠ '' (reference:
    macros/product_registration/helpers.sql:1-3)."""
    return item is not None and item != ""


def quote_replace(s: str) -> str:
    """Escape quotes for embedding in generated text (reference:
    macros/utils/quote_replace.sql:1-3)."""
    return s.replace("'", "\\'").replace('"', '\\"')
