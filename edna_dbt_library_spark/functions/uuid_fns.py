"""Deterministic name-based UUIDs (RFC 4122 v5/v3) as pure Column builders.

Parity target: the reference's BigQuery-safe UUIDv5 macro
(macros/utils/uuid_generation.sql:1-46): SHA-1 over namespace-bytes ‖
name-bytes, truncated to 128 bits, version nibble forced at hex position 13,
variant nibble at position 17 mapped into {8,9,a,b}, hyphenated 8-4-4-4-12.

Determinism matters: these are dedup / correlation keys, so the whole
pipeline is JVM built-ins (sha1/md5/substring/concat) — codegen-friendly
and reproducible across runs and cluster sizes.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def _namespace_hex(namespace_uuid: str) -> str:
    ns = namespace_uuid.replace("-", "").lower()
    if not re.fullmatch(r"[0-9a-f]{32}", ns):
        raise ValueError(f"namespace_uuid must be a UUID string, got {namespace_uuid!r}")
    return ns


def _rfc4122_from_hex32(hx: Column, version_digit: str) -> Column:
    # Force the version nibble (position 13 of the 32-char hex).
    hx_v = F.concat(F.substring(hx, 1, 12), F.lit(version_digit), F.substring(hx, 14, 19))
    # Map the variant nibble (position 17) into {8,9,a,b}: d -> (d & 3) | 8,
    # expressed as a lookup on d mod 4 (same mapping as the reference's CASE,
    # uuid_generation.sql:24-29).
    d = F.conv(F.substring(hx_v, 17, 1), 16, 10).cast("int")
    variant = F.element_at(F.array(F.lit("8"), F.lit("9"), F.lit("a"), F.lit("b")), d % 4 + 1)
    hx_vr = F.concat(F.substring(hx_v, 1, 16), variant, F.substring(hx_v, 18, 15))
    return F.lower(
        F.concat_ws(
            "-",
            F.substring(hx_vr, 1, 8),
            F.substring(hx_vr, 9, 4),
            F.substring(hx_vr, 13, 4),
            F.substring(hx_vr, 17, 4),
            F.substring(hx_vr, 21, 12),
        )
    )


def uuid_v5(name_expr: Column | str, namespace_uuid: str) -> Column:
    """RFC 4122 UUIDv5 (SHA-1) of a string column under a namespace UUID.

    Matches Python's ``uuid.uuid5(uuid.UUID(namespace_uuid), name)`` and the
    reference macro (macros/utils/uuid_generation.sql:1-46).
    """
    ns_hex = _namespace_hex(namespace_uuid)
    digest = F.sha1(F.concat(F.unhex(F.lit(ns_hex)), _col(name_expr).cast("binary")))
    return _rfc4122_from_hex32(F.substring(digest, 1, 32), "5")


def uuid_v3(name_expr: Column | str, namespace_uuid: str) -> Column:
    """RFC 4122 UUIDv3 (MD5) — same construction as :func:`uuid_v5` with MD5
    and version nibble '3'. Matches Python's ``uuid.uuid3``. Provided because
    MD5 is available in more oracle engines than SHA-1, and as the md5
    counterpart the reference's catalog layer uses for ids
    (macros/product_registration/register_dataproduct_metadata.sql:95).
    """
    ns_hex = _namespace_hex(namespace_uuid)
    digest = F.md5(F.concat(F.unhex(F.lit(ns_hex)), _col(name_expr).cast("binary")))
    return _rfc4122_from_hex32(digest, "3")
