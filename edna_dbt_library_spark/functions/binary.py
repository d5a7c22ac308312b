"""Binary / hex / base64 / bitstring conversion Column builders.

Parity targets: the compile-time SQL-fragment macros in the reference's
``macros/utils/binary_conversions.sql`` (cited per function). Like the
reference — where each Jinja macro returns a SQL *expression* string that
BigQuery constant-folds and inlines — every function here returns a pure
``pyspark.sql.Column`` built from JVM built-ins, so Catalyst constant-folds
and whole-stage-codegens it. No Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BASE64_ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"
HEX_ALPHABET = "0123456789abcdef"


def _col(c: Column | str) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def bytes4_to_int32(byte_value: Column | str) -> Column:
    """4-byte BYTES → signed int32 (returned as long).

    Two's complement: interpret as unsigned 32-bit, subtract 2^32 when the
    sign bit is set. Reference: macros/utils/binary_conversions.sql:1-14.
    """
    u32 = F.conv(F.hex(_col(byte_value)), 16, 10).cast("long")
    return F.when(u32 > 0x7FFFFFFF, u32 - 0x100000000).otherwise(u32)


def _alphabet_map(ch: Column, alphabet: str) -> Column:
    # STRPOS(alphabet, ch) - 1, with '' (past-end substr) and not-found both
    # mapped to NULL via the reference's NULLIF(-1) idiom.
    raw = F.when(ch == "", F.lit(-1)).otherwise(F.instr(F.lit(alphabet), ch) - 1)
    return F.nullif(raw, F.lit(-1))


def base64_map(b64_str: Column | str, index: Column | int, zero_based: bool = False) -> Column:
    """Base-64 character at ``index`` → its six-bit ordinal (0-63), NULL when
    out of range / not in the alphabet.
    Reference: macros/utils/binary_conversions.sql:17-37.
    """
    idx = index if isinstance(index, Column) else F.lit(index)
    pos1 = (idx + 1) if zero_based else idx
    ch = F.substring(_col(b64_str), pos1, F.lit(1))
    return _alphabet_map(ch, BASE64_ALPHABET)


def hex_map(hex_str: Column | str, index: Column | int, zero_based: bool = False) -> Column:
    """Hex character at ``index`` → its 4-bit ordinal (0-15), case-insensitive.
    Reference: macros/utils/binary_conversions.sql:40-59.
    """
    idx = index if isinstance(index, Column) else F.lit(index)
    pos1 = (idx + 1) if zero_based else idx
    ch = F.lower(F.substring(_col(hex_str), pos1, F.lit(1)))
    return _alphabet_map(ch, HEX_ALPHABET)


def reverse_hex_bytes(hex_expr: Column | str, add_0x: bool = False) -> Column:
    """Reverse the *byte* order of a hex string (pairs of hex chars), with an
    optional ``0x`` prefix on the output. An odd trailing nibble is dropped,
    matching the reference's ``REGEXP_EXTRACT_ALL(.., r'..')``.
    Reference: macros/utils/binary_conversions.sql:62-78.
    """
    stripped = F.regexp_replace(_col(hex_expr), "^0x", "")
    pairs = F.regexp_extract_all(stripped, F.lit(".."), 0)
    out = F.concat_ws("", F.reverse(pairs))
    return F.concat(F.lit("0x"), out) if add_0x else out


def hex_to_int(hex_val: Column | str) -> Column:
    """Hex string (optional 0x/0X prefix, case-insensitive) → signed long;
    NULL on malformed input or values outside signed-64 range (the
    reference's SAFE_CAST('0x…' AS INT64) semantics).
    Reference: macros/utils/binary_conversions.sql:81-90.
    """
    cleaned = F.regexp_replace(_col(hex_val), "(?i)^0x", "")
    # Guard before conv: ANSI-mode conv raises on >64-bit overflow, and
    # SAFE_CAST must instead yield NULL. conv() is unsigned, so values in
    # [2^63, 2^64) produce decimal strings that try_cast maps to NULL,
    # matching BigQuery's signed-overflow NULL.
    valid = cleaned.rlike("^[0-9a-fA-F]{1,16}$")
    return F.when(valid, F.conv(cleaned, 16, 10).try_cast("long")).otherwise(F.lit(None).cast("long"))


def digit_to_bitstring(digit: Column | str, base: int) -> Column:
    """One radix-``base`` digit (0 ≤ digit < base) → its binary string of
    width ceil(log2(base)). Out-of-range digits contribute their low
    ``width`` bits, matching the reference's ``digit >> i & 1`` loop.
    Reference: macros/utils/binary_conversions.sql:93-105.

    ``base`` is a compile-time Python int (it is a Jinja-time parameter in
    the reference too).
    """
    import math

    width = max(1, math.ceil(math.log2(base)))
    return value_to_bitstring(digit, width)


def value_to_bitstring(value: Column | str, width: int) -> Column:
    """Integer → fixed-width binary string of its low ``width`` bits.
    Reference: macros/utils/binary_conversions.sql:108-119.
    """
    v = _col(value).cast("long")
    if width < 64:
        v = v.bitwiseAND(F.lit((1 << width) - 1))
    # bin() renders the masked value without leading zeros; lpad restores the
    # fixed width (bin of a 64-bit negative is already 64 chars).
    return F.lpad(F.bin(v), width, "0")


def bitstring_to_int(bitstr: Column | str) -> Column:
    """Binary string → long. Digit characters contribute their numeric value
    (the reference SAFE_CASTs each char, so '102' -> 1<<2 + 0<<1 + 2 = 6);
    non-digits contribute 0 (SAFE_CAST NULL, skipped by SUM); a string with
    no digits at all yields NULL (SUM over zero non-NULL rows).
    Reference: macros/utils/binary_conversions.sql:122-130.
    """
    s = _col(bitstr)
    chars = F.split(s, "")
    # Horner's rule left-fold: acc*2 + digit — equivalent to the reference's
    # SUM(digit << (len-1-idx)) without needing a per-element variable shift.
    total = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: acc * 2 + F.coalesce(c.try_cast("long"), F.lit(0)),
    )
    has_bits = F.length(F.regexp_replace(s, "[^0-9]", "")) > 0
    # >63 significant chars would overflow signed-64 (an error in BigQuery's
    # << too); yield NULL instead of an ANSI arithmetic error.
    return F.when(has_bits & (F.length(s) <= 63), total).otherwise(F.lit(None).cast("long"))


def double_unbiased_exponent(exp_bits: Column | str) -> Column:
    """11-bit exponent field of an IEEE-754 double → unbiased exponent
    (bias 1023). Reference: macros/utils/binary_conversions.sql:133-141.
    """
    return bitstring_to_int(exp_bits) - 1023


def double_mantissa(frac_bits: Column | str) -> Column:
    """52-bit fraction field of an IEEE-754 double → normalized mantissa
    ``1 + Σ bit_i · 2^-(i+1)``. Strings shorter than 52 bits are
    zero-extended (the reference's COALESCE(SAFE_CAST(SUBSTR(..)), 0));
    longer ones are truncated to 52 bits.
    Reference: macros/utils/binary_conversions.sql:144-156.
    """
    # rpad both zero-extends and truncates to exactly 52 bits; the integer
    # value of those bits over 2^52 equals the bit-weighted sum exactly
    # (powers of two: no rounding).
    frac52 = F.rpad(F.regexp_replace(_col(frac_bits), "[^01]", "0"), 52, "0")
    return F.conv(frac52, 2, 10).cast("double") / F.lit(float(1 << 52)) + F.lit(1.0)


def double_from_components(sign: Column | str, mantissa: Column | str, unbiased_exponent: Column | str) -> Column:
    """(-1)^sign · mantissa · 2^exponent, ROUNDed to 5 decimals — the
    reference rounds, so we preserve that quirk for bit-compatibility.
    Reference: macros/utils/binary_conversions.sql:159-166.
    """
    s = _col(sign).cast("long")
    return F.round(
        F.pow(F.lit(-1.0), s) * _col(mantissa) * F.pow(F.lit(2.0), _col(unbiased_exponent)),
        5,
    )


def morton_key(cols: list[Column | str], bits_per_dim: int = 21) -> Column:
    """Z-order (Morton) interleave of up to 3 non-negative long columns
    into one sort key — multi-dimensional clustering for
    ``sortWithinPartitions``/write-time layout, so parquet row-group
    min/max stats prune on EVERY interleaved dimension, not just the
    first sort column (the scale form of the reference's ``cluster_by``,
    macros/materialization/incremental_partition_merge.sql:12,80, which
    BigQuery serves natively).

    Bit ``b`` of dimension ``d`` lands at position ``b*ndims + d``; with
    the default 21 bits × 3 dims the key fits in 63 bits (non-negative
    long). Values are masked to ``bits_per_dim`` bits — callers should
    pre-quantize (e.g. ``(col/step).cast("long")``) so the range fits.
    Pure shift/or Column algebra: whole-stage-codegen'd, no UDF.
    """
    ndims = len(cols)
    if not (1 <= ndims <= 3):
        raise ValueError("morton_key supports 1-3 dimensions")
    if bits_per_dim * ndims > 63:
        raise ValueError("bits_per_dim * ndims must be <= 63")
    key = F.lit(0).cast("long")
    for d, c in enumerate(cols):
        v = (_col(c).cast("long")).bitwiseAND(F.lit((1 << bits_per_dim) - 1))
        for b in range(bits_per_dim):
            bit = F.shiftright(v, b).bitwiseAND(F.lit(1).cast("long"))
            key = key.bitwiseOR(F.shiftleft(bit, b * ndims + d))
    return key
