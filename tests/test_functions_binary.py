"""Unit tests for the §2D scalar Column builders, checked against
independently computed Python ground truth (struct/int arithmetic), not
against the reference's SQL."""

import math
import struct

import pytest
from pyspark.sql import functions as F

from edna_dbt_library_spark.functions import (
    base64_map,
    bitstring_to_int,
    bytes4_to_int32,
    digit_to_bitstring,
    double_from_components,
    double_mantissa,
    double_unbiased_exponent,
    hex_map,
    hex_to_int,
    reverse_hex_bytes,
    value_to_bitstring,
)


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


@pytest.mark.parametrize(
    "hexval,expected",
    [
        ("00000000", 0),
        ("0000002a", 42),
        ("7fffffff", 2**31 - 1),
        ("80000000", -(2**31)),
        ("ffffffff", -1),
        ("fffffffe", -2),
    ],
)
def test_bytes4_to_int32(spark, hexval, expected):
    assert one(spark, bytes4_to_int32(F.unhex(F.lit(hexval)))) == expected


def test_base64_map(spark):
    assert one(spark, base64_map(F.lit("AZaz09+/"), 1)) == 0
    assert one(spark, base64_map(F.lit("AZaz09+/"), 2)) == 25
    assert one(spark, base64_map(F.lit("AZaz09+/"), 3)) == 26
    assert one(spark, base64_map(F.lit("AZaz09+/"), 8)) == 63
    assert one(spark, base64_map(F.lit("AZaz09+/"), 0, zero_based=True)) == 0
    # past end of string -> NULL; char not in alphabet -> NULL
    assert one(spark, base64_map(F.lit("AB"), 5)) is None
    assert one(spark, base64_map(F.lit("!"), 1)) is None


def test_hex_map(spark):
    assert one(spark, hex_map(F.lit("0fA"), 1)) == 0
    assert one(spark, hex_map(F.lit("0fA"), 2)) == 15
    assert one(spark, hex_map(F.lit("0fA"), 3)) == 10  # case-insensitive
    assert one(spark, hex_map(F.lit("0f"), 9)) is None
    assert one(spark, hex_map(F.lit("0fA"), 2, zero_based=True)) == 10


def test_reverse_hex_bytes(spark):
    assert one(spark, reverse_hex_bytes(F.lit("0a1b2c"))) == "2c1b0a"
    assert one(spark, reverse_hex_bytes(F.lit("0x0a1b2c"))) == "2c1b0a"
    assert one(spark, reverse_hex_bytes(F.lit("0a1b2c"), add_0x=True)) == "0x2c1b0a"
    # odd trailing nibble dropped (regexp r'..' pairs)
    assert one(spark, reverse_hex_bytes(F.lit("0a1b2"))) == "1b0a"


@pytest.mark.parametrize(
    "s,expected",
    [
        ("ff", 255),
        ("0xff", 255),
        ("0XFF", 255),
        ("7fffffffffffffff", 2**63 - 1),
        ("8000000000000000", None),  # signed-64 overflow -> NULL (SAFE_CAST)
        ("ffffffffffffffff", None),
        ("10000000000000000", None),  # >16 digits -> NULL
        ("zz", None),
        ("", None),
    ],
)
def test_hex_to_int(spark, s, expected):
    assert one(spark, hex_to_int(F.lit(s))) == expected


def test_value_to_bitstring(spark):
    assert one(spark, value_to_bitstring(F.lit(5), 3)) == "101"
    assert one(spark, value_to_bitstring(F.lit(5), 8)) == "00000101"
    # low-width truncation keeps the LOW bits (value >> i & 1 semantics)
    assert one(spark, value_to_bitstring(F.lit(5), 2)) == "01"
    assert one(spark, value_to_bitstring(F.lit(0), 4)) == "0000"
    assert one(spark, value_to_bitstring(F.lit(-1), 8)) == "11111111"


def test_digit_to_bitstring(spark):
    assert one(spark, digit_to_bitstring(F.lit(9), 16)) == "1001"
    assert one(spark, digit_to_bitstring(F.lit(7), 8)) == "111"
    # out-of-range digit keeps low bits, like the reference's >> & loop
    assert one(spark, digit_to_bitstring(F.lit(9), 8)) == "001"


@pytest.mark.parametrize(
    "s,expected",
    [
        ("101", 5),
        ("0", 0),
        ("1", 1),
        ("0000000000000001", 1),
        ("1" + "0" * 62, 2**62),
        ("102", 6),  # digit chars cast to their value (SAFE_CAST semantics)
        ("a1", 1),  # non-digit contributes 0 (SAFE_CAST -> NULL -> skipped)
        ("abc", None),  # no digits at all -> NULL (SUM over zero rows)
        ("", None),
    ],
)
def test_bitstring_to_int(spark, s, expected):
    assert one(spark, bitstring_to_int(F.lit(s))) == expected


def _bits_of(x: float) -> tuple[int, str, str]:
    raw = struct.unpack(">Q", struct.pack(">d", x))[0]
    sign = raw >> 63
    exp = format((raw >> 52) & 0x7FF, "011b")
    frac = format(raw & ((1 << 52) - 1), "052b")
    return sign, exp, frac


def _round5_half_up(x: float) -> float:
    # Spark's round() on doubles is BigDecimal HALF_UP over the exact binary
    # value (same as BigQuery ROUND half-away-from-zero); Python's round()
    # is banker's, so ground truth uses Decimal explicitly.
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(x).quantize(Decimal("0.00001"), rounding=ROUND_HALF_UP)
    return float(q)


@pytest.mark.parametrize("x", [1.0, -1.0, 2.5, -123.456, 0.015625, 1e5, 3.14159, 745.28])
def test_ieee754_roundtrip(spark, x):
    sign, exp, frac = _bits_of(x)
    col = double_from_components(
        F.lit(sign),
        double_mantissa(F.lit(frac)),
        double_unbiased_exponent(F.lit(exp)),
    )
    assert one(spark, col) == _round5_half_up(x)


def test_double_unbiased_exponent(spark):
    assert one(spark, double_unbiased_exponent(F.lit("01111111111"))) == 0
    assert one(spark, double_unbiased_exponent(F.lit("10000000000"))) == 1
    assert one(spark, double_unbiased_exponent(F.lit("00000000000"))) == -1023


def test_double_mantissa_short_strings_zero_extend(spark):
    assert one(spark, double_mantissa(F.lit("1"))) == 1.5
    assert one(spark, double_mantissa(F.lit("01"))) == 1.25
    assert one(spark, double_mantissa(F.lit(""))) == 1.0


def _py_morton(vals, bits):
    key = 0
    for d, v in enumerate(vals):
        v &= (1 << bits) - 1
        for b in range(bits):
            key |= ((v >> b) & 1) << (b * len(vals) + d)
    return key


def test_morton_key_matches_reference_bit_for_bit(spark):
    from edna_dbt_library_spark.functions.binary import morton_key

    df = spark.range(300).select(
        (F.col("id") * 7919 % 2048).alias("x"),
        (F.col("id") * 104729 % 2048).alias("y"),
        (F.col("id") * 1299709 % 2048).alias("z"),
    )
    rows = df.select("x", "y", "z", morton_key(["x", "y", "z"], 11).alias("m")).collect()
    assert all(r["m"] == _py_morton([r["x"], r["y"], r["z"]], 11) for r in rows)
    assert all(r["m"] >= 0 for r in rows)  # fits signed long


def test_morton_key_validation(spark):
    from edna_dbt_library_spark.functions.binary import morton_key

    with pytest.raises(ValueError):
        morton_key([])
    with pytest.raises(ValueError):
        morton_key(["a", "b"], bits_per_dim=32)  # 64 bits > 63


def test_morton_layout_prunes_row_groups_on_second_dimension(spark, tmp_path):
    """The point of Z-ordering: after sorting by the interleaved key, a
    selective predicate on the SECOND dimension skips most row groups via
    parquet min/max stats — with a plain x-sort it skips none."""
    import pyarrow.parquet as pq

    from edna_dbt_library_spark.functions.binary import morton_key

    n = 1 << 14
    df = spark.range(n).select(
        (F.col("id") * 7919 % 1024).alias("x"),
        F.pmod(F.xxhash64("id"), F.lit(1024)).alias("y"),  # independent of x
    )

    def overlap_fraction(order_cols):
        path = str(tmp_path / ("z" if len(order_cols) > 1 else "plain"))
        (
            df.orderBy(*order_cols)
            .coalesce(1)
            .write.option("parquet.block.size", 64 * 1024)
            .mode("overwrite")
            .parquet(path)
        )
        import glob

        f = pq.ParquetFile(glob.glob(f"{path}/*.parquet")[0])
        y_idx = f.schema_arrow.names.index("y")
        hit = total = 0
        for g in range(f.metadata.num_row_groups):
            rg = f.metadata.row_group(g)
            st = rg.column(y_idx).statistics
            total += rg.num_rows  # row-weighted: tiny tail groups don't skew
            if st.min <= 64 and st.max >= 0:  # query box: y in [0, 64]
                hit += rg.num_rows
        return hit / total, f.metadata.num_row_groups

    z_frac, z_groups = overlap_fraction([morton_key(["x", "y"], 10)])
    x_frac, x_groups = overlap_fraction(["x"])
    assert z_groups > 4 and x_groups > 4  # enough row groups to mean anything
    assert x_frac >= 0.9  # x-sorted: nearly every row group spans all of y
    assert z_frac <= x_frac / 2  # z-ordered: most row groups exclude the y-box
