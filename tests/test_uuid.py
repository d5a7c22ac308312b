"""UUIDv5/v3 parity against Python's RFC-4122 implementation — the ground
truth the reference's BigQuery macro (macros/utils/uuid_generation.sql)
also has to match."""

import uuid

import pytest
from pyspark.sql import functions as F

from edna_dbt_library_spark.functions import uuid_v3, uuid_v5

NS = "3bfbbd36-410b-43fa-999a-bb990a6db5c7"
NAMES = ["", "a", "hello world", "exportDataId-42", "æøå unicode ✓", "0123456789" * 10]


@pytest.mark.parametrize("name", NAMES)
def test_uuid_v5_matches_python(spark, name):
    got = spark.range(1).select(uuid_v5(F.lit(name), NS).alias("u")).collect()[0]["u"]
    assert got == str(uuid.uuid5(uuid.UUID(NS), name))


@pytest.mark.parametrize("name", NAMES)
def test_uuid_v3_matches_python(spark, name):
    got = spark.range(1).select(uuid_v3(F.lit(name), NS).alias("u")).collect()[0]["u"]
    assert got == str(uuid.uuid3(uuid.UUID(NS), name))


def test_uuid_v5_dns_namespace(spark):
    got = (
        spark.range(1)
        .select(uuid_v5(F.lit("www.example.com"), str(uuid.NAMESPACE_DNS)).alias("u"))
        .collect()[0]["u"]
    )
    assert got == str(uuid.uuid5(uuid.NAMESPACE_DNS, "www.example.com"))


def test_uuid_v5_deterministic_over_table(spark, sf_dir):
    from edna_dbt_library_spark.sources import load_table

    df = load_table(spark, sf_dir, "customer").limit(50)
    rows = df.select("c_name", uuid_v5("c_name", NS).alias("u")).collect()
    for r in rows:
        assert r["u"] == str(uuid.uuid5(uuid.UUID(NS), r["c_name"]))


def test_bad_namespace_raises():
    with pytest.raises(ValueError):
        uuid_v5(F.lit("x"), "not-a-uuid")
