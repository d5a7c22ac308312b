"""In-suite oracle parity: a fast subset of the queries()/oracle_sql()
contract compared against DuckDB at sf0.001, so plain pytest exercises the
same gate the driver and tools/check_parity.py run. The full set runs via
tools/check_parity.py (all SFs)."""

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

FAST_QUERIES = [
    "q1_pricing_summary",
    "watermark_top1",
    "ordered_string_agg",
    "uuid_v3_customer",
    "binary_codecs",
    "hex_roundtrip",  # extra-registry granular variant
    "dedup_exact_fingerprint",
    "dup_substring_spans",
    "text_quality_langid",
    "ann_topk_bruteforce",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def cell(v):
        if v is None:
            return "\x00"
        if isinstance(v, float):
            return "\x00nan" if math.isnan(v) else repr(v)
        return str(v)

    return sorted("\x01".join(cell(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", FAST_QUERIES)
def test_query_matches_oracle(spark, duck, name):
    from edna_dbt_library_spark import queries as qmod

    sdf = qmod.all_queries()[name](spark, SF)
    s_cols, s_rows = sdf.columns, [tuple(r) for r in sdf.collect()]
    res = duck.execute(qmod.all_oracle_sql()[name])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    assert sorted(s_cols) == sorted(d_cols)
    assert len(s_rows) == len(d_rows)
    assert _canon(s_cols, s_rows) == _canon(d_cols, d_rows)


def test_driver_contract_is_exactly_fifty_oracle_backed_queries():
    """The driver scores the first 50 queries() entries: the contract must
    expose exactly 50, every one oracle-backed (no rows-only gaps), and the
    extras must all still be registered for local verification."""
    from edna_dbt_library_spark import queries as qmod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) == 50
    assert set(oracles) == set(qs)  # no rows-only entries in the scored set
    assert list(qs) == qmod.CORE_ORDER
    extras = qmod.extra_queries()
    assert set(extras).isdisjoint(qs)
    assert len(extras) >= 20
