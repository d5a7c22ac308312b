#!/usr/bin/env python
"""Local stand-in for the driver's t2 correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet, compare row count + column names + order-insensitive values.

Usage:
    python tools/check_parity.py                 # all queries at sf0.01
    python tools/check_parity.py q1 dedup        # substring filter
    SPARK_GRAFT_PARITY_SF=/root/testdata/sf0.001 python tools/check_parity.py
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def canon_cell(v):
    """Type-faithful canonicalization: a DuckDB HUGEINT (Decimal via Arrow)
    must NOT equal a Spark BIGINT (int) even when the numeric values agree —
    the driver's gate hashes typed values, and r1's q12/pivot hash-fails
    were exactly this class being masked by a plain str()."""
    import decimal

    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):  # before int: bool is an int subclass
        return f"bool:{v}"
    if isinstance(v, int):
        return f"int:{v}"
    if isinstance(v, decimal.Decimal):
        return f"dec:{v}"
    if isinstance(v, float):
        if math.isnan(v):
            return "\x00NaN"
        # full-precision double repr: bit-identical doubles -> identical repr
        return f"float:{v!r}"
    return f"{type(v).__name__}:{v}"


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append("\x01".join(canon_cell(r[i]) for i in order))
    out.sort()
    return out


def main():
    filters = sys.argv[1:]
    from edna_dbt_library_spark import queries as qmod
    from edna_dbt_library_spark.session import get_spark

    # full registry: the driver-facing CORE_ORDER 50 plus the locally-
    # verified extras; CORE entries are checked first
    core = set(qmod.CORE_ORDER)
    qs = {**qmod.queries(), **qmod.extra_queries()}
    oracles = qmod.all_oracle_sql()
    names = [n for n in qs if not filters or any(f in n for f in filters)]

    spark = get_spark(app_name="parity", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"SKIP-ORACLE {name}: rows={len(s_rows)} ({time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            # Arrow fetch, not fetchall(): HUGEINT surfaces as Decimal here
            # (as the driver sees it) instead of a plain Python int.
            tbl = res.arrow()
            d_cols = list(tbl.schema.names)
            d_rows = [tuple(d[c] for c in d_cols) for d in tbl.to_pylist()]
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue

        ok = True
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
            ok = False
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: columns spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
            ok = False
        if ok:
            cs = canon_rows(s_cols, s_rows)
            cd = canon_rows(d_cols, d_rows)
            if cs != cd:
                ok = False
                diffs = [(a, b) for a, b in zip(cs, cd) if a != b][:3]
                print(f"FAIL {name}: value mismatch ({sum(1 for a, b in zip(cs, cd) if a != b)} rows)")
                for a, b in diffs:
                    print(f"    spark : {a[:220]}")
                    print(f"    duckdb: {b[:220]}")
        tag = "" if name in core else " [extra]"
        if ok:
            print(f"OK   {name}{tag}: rows={len(s_rows)} ({time.time()-t0:.1f}s)")
        else:
            failures.append(name)

    print()
    if failures:
        print(f"{len(failures)}/{len(names)} FAILED: {failures}")
        sys.exit(1)
    print(f"all {len(names)} queries match")


if __name__ == "__main__":
    main()
