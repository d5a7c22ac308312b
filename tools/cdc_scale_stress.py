#!/usr/bin/env python
"""CDC scale stress: read_changes must cost O(delta files), not
O(table files).

Shape: a day-partitioned table grows by repeated appends (the
incremental-warehouse file pattern); a downstream consumer refreshes
off the snapshot CDC feed. At 100 TB the table holds millions of files
— the delta read is only useful if its cost tracks the DELTA's file
count while the table grows without bound. This harness grows the same
table ~10x between measurements and re-measures an identical one-batch
delta at each scale; the wall and files-scanned for the delta should
stay flat while the full-table scan grows with the table.

Run: python tools/cdc_scale_stress.py   (prints a markdown table; the
measured numbers are recorded in tools/plan_audit.py STRESS_SECTION.)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DAYS = 64
ROWS_PER_APPEND = 100_000


def main() -> None:
    from pyspark.sql import functions as F

    from edna_dbt_library_spark.session import get_spark
    from edna_dbt_library_spark.sources import TableMeta, Warehouse

    spark = get_spark(app_name="cdc-stress", master="local[32]", shuffle_partitions=32)
    tmp = tempfile.mkdtemp(prefix="cdc_stress_")
    wh = Warehouse(spark, tmp)
    rel = wh.relation("s", "grown")

    def batch(seed: int):
        return spark.range(ROWS_PER_APPEND).select(
            (F.col("id") + seed * ROWS_PER_APPEND).alias("k"),
            F.date_format(
                F.date_add(F.lit("2024-01-01"), (F.col("id") % DAYS).cast("int")),
                "yyyy-MM-dd",
            ).alias("_pdate"),
            (F.col("id") % 997).alias("v"),
        )

    def n_files() -> int:
        return len(wh._live_data_files(rel))

    def timed(df):
        t0 = time.time()
        n = df.count()
        return n, time.time() - t0, len(df.inputFiles())

    wh.create_as(rel, batch(0), TableMeta(partition_by="_pdate"))
    print(
        "| table files | full-read s | delta rows | delta files | delta-read s "
        "| manifest KiB | chain KiB | chain ms |"
    )
    print("|---|---|---|---|---|---|---|---|")
    seed = 1
    rows = []
    for target_appends in (4, 40):  # ~10x file growth between measurements
        while seed < target_appends:
            wh.append(rel, batch(seed))
            seed += 1
        v = wh.snapshot(rel, note=f"stress-{target_appends}")
        wh.append(rel, batch(seed))
        seed += 1
        v2 = wh.snapshot(rel, note=f"stress-{target_appends}-head")
        tf = n_files()
        _, full_s, _ = timed(wh.read(rel))
        dn, delta_s, dfl = timed(wh.read_changes(rel, v, v2))
        # metadata cost: monolithic manifest bytes vs the delta.json
        # chain actually parsed by the pinned read, and the chain walk's
        # wall time (pure metadata, no data scan)
        sdir = wh._snapshots_dir(rel)
        man_b = os.path.getsize(os.path.join(sdir, f"v{v2}", "manifest.json"))
        chain_b = os.path.getsize(os.path.join(sdir, f"v{v2}", "delta.json"))
        t0 = time.time()
        chain = wh._delta_chain(rel, v, v2)
        chain_ms = (time.time() - t0) * 1000
        assert chain is not None and len(chain) == dfl
        rows.append((tf, full_s, dn, dfl, delta_s, man_b, chain_b, chain_ms))
        print(
            f"| {tf} | {full_s:.2f} | {dn} | {dfl} | {delta_s:.2f} "
            f"| {man_b / 1024:.1f} | {chain_b / 1024:.1f} | {chain_ms:.1f} |"
        )
    shutil.rmtree(tmp, ignore_errors=True)
    small, big = rows
    print(
        f"\ntable grew {big[0] / small[0]:.1f}x in files; "
        f"full read {big[1] / small[1]:.1f}x; "
        f"delta read {big[4] / small[4]:.1f}x "
        f"({small[3]} -> {big[3]} files scanned); "
        f"monolithic manifest {small[5] / 1024:.1f} -> {big[5] / 1024:.1f} KiB "
        f"({big[5] / small[5]:.1f}x) vs chain parse {small[6] / 1024:.1f} -> "
        f"{big[6] / 1024:.1f} KiB ({big[6] / max(small[6], 1):.1f}x)"
    )


if __name__ == "__main__":
    main()
