#!/usr/bin/env python
"""Zone-map sidecar scale stress at ~100k files (r7 verdict item #5).

What must hold for a million-file table at 100 TB:
- initial build parallelizes (footer reads fan out over executors, the
  driver collects only tiny stat tuples), not a sequential driver loop;
- an incremental refresh after a small append costs O(delta), flat in
  the table's file count;
- per-read metadata cost is FLAT in steady state: the first prune after
  a refresh parses the shard set once, every subsequent prune hits the
  mtime-fingerprinted cache (O(#shards) stat calls, no re-parse).

Shape here: a table dir is grown to ~100k real parquet files (tiny,
pyarrow-written in a thread pool — the stats harvest only touches
footers, so file size is irrelevant to what is being measured), then
build / incremental-refresh / repeated-prune walls are measured.

Run: python tools/zonemap_scale_stress.py [n_files]   (prints a
markdown table; measured numbers are recorded in tools/plan_audit.py
STRESS_SECTION.)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS_PER_FILE = 20


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from edna_dbt_library_spark.session import get_spark
    from edna_dbt_library_spark.sources import TableMeta, Warehouse

    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark(app_name="zm-stress", master="local[32]", shuffle_partitions=32)
    tmp = tempfile.mkdtemp(prefix="zm_stress_")
    try:
        wh = Warehouse(spark, tmp)
        rel = wh.relation("s", "big")
        wh.create_as(
            rel,
            spark.range(ROWS_PER_FILE).select(F.col("id").alias("k")).coalesce(1),
            TableMeta(),
        )
        base = wh.path(rel)

        def gen(i: int) -> None:
            lo = (i + 1) * 1000
            t = pa.table({"k": pa.array(range(lo, lo + ROWS_PER_FILE), pa.int64())})
            pq.write_table(t, os.path.join(base, f"part-gen-{i:06d}.parquet"))

        t0 = time.time()
        with ThreadPoolExecutor(max_workers=32) as ex:
            list(ex.map(gen, range(n_files - 1), chunksize=256))
        gen_s = time.time() - t0
        print(f"generated {n_files} files in {gen_s:.1f}s", flush=True)

        t0 = time.time()
        rep = wh.refresh_zone_maps(rel, ["k"])
        build_s = time.time() - t0
        assert rep["added"] == rep["files_total"] >= n_files, rep

        # incremental refresh: +100 files must cost O(delta)
        for i in range(100):
            gen(n_files + i)
        t0 = time.time()
        rep2 = wh.refresh_zone_maps(rel, ["k"])
        incr_s = time.time() - t0
        assert rep2["added"] == 100 and rep2["dropped"] == 0, rep2

        # per-read metadata cost: cold (parse shards once) then warm
        lo = (n_files // 2) * 1000
        hi = lo + 5_000
        t0 = time.time()
        kept, total = wh.prune_files(rel, "k", lo, hi)
        cold_s = time.time() - t0
        warms = []
        for _ in range(20):
            t0 = time.time()
            kept_w, _tot = wh.prune_files(rel, "k", lo, hi)
            warms.append(time.time() - t0)
        warm_ms = 1000 * sorted(warms)[len(warms) // 2]
        assert kept_w == kept

        shard_files = [
            f for f in os.listdir(wh._zonemap_dir(rel)) if f.endswith(".parquet")
        ]
        sidecar_bytes = sum(
            os.path.getsize(os.path.join(wh._zonemap_dir(rel), f)) for f in shard_files
        )
        print()
        print("| metric | value |")
        print("|---|---|")
        print(f"| files | {total:,} |")
        print(f"| initial build (distributed footer harvest) | {build_s:.1f}s |")
        print(f"| incremental refresh (+100 files) | {incr_s:.2f}s |")
        print(f"| first prune after refresh (shard parse) | {cold_s:.2f}s |")
        print(f"| steady-state prune (cached index) | {warm_ms:.1f}ms |")
        print(f"| files kept for a 5k-key range | {len(kept)} / {total:,} |")
        print(f"| sidecar size | {sidecar_bytes/1024:.0f} KiB in {len(shard_files)} shards |")
        print(flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
