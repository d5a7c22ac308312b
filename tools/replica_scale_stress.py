#!/usr/bin/env python
"""Replica-sync scale stress (operators/materializations.run_replica_sync):
on a multi-million-row day-partitioned source, measure the full baseline
copy once, then a delta sync shipping only a sparse DML window
(delete + update + append) — the claim under test is that a sync costs
O(changed rows + key probe), not a replica rebuild.

Redirect stdout to a file; a RESULT block at the end is paste-ready for
PLAN_AUDIT.md.
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from edna_dbt_library_spark.operators.materializations import run_replica_sync
from edna_dbt_library_spark.session import get_spark
from edna_dbt_library_spark.sources.warehouse import TableMeta, Warehouse

ROWS = int(os.environ.get("REPSTRESS_ROWS", 8_000_000))
DAYS = 64
TASKS = 64


def main():
    spark = get_spark(app_name="replica-stress")
    root = tempfile.mkdtemp(prefix="edna_repstress_")
    try:
        wh = Warehouse(spark, root)
        src = wh.relation("stress", "src")
        rep = wh.relation("stress", "mirror")
        df = (
            spark.range(ROWS)
            .withColumn(
                "d",
                F.date_format(
                    F.date_add(F.lit("2024-01-01"), (F.col("id") % DAYS).cast("int")),
                    "yyyy-MM-dd",
                ),
            )
            .withColumn("v", (F.col("id") * 2654435761) % 1000000007)
            .repartition(TASKS)
        )
        wh.create_as(src, df, TableMeta(partition_by="d"))
        print(f"\nBUILT rows={ROWS} files={len(wh._live_data_files(src))}", flush=True)

        t0 = time.time()
        r1 = run_replica_sync(wh, src, rep, keys=["id"])
        t_full = time.time() - t0
        print(f"\nFULL mode={r1['mode']} rows={r1['n_inserted']} wall={t_full:.2f}s", flush=True)

        # sparse DML window: ~0.1% delete, ~0.1% update, 100k append
        wh.delete_where(src, "v % 1000 < 1")
        wh.update_where(src, "v % 1000 = 1", {"v": F.col("v") + 1})
        extra = (
            spark.range(ROWS, ROWS + 100_000)
            .withColumn("d", F.lit("2024-03-01"))
            .withColumn("v", F.col("id") % 1000000007)
            .coalesce(4)
        )
        wh.append(src, extra)
        t0 = time.time()
        r2 = run_replica_sync(wh, src, rep, keys=["id"])
        t_delta = time.time() - t0
        n_src = wh.read(src).count()
        n_rep = wh.read(rep).count()
        print(
            f"\nDELTA mode={r2['mode']} ins={r2['n_inserted']} delk={r2['n_deleted_keys']} wall={t_delta:.2f}s src={n_src} rep={n_rep}",
            flush=True,
        )
        assert r2["mode"] == "delta" and n_src == n_rep, (r2, n_src, n_rep)

        # localized window: all DML inside ONE day — the common
        # incremental shape (late data, corrections for a date range)
        wh.delete_where(src, "d = '2024-01-08' and v % 2 = 0")
        wh.update_where(src, "d = '2024-01-09' and v % 10 = 1", {"v": F.col("v") + 1})
        t0 = time.time()
        r3 = run_replica_sync(wh, src, rep, keys=["id"])
        t_local = time.time() - t0
        n_src2, n_rep2 = wh.read(src).count(), wh.read(rep).count()
        assert n_src2 == n_rep2, (n_src2, n_rep2)
        print(
            f"\nLOCAL ins={r3['n_inserted']} delk={r3['n_deleted_keys']} wall={t_local:.2f}s src={n_src2}",
            flush=True,
        )

        # sparse-key window vs a bloom-indexed replica: the probed keys
        # live in a handful of replica files (the freshly appended
        # id-range), so delete_matching's distributed set-probe
        # (Warehouse.bloom_candidate_files) opens only those candidate
        # files instead of scanning every replica file's key column —
        # the O(delta + candidate files) claim under test
        # m is PER-FILE bits; a SET probe needs per-(key,file) fpp well
        # under 1/(|probe| * n_files) or false candidates erase the
        # prune (measured: 1<<16 at ~2.4k rows/file -> fpp 3e-5 -> 535
        # false-candidate files for a 2k-key probe; 1<<18 -> ~4e-9 ->
        # exact). Oversizing instead (1<<23) blew the sidecar to 56M
        # rows and the index build to 60s.
        t0 = time.time()
        wh.refresh_bloom_sidecar(rep, ["id"], m_bits=1 << 18, k=7)
        t_idx = time.time() - t0
        n_files = len(wh._live_data_files(rep))
        lo = ROWS + 50_000
        wh.delete_where(src, f"id >= {lo} and id < {lo + 2000}")
        probe = spark.range(lo, lo + 2000).select("id")
        cand = wh.bloom_candidate_files(rep, "id", probe)
        assert cand is not None and len(cand) < n_files, (len(cand or []), n_files)
        t0 = time.time()
        r5 = run_replica_sync(wh, src, rep, keys=["id"])
        t_bloom = time.time() - t0
        assert wh.read(src).count() == wh.read(rep).count()
        print(
            f"\nSPARSE+BLOOM idx={t_idx:.2f}s cand={len(cand)}/{n_files} files "
            f"delk={r5['n_deleted_keys']} wall={t_bloom:.2f}s",
            flush=True,
        )

        # control: identical window shape with the sidecar disabled ->
        # full key-column scan of every replica file
        meta_stash = wh._bloom_meta_path(rep) + ".off"
        os.rename(wh._bloom_meta_path(rep), meta_stash)
        lo2 = ROWS + 60_000
        wh.delete_where(src, f"id >= {lo2} and id < {lo2 + 2000}")
        t0 = time.time()
        r6 = run_replica_sync(wh, src, rep, keys=["id"])
        t_noidx = time.time() - t0
        os.rename(meta_stash, wh._bloom_meta_path(rep))
        assert wh.read(src).count() == wh.read(rep).count()
        print(
            f"\nSPARSE-NOIDX delk={r6['n_deleted_keys']} wall={t_noidx:.2f}s",
            flush=True,
        )

        # streaming twin: full drain baseline, then a DML window drained
        # as a delta — replica must equal the source both times
        from edna_dbt_library_spark.streaming.incremental_stream import (
            stream_replica_sync,
        )

        srep = wh.relation("stress", "smirror")
        scp = os.path.join(root, "stream_cp")
        t0 = time.time()
        stream_replica_sync(wh, src, srep, ["id"], scp).awaitTermination()
        t_sfull = time.time() - t0
        n_s = wh.read(srep).count()
        assert n_s == wh.read(src).count(), (n_s,)
        wh.delete_where(src, f"id >= {ROWS + 70_000} and id < {ROWS + 72_000}")
        wh.update_where(src, "v % 100000 = 17", {"v": F.col("v") + 1})
        t0 = time.time()
        stream_replica_sync(wh, src, srep, ["id"], scp).awaitTermination()
        t_sdelta = time.time() - t0
        n_s2, n_src3 = wh.read(srep).count(), wh.read(src).count()
        assert n_s2 == n_src3, (n_s2, n_src3)
        print(
            f"\nSTREAM full={t_sfull:.2f}s delta={t_sdelta:.2f}s rows={n_s2}",
            flush=True,
        )

        print("\nRESULT", flush=True)
        print("| source rows | full sync s | window | delta sync s | rows written |", flush=True)
        print(
            f"| {ROWS:,} | {t_full:.2f} (writes {ROWS / 1e6:.0f}M rows) | uniform-sparse: {r2['n_deleted_keys']:,} keys / {r2['n_inserted']:,} ins | {t_delta:.2f} | {r2['n_inserted'] / 1e3:.0f}k |",
            flush=True,
        )
        print(
            f"| | | one-day local: {r3['n_deleted_keys']:,} keys / {r3['n_inserted']:,} ins | {t_local:.2f} | {r3['n_inserted'] / 1e3:.0f}k |",
            flush=True,
        )
        print(
            f"| | | sparse-key, bloom-pruned ({len(cand)}/{n_files} files opened): {r5['n_deleted_keys']:,} keys | {t_bloom:.2f} (index build {t_idx:.2f}) | 0 |",
            flush=True,
        )
        print(
            f"| | | sparse-key, no index (full key-column scan): {r6['n_deleted_keys']:,} keys | {t_noidx:.2f} | 0 |",
            flush=True,
        )
        print(
            f"| | | streaming twin: full drain {t_sfull:.2f} | delta drain {t_sdelta:.2f} | |",
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
