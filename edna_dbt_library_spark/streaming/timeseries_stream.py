"""Streaming continuous aggregate: maintain a time-bucketed partials
store over an event stream (the streaming twin of
operators/timeseries.resample_sum — TimescaleDB's continuous
aggregate, Flink's windowed rollup, run as micro-batches).

Aggregate partials merge by SUM, so a replayed micro-batch would
double-count — the store therefore uses the per-batch idempotent-sink
idiom (streaming/sketch_stream.stream_cms_counts): each micro-batch's
own resample (bounded by the batch's keys × occupied buckets, never
by event volume) lands in its own ``batch=<id>`` subdirectory with
overwrite, so foreachBatch's at-least-once redelivery just rewrites
the same subdir. Serving folds the subdirs by (keys, bucket) sum; the
hour→day ladder then derives from the folded partials
(operators/timeseries.rollup_buckets) — coarse grains never touch raw
events.

Compaction uses the MASKED-MERGE idiom from the r10 LSM index work
(operators/similarity.compact_ivfpq_index): ``compact`` folds every
segment into one ``merged-upto-<N>`` directory where N is the highest
batch id folded, and the READ PATH ignores ``batch=<id>`` dirs with
id <= N whenever a merged segment exists — so a crash between writing
the merged segment and deleting the folded dirs leaves a store whose
read is still exact (the stale dirs are masked, not double-counted),
and re-running compact converges. Not concurrent-safe with an active
stream writing new batches <= N (new batches always get higher ids
from the checkpoint, so in practice only a replay of an UNCOMMITTED
batch races; its id is the max id, which compact excludes — see
``keep_open_batches``).

Scale shape: each trigger ships only unseen source files; the shuffle
carries one row per (key, occupied bucket) of the batch; serving
scans segments × partial rows, bounded by compaction cadence — the
same maintenance-window bound as the index delta segments.
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from edna_dbt_library_spark.operators.timeseries import HOUR_US, resample_sum, rollup_buckets

_BATCH_RE = re.compile(r"^batch=(\d+)$")
_MERGED_RE = re.compile(r"^merged-upto-(\d+)$")


def stream_continuous_aggregate(
    stream_df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    units_col: str,
    store_path: str,
    checkpoint_path: str,
    bucket_us: int = HOUR_US,
    available_now: bool = True,
):
    """Maintain (keys, bucket) -> (v=sum(units), n=count) partials over
    a stream. ``units_col`` must already be exact integer units (cents
    / milli-units) — the caller quantizes, exactly like the batch
    operator. Returns the started StreamingQuery."""
    keys = list(keys)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        _, upto = _segments(store_path)
        if batch_id <= upto:
            # a fresh checkpoint restarts batch ids at 0; on a
            # compacted store those ids sit BELOW the merged-upto mask
            # and the read path would silently swallow the new batches
            # — data loss with no symptom. Resume with the original
            # checkpoint (ids continue past the mask) or start a new
            # store path.
            raise ValueError(
                f"continuous aggregate at {store_path}: batch id "
                f"{batch_id} is at-or-below the compacted mask "
                f"(merged-upto-{upto}) — this stream's checkpoint "
                "restarted after a compaction; reuse the original "
                "checkpoint or a fresh store path"
            )
        part = resample_sum(batch_df, keys, ts_col, units_col, bucket_us)
        # write with the resample's natural partitioning — a
        # high-key-cardinality trigger (10^7 sensors x 24 buckets) must
        # not funnel through one task (verdict r10 #3); the
        # masked-merge compaction folds small files anyway. AQE already
        # coalesces the post-shuffle partials to few tasks for small
        # batches, so the common case still lands 1-2 files.
        part.write.mode("overwrite").parquet(f"{store_path}/batch={batch_id}")

    writer = stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _segments(store_path: str) -> tuple[list[str], int]:
    """(live segment dir names, masked-through id): every merged
    segment plus the batch dirs NOT masked by the newest merged
    segment. Multiple merged segments can coexist after a crashed
    compaction chain — a newer one folded the older, so only the
    newest counts and older merged dirs are masked too."""
    try:
        names = os.listdir(store_path)
    except FileNotFoundError:
        return [], -1
    merged = []
    batches = []
    for nm in names:
        m = _MERGED_RE.match(nm)
        if m:
            merged.append((int(m.group(1)), nm))
        else:
            b = _BATCH_RE.match(nm)
            if b:
                batches.append((int(b.group(1)), nm))
    upto = max((n for n, _ in merged), default=-1)
    live = [nm for n, nm in merged if n == upto]
    live += [nm for n, nm in batches if n > upto]
    return sorted(live), upto


def read_continuous_aggregate(
    spark: SparkSession,
    store_path: str,
    keys: Sequence[str],
    grain_factor: int = 1,
) -> DataFrame:
    """Current folded aggregate: (keys, bucket, v, n) summed across the
    live segments (merged segment + unmasked batch dirs). With
    ``grain_factor`` > 1 the fine partials re-aggregate to a coarser
    grain (24 = hour→day) without touching raw events."""
    keys = list(keys)
    live, _ = _segments(store_path)
    if not live:
        raise FileNotFoundError(f"no continuous-aggregate segments under {store_path}")
    df = (
        spark.read.parquet(*[os.path.join(store_path, nm) for nm in live])
        .groupBy(*keys, "bucket")
        .agg(F.sum("v").cast("long").alias("v"), F.sum("n").cast("long").alias("n"))
    )
    if grain_factor > 1:
        df = rollup_buckets(df, keys, grain_factor)
    return df


def compact_continuous_aggregate(
    spark: SparkSession,
    store_path: str,
    keys: Sequence[str],
    keep_open_batches: int = 1,
) -> int:
    """Fold the live segments into one ``merged-upto-<N>`` segment and
    drop the folded dirs; returns N (or the current masked-through id
    when there was nothing new to fold). The newest
    ``keep_open_batches`` batch dirs are left unfolded: an
    at-least-once redelivery can only replay a batch whose commit is
    not yet checkpointed — the tail — and a replay REWRITES its
    ``batch=<id>`` subdir, which must therefore not also be inside the
    merged segment. Crash-safe by masking: the merged segment is
    written BEFORE the folded dirs are removed, and the read path
    ignores every segment at-or-below the newest merged id, so a crash
    anywhere leaves reads exact and a re-run converges."""
    keys = list(keys)
    live, upto = _segments(store_path)
    merged_dirs = [nm for nm in live if _MERGED_RE.match(nm)]
    batches = sorted(
        (int(_BATCH_RE.match(nm).group(1)), nm)
        for nm in live
        if _BATCH_RE.match(nm)
    )
    foldable = batches[: max(0, len(batches) - keep_open_batches)]
    if not foldable:
        return upto  # nothing below the kept tail
    fold = merged_dirs + [nm for _, nm in foldable]
    new_upto = foldable[-1][0]  # > upto: live batch ids all exceed it
    folded = (
        spark.read.parquet(*[os.path.join(store_path, nm) for nm in fold])
        .groupBy(*keys, "bucket")
        .agg(F.sum("v").cast("long").alias("v"), F.sum("n").cast("long").alias("n"))
        .localCheckpoint(eager=True)  # pin before any dir mutation
    )
    # natural (AQE-coalesced) partitioning, same rationale as
    # write_batch: the merged segment holds the whole store's
    # (keys x buckets) state and must not funnel through one task
    folded.write.mode("overwrite").parquet(
        os.path.join(store_path, f"merged-upto-{new_upto}")
    )
    # visibility flip done — stale dirs are masked; removal is cleanup
    for nm in fold:
        shutil.rmtree(os.path.join(store_path, nm), ignore_errors=True)
    return new_upto
