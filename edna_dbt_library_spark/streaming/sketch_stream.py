"""Streaming sketch maintenance: continuous approximate distinct-count.

HLL registers are a plain ``max`` aggregation, so the streaming form
needs no custom state store: each micro-batch computes its own register
table (bounded at groups × 256 rows *whatever the batch size*) and
``foreachBatch`` folds it into a persistent register store by cell-wise
max — the same merge the batch operator exposes (operators/sketches.
hll_merge), which is what makes the streamed estimate EXACTLY equal the
batch estimate over the union of all micro-batches (asserted in
tests/test_sketches.py). Estimates are served by reading the store, so
queries never touch the stream.

The store rewrite collects the merged registers to the driver first —
deliberately: the register table is the sketch's bounded state (≤ 256
small ints per group at any input scale), and materializing it breaks
the read-then-overwrite cycle on the store path. This is the streaming
analogue of the reference's run-window bookkeeping: tiny driver-side
state per run, heavy data only ever scanned once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.utils import AnalysisException

from edna_dbt_library_spark.operators.sketches import hll_estimate, hll_merge, hll_registers


def _store_schema(group_fields: list[T.StructField]) -> T.StructType:
    return T.StructType(
        [*group_fields, T.StructField("hll_idx", T.LongType()), T.StructField("hll_rho", T.IntegerType())]
    )


def stream_hll_distinct(
    stream_df: DataFrame,
    key: str,
    group_cols: list[str],
    store_path: str,
    checkpoint_path: str,
    available_now: bool = True,
):
    """Maintain a per-group HLL register store over a stream.

    Returns the started StreamingQuery (``awaitTermination()`` to drain
    with ``available_now``). Replayed micro-batches are harmless: merging
    the same registers twice is idempotent (max), so the store is correct
    under foreachBatch's at-least-once semantics."""
    group_fields = [stream_df.schema[c] for c in group_cols]

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        regs = hll_registers(batch_df, key, group_cols)
        try:
            existing = spark.read.parquet(store_path)
            regs = hll_merge(existing.unionByName(regs), group_cols)
        except AnalysisException:
            pass  # first batch: no store yet
        rows = regs.collect()  # bounded: <= groups * 256 cells
        spark.createDataFrame(rows, _store_schema(group_fields)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(store_path)

    writer = stream_df.writeStream.foreachBatch(merge_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_hll_estimates(spark: SparkSession, store_path: str, group_cols: list[str]) -> DataFrame:
    """Current distinct-count estimates from a register store — a tiny
    scan, independent of how much data the stream has absorbed."""
    return hll_estimate(spark.read.parquet(store_path), group_cols)


def stream_cms_counts(
    stream_df: DataFrame,
    key: str,
    store_path: str,
    checkpoint_path: str,
    available_now: bool = True,
):
    """Maintain a Count-Min frequency grid over a stream.

    Unlike HLL (max-merge, replay-proof), CMS merges by SUM — replaying a
    micro-batch would double-count. So each micro-batch's grid (≤
    depth·width rows whatever the batch size) is written to its own
    ``batch=<id>`` subdirectory with overwrite: foreachBatch's
    at-least-once redelivery just rewrites the same subdir — the
    idempotent-sink idiom for non-idempotent merges. Serving sums cells
    across subdirs (a bounded scan: batches × 8192 rows); a periodic
    compaction job may fold old subdirs into one, by the same cell-sum.
    """
    from edna_dbt_library_spark.operators.sketches import cms_build

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        grid = cms_build(batch_df, key)
        grid.coalesce(1).write.mode("overwrite").parquet(f"{store_path}/batch={batch_id}")

    writer = stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_cms_counters(spark: SparkSession, store_path: str) -> DataFrame:
    """Current merged grid from a per-batch store: cell-wise sum across
    micro-batch subdirectories — feed to operators/sketches.cms_lookup."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(store_path)
        .groupBy("cms_row", "cms_col")
        .agg(F.sum("cms_count").alias("cms_count"))
    )


def stream_column_profiles(
    stream_df: DataFrame,
    columns: list[str],
    store_path: str,
    checkpoint_path: str,
    available_now: bool = True,
):
    """Continuous data-quality monitoring: profile every micro-batch's
    content (operators/profiling.profile_columns — null rates, exact
    per-batch cardinalities, ranges, dominant values) into a
    ``batch=<id>`` subdirectory, the same idempotent-sink idiom as the
    CMS stream: foreachBatch's at-least-once redelivery just rewrites
    the same subdir, so the quality time series never double-counts a
    batch. A drifting null rate or cardinality collapse shows up as a
    per-batch row the moment the bad batch lands — BEFORE it is merged
    anywhere downstream.

    The per-batch profile is a handful of rows (one per column)
    whatever the batch size, so the store stays tiny and the serving
    read is a bounded scan."""
    from edna_dbt_library_spark.operators.profiling import profile_columns

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        prof = profile_columns(batch_df, columns, exact=True)
        prof.coalesce(1).write.mode("overwrite").parquet(f"{store_path}/batch={batch_id}")

    writer = stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_profile_history(spark: SparkSession, store_path: str) -> DataFrame:
    """The quality time series: one row per (batch, column), ordered by
    batch id — feed to alerting (null_frac jumps, n_distinct collapses)."""
    return spark.read.parquet(store_path).orderBy("batch", "column")


def stream_profile_gate(
    stream_df: DataFrame,
    columns: list[str],
    baseline: DataFrame,
    store_path: str,
    checkpoint_path: str,
    null_frac_tol: float = 0.05,
    distinct_frac_tol: float = 0.5,
    top_frac_tol: float = 0.2,
    available_now: bool = True,
):
    """Continuous content-contract enforcement: the streaming form of the
    Runner's profile-drift gate (plans/registry.py — ContractError before
    any write). Every micro-batch's profile (profile_columns, exact) is
    checked against the FROZEN ``baseline`` profile BEFORE any row lands:

    * clean batch  -> rows land under ``{store_path}/good/batch=<id>``
    * drifted batch -> rows are QUARANTINED under
      ``{store_path}/blocked/batch=<id>`` with the violation rows beside
      them under ``{store_path}/violations/batch=<id>`` for triage —
      the drifted content NEVER reaches the good sink.

    A raise inside foreachBatch would kill the whole stream (and
    at-least-once redelivery would replay the same poison batch
    forever), so the gate encodes the batch Runner's block decision as
    quarantine-and-continue; downstream consumers read only ``good/``.
    Idempotent sinks throughout (``batch=<id>`` overwrite), so replays
    re-land identical verdicts. The baseline is pinned once at stream
    start — a gate that re-evaluated its baseline per batch could drift
    with the stream it is supposed to gate.

    Compute the baseline from a known-good batch of COMPARABLE SIZE
    (the batch Runner's contract): null_frac and top_frac transfer
    across batch sizes, but distinct_frac of a low-cardinality column
    is n_distinct/n_rows and scales inversely with batch size — a
    whole-corpus baseline against small micro-batches trips the
    distinct_frac tolerance on every enum-like column (measured on the
    orders fixture: full-table baseline blocks every third-sized clean
    batch; a batch-sized baseline gates correctly)."""
    from edna_dbt_library_spark.operators.profiling import (
        profile_columns,
        profile_drift,
    )

    pinned_baseline = baseline.localCheckpoint(eager=True)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        pinned = batch_df.localCheckpoint(eager=True)
        if pinned.isEmpty():
            return
        prof = profile_columns(pinned, columns, exact=True)
        viol = profile_drift(
            pinned_baseline,
            prof,
            null_frac_tol=null_frac_tol,
            distinct_frac_tol=distinct_frac_tol,
            top_frac_tol=top_frac_tol,
        ).localCheckpoint(eager=True)
        if viol.isEmpty():
            pinned.write.mode("overwrite").parquet(
                f"{store_path}/good/batch={batch_id}"
            )
        else:
            pinned.write.mode("overwrite").parquet(
                f"{store_path}/blocked/batch={batch_id}"
            )
            viol.coalesce(1).write.mode("overwrite").parquet(
                f"{store_path}/violations/batch={batch_id}"
            )

    writer = stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_frequent_items(
    stream_df: DataFrame,
    key: str,
    store_path: str,
    checkpoint_path: str,
    capacity: int = 10000,
    available_now: bool = True,
):
    """Maintain Misra-Gries frequent-item summaries over a stream.

    Each micro-batch computes its own per-partition MG summaries
    (operators/sketches._mg_summaries) merged by key WITHIN the batch
    (lb-sum), then ONE MG decrement pass on the merged summary —
    subtract the (capacity+1)-th largest lb and keep positives (the
    merge-then-reduce algorithm of Agarwal et al., "Mergeable
    Summaries": still <= capacity rows with undercount <=
    N_batch/(capacity+1); without the pass a batch summary is bounded
    only by partitions x capacity keys) — plus the NULL-key sentinel
    row carrying the batch's non-null count, which is exempt from the
    reduction. Like the CMS grid (sum-merge), MG lower bounds merge by
    SUM, so replays would double-count: each batch's summary lands in
    its own ``batch=<id>`` subdir with overwrite — the idempotent-sink
    idiom. Serving sums (k, lb) across subdirs; per-batch summaries are
    <= capacity rows, so the read is bounded by batches x capacity, and
    a compaction job may fold old subdirs by the same key-sum.
    """
    from pyspark.sql import functions as F

    from edna_dbt_library_spark.operators.sketches import _mg_summaries

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        keyed = batch_df.select(F.col(key).cast("string").alias("k"))
        summary = (
            keyed.mapInPandas(_mg_summaries(capacity), "k string, lb long")
            .groupBy("k")
            .agg(F.sum("lb").alias("lb"))
            .localCheckpoint(eager=True)
        )
        nonnull = summary.where(F.col("k").isNotNull())
        if nonnull.count() > capacity:
            thr = (
                nonnull.orderBy(F.col("lb").desc())
                .limit(capacity + 1)
                .agg(F.min("lb"))
                .first()[0]
            )
            summary = (
                nonnull.where(F.col("lb") > thr)
                .withColumn("lb", F.col("lb") - F.lit(thr))
                .unionByName(summary.where(F.col("k").isNull()))
            )
        summary.coalesce(1).write.mode("overwrite").parquet(f"{store_path}/batch={batch_id}")

    writer = stream_df.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_frequent_items_exact(
    spark: SparkSession,
    store_path: str,
    corpus_df: DataFrame,
    key: str,
    den: int = 5000,
    capacity: int = 10000,
) -> DataFrame:
    """EXACT frequent items from a streamed MG store: candidates under
    the same provable keep-rule as the batch operator
    (``lb >= max(1, min_count - N div capacity)``; each stored batch
    summary has undercount <= N_batch/(capacity+1) — the merge-then-
    reduce MG bound — and the integer undercounts sum across batches to
    <= floor(N/(capacity+1)) <= N div capacity), then
    one broadcast exact-count pass over ``corpus_df``. When
    ``corpus_df`` is the union of everything streamed, the result
    equals the batch operator's output row-for-row (asserted in
    tests/test_sketches.py)."""
    from pyspark.sql import functions as F

    if 2 * den > capacity:
        raise ValueError(
            f"superset guarantee needs 2*den <= capacity, got den={den} capacity={capacity}"
        )
    merged = (
        spark.read.parquet(store_path).groupBy("k").agg(F.sum("lb").alias("lb"))
    )
    n_total = (merged.where(F.col("k").isNull()).agg(F.sum("lb")).first() or [0])[0] or 0
    min_count = max(1, n_total // den)
    lb_keep = max(1, min_count - n_total // capacity)
    cand = merged.where(F.col("k").isNotNull() & (F.col("lb") >= lb_keep)).select("k")
    keyed = corpus_df.select(F.col(key).cast("string").alias("k"))
    return (
        keyed.where(F.col("k").isNotNull())
        .join(F.broadcast(cand), "k")
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )
