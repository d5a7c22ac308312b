"""Streaming JSONL ingestion with corrupt-record quarantine: the
continuous form of sources/ingest.load_jsonl for landing-zone
directories that fill while the pipeline runs.

``readStream.text`` + the SAME from_json split expressions as the batch
reader (sources/ingest.split_jsonl_lines — shared code, so a line
classifies identically whether it arrives in a batch load or any
micro-batch slicing), then ``foreachBatch`` writes each micro-batch's
good and quarantine halves to ``batch=<id>`` subdirectories with
overwrite — the repo's idempotent-sink idiom (sketch_stream.py): an
at-least-once redelivery rewrites the same subdir instead of appending
duplicates, so the landed corpus equals the batch answer no matter how
the stream was chopped or replayed.

Scale shape: the split is scan-side expressions over the text source
(no shuffle); each micro-batch is one distributed parse + two writes.
The good side lands with exactly the contract's columns, quarantine as
(reason, raw) — both directly readable as plain parquet directories.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def stream_jsonl_ingest(
    spark: SparkSession,
    source_path: str,
    schema: T.StructType,
    store_path: str,
    checkpoint_path: str,
    required: tuple[str, ...] = (),
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Start the streaming ingest: good rows land under
    ``{store_path}/good/batch=<id>``, quarantined lines under
    ``{store_path}/quarantine/batch=<id>``. Returns the StreamingQuery;
    ``max_files_per_trigger`` chops the backlog into multiple
    micro-batches (the count-vs-collect stability property must hold
    under any chopping — tested streamed==batch)."""
    from edna_dbt_library_spark.sources.ingest import split_jsonl_lines

    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    lines = reader.text(source_path)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # one parse for both sides: the micro-batch is bounded, so a
        # local pin beats re-reading the source files per side
        pinned = batch_df.localCheckpoint(eager=True)
        res = split_jsonl_lines(pinned, schema, required)
        res.good.write.mode("overwrite").parquet(f"{store_path}/good/batch={batch_id}")
        res.quarantine.write.mode("overwrite").parquet(
            f"{store_path}/quarantine/batch={batch_id}"
        )

    writer = lines.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_csv_ingest(
    spark: SparkSession,
    source_path: str,
    schema: T.StructType,
    store_path: str,
    checkpoint_path: str,
    required: tuple[str, ...] = (),
    header: bool = True,
    sep: str = ",",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """CSV twin of :func:`stream_jsonl_ingest`: the batch reader's own
    split_csv_lines expressions over a streamed drop folder (per-file
    header shedding included — the header filter is a row predicate, so
    it works identically under any micro-batch chopping), landing into
    the same ``batch=<id>`` idempotent good/quarantine sinks."""
    from edna_dbt_library_spark.sources.ingest import split_csv_lines

    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    lines = reader.text(source_path)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        pinned = batch_df.localCheckpoint(eager=True)
        res = split_csv_lines(pinned, schema, required, header, sep)
        res.good.write.mode("overwrite").parquet(f"{store_path}/good/batch={batch_id}")
        res.quarantine.write.mode("overwrite").parquet(
            f"{store_path}/quarantine/batch={batch_id}"
        )

    writer = lines.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def read_ingested(spark: SparkSession, store_path: str) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine) frames over everything the stream has landed —
    plain parquet reads across the ``batch=<id>`` subdirectories. The
    inferred ``batch`` partition column is sink bookkeeping, not data,
    and is dropped (contract: the landed frames equal the batch
    reader's split exactly)."""
    return (
        spark.read.parquet(f"{store_path}/good").drop("batch"),
        spark.read.parquet(f"{store_path}/quarantine").drop("batch"),
    )
