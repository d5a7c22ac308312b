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

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: quarantine rows always land with this shape (ingest.split_* contract)
QUARANTINE_SCHEMA = T.StructType(
    [T.StructField("reason", T.StringType()), T.StructField("raw", T.StringType())]
)


def _check_contract_schema(schema: T.StructType) -> None:
    """The sink partitions on a bookkeeping column named ``batch``; a
    contract column of the same name would collide with it on read (and
    read_ingested's drop would silently discard real data) — reject it
    at stream start instead of corrupting the store."""
    if "batch" in schema.fieldNames():
        raise ValueError(
            "ingest contract schema must not name a column 'batch': the "
            "streaming sink uses batch=<id> partition bookkeeping; rename "
            "the column before streaming"
        )


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

    _check_contract_schema(schema)
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

    _check_contract_schema(schema)
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


def read_ingested(
    spark: SparkSession,
    store_path: str,
    schema: T.StructType | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine) frames over everything the stream has landed —
    plain parquet reads across the ``batch=<id>`` subdirectories. The
    inferred ``batch`` partition column is sink bookkeeping, not data
    (a contract column of that name is rejected at stream start), and
    is dropped (contract: the landed frames equal the batch reader's
    split exactly).

    A store where the stream has not landed a batch yet is a legitimate
    state (first trigger still running, empty source dir): pass the
    contract ``schema`` to get correctly-typed EMPTY frames back instead
    of an AnalysisException; without a schema an absent store raises a
    clear error naming the missing directory."""
    good_dir, quar_dir = f"{store_path}/good", f"{store_path}/quarantine"

    def _read(path: str, empty_schema: T.StructType | None) -> DataFrame:
        if not os.path.isdir(path):
            if empty_schema is not None:
                return spark.createDataFrame([], empty_schema)
            raise FileNotFoundError(
                f"ingest store has no landed batches yet: {path} does not "
                "exist (pass schema= to read_ingested for empty frames)"
            )
        return spark.read.parquet(path).drop("batch")

    return (
        _read(good_dir, schema),
        _read(quar_dir, QUARANTINE_SCHEMA if schema is not None else None),
    )


def stream_warc_ingest(
    spark: SparkSession,
    source_path: str,
    store_path: str,
    checkpoint_path: str,
    record_types: tuple[str, ...] = ("response",),
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Streaming form of sources/warc.load_warc for a landing zone that
    fills with crawl archives while the pipeline runs: readStream over
    the binaryFile source (one archive per row — archives are the task
    granule, so maxFilesPerTrigger directly sizes the micro-batch), the
    SAME distributed parse_warc_records extraction as the batch reader
    (shared helper, archives never touch the driver), and the repo's
    ``batch=<id>`` idempotent parquet sink — an at-least-once redelivery
    rewrites its subdir, so the landed record set equals the batch parse
    no matter how the backlog was chopped or replayed. Read the store
    back as plain parquet over ``{store_path}/records`` (the ``batch``
    partition column is sink bookkeeping)."""
    from pyspark.sql import functions as F

    from edna_dbt_library_spark.sources.warc import _extract_records

    # the binaryFile source's schema is fixed but must be stated for a
    # streaming read
    binary_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    reader = spark.readStream.format("binaryFile").schema(binary_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.load(source_path).select(
        F.col("path").alias("source_file"), "content"
    )

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        out = _extract_records(batch_df, record_types)
        out.write.mode("overwrite").parquet(f"{store_path}/records/batch={batch_id}")

    writer = stream.writeStream.foreachBatch(write_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
