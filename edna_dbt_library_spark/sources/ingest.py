"""Raw-corpus ingestion sources: JSONL / CSV with schema contracts and
corrupt-record quarantine.

The reference reads only managed warehouse relations (SURVEY.md §2E —
"no JSON functions"), but a training-data engine ingests crawls and
vendor drops that arrive as JSONL/CSV with broken lines, wrong types,
and missing fields. Design rules:

* **PERMISSIVE + corrupt-record capture** — a malformed line must never
  fail the job (the multimodal header probe follows the same rule); it
  lands in a quarantine frame with the ORIGINAL raw line preserved so
  the batch is auditable and replayable.
* **Parse via text + from_json/from_csv, not the JSON/CSV DataSource.**
  The DataSource's corrupt-record column reflects only the columns the
  query needs: under column pruning (`count()`, a narrow projection) a
  type-mismatched field is never parsed, so the same row flips between
  good and quarantined depending on the downstream query — the split
  would disagree with itself. Reading lines through the text source
  gives one un-prunable string column, and referencing the corrupt
  field inside from_json/from_csv disables Catalyst's JSON schema
  pruning, so classification is stable under ANY downstream plan
  (verified by a count-vs-collect test).
* **Schema is REQUIRED** — inference reads the whole input before the
  real read (two full passes at 100 TB) and silently drifts when a
  vendor adds a field. Contracts pin the schema; missing required
  fields quarantine with a per-column reason.
* **Deterministic doc ids** — `with_ingest_ids` derives md5-based ids
  from content, so replaying a batch yields identical ids (the same
  idempotence rule every incremental operator in this repo follows).

Scale shape: both readers are plain distributed file scans (one task
per input split, no shuffle); parsing and the good/bad split are
scan-side expressions. The two returned DataFrames share one lazy
plan — callers writing both sides of a cold object-store batch should
persist the parsed lines first.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


@dataclass(frozen=True)
class IngestResult:
    """Split ingest output: contract-conforming rows and quarantined raw
    records (with the reason they were quarantined)."""

    good: DataFrame
    quarantine: DataFrame


def _require_schema(schema: T.StructType) -> T.StructType:
    if not isinstance(schema, T.StructType):
        raise TypeError(f"ingestion requires an explicit StructType schema, got {type(schema)}")
    if any(f.name == CORRUPT_COL for f in schema.fields):
        raise ValueError(f"schema must not declare the reserved column {CORRUPT_COL!r}")
    return schema


def _split(
    lines: DataFrame, parsed: Column, schema: T.StructType, required: tuple[str, ...]
) -> IngestResult:
    for c in required:
        if c not in {f.name for f in schema.fields}:
            raise ValueError(f"required column {c!r} is not in the schema")
    df = lines.select(F.col("value"), parsed.alias("r"))
    is_corrupt = F.col(f"r.{CORRUPT_COL}").isNotNull() | F.col("r").isNull()
    bad_req = F.lit(False)
    for c in required:
        bad_req = bad_req | F.col(f"r.{c}").isNull()
    good = df.where(~is_corrupt & ~bad_req).select(
        *[F.col(f"r.{f.name}").alias(f.name) for f in schema.fields]
    )
    reason = F.when(is_corrupt, F.lit("malformed")).otherwise(
        F.concat(
            F.lit("missing_required:"),
            F.concat_ws(
                ",",
                F.array_compact(
                    F.array(*[F.when(F.col(f"r.{c}").isNull(), F.lit(c)) for c in required])
                ),
            ),
        )
    )
    quarantine = df.where(is_corrupt | bad_req).select(
        reason.alias("reason"), F.col("value").alias("raw")
    )
    return IngestResult(good=good, quarantine=quarantine)


def split_jsonl_lines(
    lines: DataFrame,
    schema: T.StructType,
    required: tuple[str, ...] = (),
) -> IngestResult:
    """Split a one-column (``value`` string) frame of JSONL lines into
    good/quarantine under the schema contract — the shared core of
    :func:`load_jsonl` and the streaming ingest
    (streaming/ingest_stream.py), so batch and per-micro-batch
    classification are the same expressions by construction."""
    schema = _require_schema(schema)
    read_schema = T.StructType(list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
    parsed = F.from_json(
        "value",
        read_schema,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
    )
    return _split(lines, parsed, schema, required)


def load_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    required: tuple[str, ...] = (),
) -> IngestResult:
    """Read line-delimited JSON under an explicit schema contract.

    Malformed lines (unparseable JSON or a type-mismatched declared
    field) and rows with NULL required fields split into ``quarantine``
    as (reason, raw original line); everything else lands in ``good``
    with exactly the contract's columns."""
    return split_jsonl_lines(spark.read.text(path), schema, required)


def split_csv_lines(
    lines: DataFrame,
    schema: T.StructType,
    required: tuple[str, ...] = (),
    header: bool = True,
    sep: str = ",",
) -> IngestResult:
    """Split a one-column (``value`` string) frame of CSV lines into
    good/quarantine under the schema contract — shared by
    :func:`load_csv` and the streaming ingest, like
    :func:`split_jsonl_lines`."""
    schema = _require_schema(schema)
    if header:
        header_line = sep.join(f.name for f in schema.fields)
        lines = lines.where(F.col("value") != header_line)
    ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = F.from_csv(
        "value",
        ddl,
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL, "sep": sep},
    )
    return _split(lines, parsed, schema, required)


def load_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    required: tuple[str, ...] = (),
    header: bool = True,
    sep: str = ",",
) -> IngestResult:
    """Read CSV under an explicit schema contract, same quarantine
    semantics as :func:`load_jsonl`.

    With ``header=True``, lines exactly equal to the contract's header
    (field names joined by ``sep``) are dropped — every file of a
    multi-file drop sheds its own header. A data line that is literally
    identical to the header is indistinguishable from one and is
    dropped too (pathological by construction)."""
    return split_csv_lines(spark.read.text(path), schema, required, header, sep)


def with_ingest_ids(
    df: DataFrame, content_cols: tuple[str, ...], id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic content-derived ids: ``doc_id = first 15 hex chars
    of md5 over the concatenated content columns`` as a non-negative
    60-bit BIGINT (the same width the dedup family's minhash values
    use). Replaying the same batch yields identical ids (idempotent
    ingestion); the md5 keyspace is uniform, so downstream groupBys and
    joins on the id never skew. Collisions at ~2^-60 are the standard
    fingerprint trade the dedup family already makes."""
    if not content_cols:
        raise ValueError("content_cols must name at least one column")
    payload = F.concat_ws(
        "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in content_cols]
    )
    from edna_dbt_library_spark.functions.binary import hex_to_int

    return df.withColumn(id_col, hex_to_int(F.substring(F.md5(payload), 1, 15)))
