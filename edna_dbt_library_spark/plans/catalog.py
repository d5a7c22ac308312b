"""Data-product catalog: the ``dataplatform_internal.dataproducts`` table
and its upsert (reference §2C:
macros/product_registration/register_dataproduct_metadata.sql).

The catalog row carries nested STRUCT and ARRAY<STRUCT> columns (bigquery
key struct, columns, labels) — the Dremel-style nested model mapped onto
Spark StructType/ArrayType. The upsert is a MERGE on the (datasetId,
tableId) struct key; the catalog is tiny, so the merge is a broadcast
join + full overwrite of a single-file table.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import functions as F
from pyspark.sql import types as T

from edna_dbt_library_spark.plans.contracts import flatten_schema
from edna_dbt_library_spark.sources.warehouse import Relation, TableMeta, Warehouse

CATALOG_SCHEMA_NAME = "dataplatform_internal"
CATALOG_TABLE_NAME = "dataproducts"

# FIXTURES.md §B / reference MERGE :110-131
CATALOG_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("domain", T.StringType()),
        T.StructField("dataproductGroup", T.StringType()),
        T.StructField(
            "bigquery",
            T.StructType(
                [
                    T.StructField("datasetId", T.StringType()),
                    T.StructField("tableId", T.StringType()),
                ]
            ),
        ),
        T.StructField("dbtId", T.StringType()),
        T.StructField("owner", T.StringType()),
        T.StructField("registeredTime", T.TimestampType()),
        T.StructField("lastUpdateTime", T.TimestampType()),
        T.StructField(
            "columns",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("field_path", T.StringType()),
                        T.StructField("data_type", T.StringType()),
                        T.StructField("description", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "labels",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("key", T.StringType()),
                        T.StructField("value", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField("rowCount", T.LongType()),
        T.StructField("sizeInBytes", T.LongType()),
        T.StructField("previewWhereClause", T.StringType()),
        T.StructField("version", T.StringType()),
        T.StructField("versionDescription", T.StringType()),
    ]
)


def catalog_relation(wh: Warehouse) -> Relation:
    return wh.relation(CATALOG_SCHEMA_NAME, CATALOG_TABLE_NAME)


def dataproduct_id(dataset: str, name: str) -> str:
    """id = to_hex(md5('{dataset}-{name}')) (reference: :95,115)."""
    return hashlib.md5(f"{dataset}-{name}".encode()).hexdigest()


def is_registered_dataproduct(wh: Warehouse, dataset_id: str, table_id: str) -> bool:
    """STRUCT-equality catalog lookup (reference:
    validate_dataproduct.sql:54-64)."""
    rel = catalog_relation(wh)
    if not wh.exists(rel):
        return False
    n = (
        wh.read(rel)
        .where(
            (F.col("bigquery.datasetId") == dataset_id) & (F.col("bigquery.tableId") == table_id)
        )
        .count()
    )
    return n > 0


def formatted_columns(schema: T.StructType, model_columns: dict) -> list[tuple[str, str, str]]:
    """Flattened field paths joined with model-declared descriptions
    (reference: :51-74)."""
    out = []
    for fp in flatten_schema(schema):
        meta = (model_columns or {}).get(fp.field_path) or {}
        out.append((fp.field_path, fp.data_type, meta.get("description") or ""))
    return out


def formatted_labels(labels: dict) -> list[tuple[str, str]]:
    """Dict → array-of-struct (reference: :76-83)."""
    return [(str(k), str(v)) for k, v in (labels or {}).items()]


@dataclass
class DataproductEntry:
    description: str
    display_name: str
    domain: str
    dataproduct_group: str
    dataset_id: str
    table_name: str
    dbt_id: str
    owner: str
    columns: list[tuple[str, str, str]] = field(default_factory=list)
    labels: list[tuple[str, str]] = field(default_factory=list)
    row_count: int | None = None
    size_bytes: int | None = None
    preview_where_clause: str | None = None
    version: str | None = None
    version_description: str | None = None
    name: str = ""  # model name used for the id hash


def upsert_dataproduct_entry(wh: Warehouse, entry: DataproductEntry) -> None:
    """MERGE on the bigquery struct key: matched → update all mutable
    fields (registeredTime preserved); not matched → insert
    (reference: :85-135)."""
    now = datetime.now(timezone.utc).replace(tzinfo=None)
    rel = catalog_relation(wh)
    new_row = {
        "id": dataproduct_id(entry.dataset_id, entry.name or entry.display_name),
        "description": entry.description,
        "name": entry.display_name,
        "domain": entry.domain,
        "dataproductGroup": entry.dataproduct_group,
        "bigquery": {"datasetId": entry.dataset_id, "tableId": entry.table_name},
        "dbtId": entry.dbt_id,
        "owner": entry.owner,
        "registeredTime": now,
        "lastUpdateTime": now,
        "columns": entry.columns,
        "labels": entry.labels,
        "rowCount": entry.row_count,
        "sizeInBytes": entry.size_bytes,
        "previewWhereClause": entry.preview_where_clause,
        "version": str(entry.version) if entry.version is not None else None,
        "versionDescription": entry.version_description,
    }
    spark = wh.spark
    new_df = spark.createDataFrame([new_row], CATALOG_SCHEMA)
    if not wh.exists(rel):
        wh.create_as(rel, new_df, TableMeta())
        return
    existing = wh.read(rel)
    match = (F.col("bigquery.datasetId") == entry.dataset_id) & (
        F.col("bigquery.tableId") == entry.table_name
    )
    matched = existing.where(match).limit(1).collect()
    if matched:
        # preserve the original registeredTime on update (insert-only field)
        new_row["registeredTime"] = matched[0]["registeredTime"]
        new_df = spark.createDataFrame([new_row], CATALOG_SCHEMA)
    merged = existing.where(~match).unionByName(new_df)
    # tiny table: rewrite through a staged temp (can't overwrite a path
    # while reading it)
    staged = spark.createDataFrame(merged.collect(), CATALOG_SCHEMA)
    wh.create_as(rel, staged, TableMeta())


def register_dataproduct_metadata(
    wh: Warehouse,
    *,
    node,
    target: Relation,
    project_name: str,
) -> bool:
    """Post-hook: collect metadata and upsert (reference: :1-33). Returns
    False when the model carries no dataproduct config."""
    from edna_dbt_library_spark.plans.config import get_config_or_meta, is_defined

    dataprod = get_config_or_meta(node.config, node.meta, "dataproduct")
    if not is_defined(dataprod):
        return False
    schema = wh.read(target).schema
    size = wh.size_info(target)
    display_name = dataprod.get("displayName")
    if not is_defined(display_name):
        display_name = node.name
    entry = DataproductEntry(
        description=node.description or "",
        display_name=display_name,
        domain=project_name,
        dataproduct_group=(node.path.split("/")[0] if node.path else node.group),
        dataset_id=target.schema,
        table_name=target.identifier,
        dbt_id=node.unique_id,
        owner=dataprod.get("owner") or "",
        columns=formatted_columns(schema, node.columns),
        labels=formatted_labels(node.config.get("labels", {})),
        row_count=size["row_count"],
        size_bytes=size["size_bytes"],
        preview_where_clause=dataprod.get("previewWhereClause"),
        version=dataprod.get("version"),
        version_description=dataprod.get("versionDescription"),
        name=node.name,
    )
    upsert_dataproduct_entry(wh, entry)
    return True
