from edna_dbt_library_spark.sources.tables import (
    TABLE_NAMES,
    TIMESTAMP_NS_COLUMNS,
    load_table,
    load_tables,
    register_views,
)
from edna_dbt_library_spark.sources.ingest import (
    IngestResult,
    load_csv,
    load_jsonl,
    with_ingest_ids,
)
from edna_dbt_library_spark.sources.warc import (
    WARC_SCHEMA,
    load_warc,
    parse_warc_records,
    warc_to_documents,
)
from edna_dbt_library_spark.sources.warehouse import Relation, TableMeta, Warehouse

__all__ = [
    "IngestResult",
    "load_csv",
    "load_jsonl",
    "with_ingest_ids",
    "TABLE_NAMES",
    "TIMESTAMP_NS_COLUMNS",
    "load_table",
    "load_tables",
    "register_views",
    "Relation",
    "TableMeta",
    "Warehouse",
    "WARC_SCHEMA",
    "load_warc",
    "parse_warc_records",
    "warc_to_documents",
]
