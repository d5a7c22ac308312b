"""edna_dbt_library_spark — a PySpark-native analytics engine with the
capabilities of the `3lvia/edna-dbt-library` dbt/BigQuery macro package,
re-expressed Spark-first.

Subpackages
-----------
functions : scalar Column-builder library (binary conversions, UUIDv5/v3,
            timestamp formatting, text analysis, vector math). Mirrors the
            reference's compile-time SQL-fragment macros
            (reference: macros/utils/binary_conversions.sql,
            macros/utils/uuid_generation.sql) as pure
            ``pyspark.sql.Column`` expressions — never Python UDFs.
sources   : parquet table loaders for the driver fixtures, plus the
            warehouse abstraction (path-based partitioned parquet tables)
            and the append-only run-event log
            (reference: macros/utils/log_helpers.sql).
operators : table-level dataflow operators — the two incremental
            materializations (reference: macros/materialization/*.sql),
            dedup / similarity-search / text-analysis extension operators.
plans     : model registry + runner, env-aware naming, config resolution,
            schema contracts (reference: macros/generate_schema_name.sql,
            macros/product_registration/*.sql).
streaming : Structured Streaming variants of the incremental flows.
"""

__version__ = "0.1.0"
