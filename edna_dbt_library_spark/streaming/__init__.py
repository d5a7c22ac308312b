from edna_dbt_library_spark.streaming.incremental_stream import (
    stream_cdc_refresh,
    stream_join_view,
    stream_incremental_append,
    stream_interval_join,
    stream_jaccard_join,
    stream_semantic_dedup,
    stream_table,
    stream_windowed_counts,
)
from edna_dbt_library_spark.streaming.ingest_stream import (
    read_ingested,
    stream_csv_ingest,
    stream_jsonl_ingest,
    stream_warc_ingest,
)
from edna_dbt_library_spark.streaming.timeseries_stream import (
    compact_continuous_aggregate,
    read_continuous_aggregate,
    stream_continuous_aggregate,
)
from edna_dbt_library_spark.streaming.sketch_stream import (
    read_cms_counters,
    read_frequent_items_exact,
    read_hll_estimates,
    read_profile_history,
    stream_cms_counts,
    stream_column_profiles,
    stream_frequent_items,
    stream_hll_distinct,
    stream_profile_gate,
)

__all__ = [
    "read_ingested",
    "stream_csv_ingest",
    "stream_jsonl_ingest",
    "stream_warc_ingest",
    "stream_cdc_refresh",
    "stream_incremental_append",
    "stream_join_view",
    "stream_interval_join",
    "stream_jaccard_join",
    "stream_semantic_dedup",
    "stream_table",
    "stream_windowed_counts",
    "stream_continuous_aggregate",
    "read_continuous_aggregate",
    "compact_continuous_aggregate",
    "read_cms_counters",
    "read_frequent_items_exact",
    "read_hll_estimates",
    "read_profile_history",
    "stream_cms_counts",
    "stream_column_profiles",
    "stream_frequent_items",
    "stream_hll_distinct",
    "stream_profile_gate",
]
