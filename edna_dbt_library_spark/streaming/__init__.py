from edna_dbt_library_spark.streaming.incremental_stream import (
    stream_incremental_append,
    stream_windowed_counts,
)

__all__ = ["stream_incremental_append", "stream_windowed_counts"]
