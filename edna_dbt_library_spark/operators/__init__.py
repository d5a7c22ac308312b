from edna_dbt_library_spark.operators.dedup import (
    dedup_exact,
    exact_duplicate_groups,
    fingerprint_duplicate_groups,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    near_duplicate_pairs,
    simhash,
)
from edna_dbt_library_spark.operators.relational import (
    asof_join,
    distinct_partition_dates,
    latest_by_key,
    ordered_string_agg,
    range_interval_join,
    sessionize,
    top1_per_key,
    window_filter,
)
from edna_dbt_library_spark.operators.materializations import (
    IncrementalLogConfig,
    PartitionMergeConfig,
    PartitionSpec,
    read_table,
    run_incremental_log,
    run_incremental_partition_merge,
)
from edna_dbt_library_spark.operators.multimodal import (
    attach_fake_media,
    decode_images,
    extract_features,
    plan_frame_samples,
)
from edna_dbt_library_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_duplicates,
    ivf_topk,
    lsh_bucketed_topk,
)
from edna_dbt_library_spark.operators.curation import (
    contamination_flags,
    deterministic_sample,
    pack_sequences,
)
from edna_dbt_library_spark.operators.skew import salted_aggregate

__all__ = [
    "dedup_exact",
    "exact_duplicate_groups",
    "fingerprint_duplicate_groups",
    "jaccard_pairs",
    "lsh_candidate_pairs",
    "minhash_signatures",
    "near_duplicate_pairs",
    "simhash",
    "asof_join",
    "range_interval_join",
    "distinct_partition_dates",
    "latest_by_key",
    "ordered_string_agg",
    "sessionize",
    "top1_per_key",
    "window_filter",
    "brute_force_topk",
    "lsh_bucketed_topk",
    "embedding_near_duplicates",
    "ivf_topk",
    "salted_aggregate",
    "contamination_flags",
    "deterministic_sample",
    "pack_sequences",
    "IncrementalLogConfig",
    "PartitionMergeConfig",
    "PartitionSpec",
    "read_table",
    "run_incremental_log",
    "run_incremental_partition_merge",
    "attach_fake_media",
    "decode_images",
    "extract_features",
    "plan_frame_samples",
]
