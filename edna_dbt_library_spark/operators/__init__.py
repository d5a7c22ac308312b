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
    distinct_partition_dates,
    latest_by_key,
    ordered_string_agg,
    sessionize,
    top1_per_key,
    window_filter,
)
from edna_dbt_library_spark.operators.similarity import brute_force_topk, lsh_bucketed_topk

__all__ = [
    "dedup_exact",
    "exact_duplicate_groups",
    "fingerprint_duplicate_groups",
    "jaccard_pairs",
    "lsh_candidate_pairs",
    "minhash_signatures",
    "near_duplicate_pairs",
    "simhash",
    "distinct_partition_dates",
    "latest_by_key",
    "ordered_string_agg",
    "sessionize",
    "top1_per_key",
    "window_filter",
    "brute_force_topk",
    "lsh_bucketed_topk",
]
