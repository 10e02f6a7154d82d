from weather_monitoring_spark.operators.core import (
    dedup_by_key,
    latest_per_key,
    normalize_wire,
    point_lookup,
    sequence_gaps,
    split_valid_rejects,
    top_k,
    with_partition_cols,
)
from weather_monitoring_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    ngram_jaccard_verify,
    shingle_df_cutoff,
    simhash_neardup_pairs,
    simhash_signatures,
)
from weather_monitoring_spark.operators.multimodal import (
    decode_images,
    sample_frames,
    synthetic_assets,
)
from weather_monitoring_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_neardup_lsh,
    cosine_neardup_pairs,
    cosine_topk,
    with_lsh_buckets,
)
from weather_monitoring_spark.operators.textops import (
    fingerprints,
    lang_id,
    text_stats,
    token_counts,
)

__all__ = [
    "ann_lsh_topk",
    "cosine_neardup_lsh",
    "cosine_neardup_pairs",
    "cosine_topk",
    "decode_images",
    "dedup_by_key",
    "exact_dedup",
    "fingerprints",
    "lang_id",
    "latest_per_key",
    "minhash_lsh_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "ngram_jaccard_verify",
    "normalize_wire",
    "point_lookup",
    "sample_frames",
    "sequence_gaps",
    "shingle_df_cutoff",
    "simhash_neardup_pairs",
    "simhash_signatures",
    "split_valid_rejects",
    "synthetic_assets",
    "text_stats",
    "token_counts",
    "top_k",
    "with_lsh_buckets",
    "with_partition_cols",
]
