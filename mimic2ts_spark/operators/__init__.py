"""Composable DataFrame operators — each maps a row of SURVEY.md §2 to a
native Spark expression or a small DataFrame transformation. All are pure
functions DataFrame -> DataFrame / Column -> Column; no UDFs in this
package except the clearly-marked pandas-UDF escape hatches.
"""

from mimic2ts_spark.operators.time_ops import (
    epoch_seconds,
    parse_epoch_seconds,
    bucket_index,
    clamp_floor,
    total_windows,
)
from mimic2ts_spark.operators.intervals import interval_instants, spread_evenly
from mimic2ts_spark.operators.dense import dense_reindex, forward_fill, zero_fill
from mimic2ts_spark.operators.reshape import pivot_wide
from mimic2ts_spark.operators.cluster import canonical_ids, connected_components
from mimic2ts_spark.operators.dedup import (
    containment_pairs,
    exact_dedup,
    incremental_ngram_pairs,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from mimic2ts_spark.operators.joins import asof_join, bloom_semi_join, range_join
from mimic2ts_spark.operators.multimodal import (
    attach_media,
    decode_features,
    decode_real,
    extract_features,
    perceptual_hashes,
    phash_near_dup_pairs,
    resize_images,
    sample_frames,
)
from mimic2ts_spark.operators.kmeans import load_centroids, save_centroids
from mimic2ts_spark.operators.similarity import (
    append_ivf_artifact,
    assign_vectors,
    brute_force_topk,
    embedding_near_dup_pairs,
    embedding_near_dup_pairs_lsh,
    filtered_topk,
    filtered_topk_bq,
    filtered_topk_sq8,
    ivf_delta_assign,
    ivf_topk,
    lsh_multiprobe_topk,
    lsh_topk,
    serve_ivf_artifact,
)
from mimic2ts_spark.operators.sketch import kmv_sketch
from mimic2ts_spark.operators.knn import (
    append_knn_artifact,
    build_knn_artifact,
    knn_beam_topk,
    knn_graph,
    seed_hop_distance,
    serve_knn_artifact,
)
from mimic2ts_spark.operators.split import epoch_shuffle, with_split
from mimic2ts_spark.operators.text import (
    bpe_ish_token_count,
    hashed_vector_rows,
    hashed_vectors_dense,
    lang_id,
    quality_score,
    token_count,
)
from mimic2ts_spark.operators.linkage import best_match_report, fuzzy_link
from mimic2ts_spark.operators.merge import merge_changelog, merge_upsert
from mimic2ts_spark.operators.pq import (
    bq_codes,
    bq_hamming_panel,
    bq_rescore_panel,
    ivfpq_topk,
    load_codebooks,
    pq_adc_topk,
    pq_encode,
    save_codebooks,
    train_codebooks,
)
from mimic2ts_spark.operators.versioned import (
    compact_versioned,
    diff_versions,
    incremental_agg_refresh,
    init_table,
    merge_versioned,
    read_table,
    table_count,
    vacuum,
)

__all__ = [
    "epoch_seconds",
    "parse_epoch_seconds",
    "bucket_index",
    "clamp_floor",
    "total_windows",
    "interval_instants",
    "spread_evenly",
    "dense_reindex",
    "forward_fill",
    "zero_fill",
    "pivot_wide",
    "canonical_ids",
    "connected_components",
    "containment_pairs",
    "exact_dedup",
    "incremental_ngram_pairs",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_pairs",
    "asof_join",
    "bloom_semi_join",
    "range_join",
    "attach_media",
    "decode_features",
    "decode_real",
    "extract_features",
    "perceptual_hashes",
    "phash_near_dup_pairs",
    "resize_images",
    "sample_frames",
    "brute_force_topk",
    "embedding_near_dup_pairs",
    "embedding_near_dup_pairs_lsh",
    "assign_vectors",
    "ivf_delta_assign",
    "load_centroids",
    "save_centroids",
    "ivf_topk",
    "serve_ivf_artifact",
    "append_ivf_artifact",
    "filtered_topk",
    "filtered_topk_bq",
    "filtered_topk_sq8",
    "lsh_topk",
    "lsh_multiprobe_topk",
    "knn_graph",
    "knn_beam_topk",
    "seed_hop_distance",
    "build_knn_artifact",
    "append_knn_artifact",
    "serve_knn_artifact",
    "kmv_sketch",
    "with_split",
    "epoch_shuffle",
    "bpe_ish_token_count",
    "lang_id",
    "quality_score",
    "token_count",
    "hashed_vector_rows",
    "hashed_vectors_dense",
    "fuzzy_link",
    "best_match_report",
    "merge_changelog",
    "merge_upsert",
    "bq_codes",
    "bq_hamming_panel",
    "bq_rescore_panel",
    "ivfpq_topk",
    "load_codebooks",
    "pq_adc_topk",
    "pq_encode",
    "save_codebooks",
    "train_codebooks",
    "compact_versioned",
    "diff_versions",
    "incremental_agg_refresh",
    "init_table",
    "merge_versioned",
    "read_table",
    "table_count",
    "vacuum",
]
