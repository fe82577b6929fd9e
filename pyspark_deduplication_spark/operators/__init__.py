from pyspark_deduplication_spark.operators.dedup import (  # noqa: F401
    dedup_exact,
    dedup_fingerprint,
    dedup_full_row,
    dedup_keep_first,
    build_minhash_index,
    clone_representatives,
    hamming_edges,
    incremental_dedup,
    incremental_minhash_candidates,
    incremental_minhash_dedup,
    merge_upsert,
    minhash_candidate_pairs,
    minhash_dedup,
    minhash_signatures,
    simhash_dedup,
    simhash_signatures,
    with_surrogate_id,
)
from pyspark_deduplication_spark.operators.fused import (  # noqa: F401
    fused_dedup,
    fused_dedup_edges,
    incremental_fused_dedup,
)
from pyspark_deduplication_spark.operators.joins import (  # noqa: F401
    asof_join,
    range_join,
)
from pyspark_deduplication_spark.operators.knn import (  # noqa: F401
    brute_force_knn,
    build_ivf_index,
    build_ivfpq_index,
    embedding_near_dup_pairs,
    build_semantic_dedup_index,
    hyperplane_lsh_buckets,
    incremental_semantic_dedup,
    ivf_knn,
    ivfpq_knn,
    lsh_near_dup_pairs,
    opq_reorder,
    pq_encode,
    pq_knn,
    project_pca,
    semantic_decontaminate,
    semantic_dedup,
    train_centroids,
    train_pca,
    train_pq_codebook,
)
from pyspark_deduplication_spark.operators.linkage import (  # noqa: F401
    blocked_similarity_cross_join,
    blocked_similarity_join,
    cluster_members,
    connected_components,
    levenshtein_link,
    similarity_join_faithful,
    transitive_clusters,
)
from pyspark_deduplication_spark.operators.multimodal import (  # noqa: F401
    audio_near_dup_perceptual,
    extract_audio_features,
    extract_image_features,
    media_exact_dedup,
    media_near_dup_perceptual,
    media_repartition,
    sample_video_frames,
    video_gradient_shingles,
    video_near_dup_perceptual,
    video_near_dup_shingled,
    video_temporal_hash,
)
from pyspark_deduplication_spark.operators.partitioning import (  # noqa: F401
    bucketed_join,
    salted_join,
    write_bucketed,
)
from pyspark_deduplication_spark.operators.chunking import (  # noqa: F401
    build_span_index,
    chunk_documents,
    incremental_remove_duplicate_spans,
    remove_duplicate_spans,
)
from pyspark_deduplication_spark.operators.unigram import (  # noqa: F401
    substring_candidates,
    train_unigram,
    unigram_encode,
)
from pyspark_deduplication_spark.operators.quality import (  # noqa: F401
    bloom_decontaminate,
    build_decontamination_index,
    build_gram_index,
    check_constraints,
    decontaminate_exact,
    flag_by_ids,
)
from pyspark_deduplication_spark.operators.sampling import (  # noqa: F401
    cap_per_group,
    execute_token_budget,
    hash_bucket,
    hash_sample,
    hash_split,
    leakage_safe_split,
    reservoir_per_group,
    stratified_hash_sample,
)
from pyspark_deduplication_spark.operators.timeseries import (  # noqa: F401
    gapfill,
    resample_buckets,
)
from pyspark_deduplication_spark.operators.diff import (  # noqa: F401
    snapshot_diff,
)
from pyspark_deduplication_spark.operators.profiling import (  # noqa: F401
    cms_build,
    cms_estimate,
    cms_merge,
    hll_rollup,
    hll_union_rollup,
    profile_numeric,
)
