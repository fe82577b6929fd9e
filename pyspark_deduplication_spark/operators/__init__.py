from pyspark_deduplication_spark.operators.dedup import (  # noqa: F401
    dedup_exact,
    dedup_fingerprint,
    dedup_full_row,
    dedup_keep_first,
    minhash_candidate_pairs,
    minhash_dedup,
    simhash_dedup,
    with_surrogate_id,
)
from pyspark_deduplication_spark.operators.linkage import (  # noqa: F401
    blocked_similarity_join,
    cluster_members,
    connected_components,
    levenshtein_link,
    similarity_join_faithful,
    transitive_clusters,
)
