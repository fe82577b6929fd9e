from pyspark_deduplication_spark.functions.similarity import (  # noqa: F401
    canonical_pair_key,
    char_ngrams,
    jaccard,
    levenshtein_within,
    ngram_jaccard,
    ratcliff_similarity,
)
from pyspark_deduplication_spark.functions.text import (  # noqa: F401
    detect_language,
    doc_fingerprint,
    language_scores,
    normalize_text,
    quality_features,
    token_count,
    tokenize,
    word_ngrams,
    word_ngrams_of,
)
from pyspark_deduplication_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_norm,
)
