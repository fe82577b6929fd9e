"""Vector kernels over ``array<float>`` embedding columns.

Native-expression implementations (``F.zip_with`` + ``F.aggregate``) keep
the arithmetic JVM-side and deterministic: accumulation is sequential in
array order with a double accumulator, which matches an ordered-reduction
oracle bit-for-bit. A Pandas-UDF path exists for wide batch scoring where
NumPy's vectorized BLAS beats per-element codegen.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Ordered sequential dot product with a double accumulator."""
    products = F.zip_with(_as_col(a), _as_col(b),
                          lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(products, F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column | str) -> Column:
    v = _as_col(a)
    return F.sqrt(F.aggregate(
        v, F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    na, nb = l2_norm(a), l2_norm(b)
    return F.when((na > 0) & (nb > 0), dot(a, b) / (na * nb)).otherwise(F.lit(0.0))


@F.pandas_udf(T.DoubleType())
def cosine_similarity_pd(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-vectorized cosine — the fast path for bulk pair scoring.

    Semantically identical to ``cosine_similarity`` up to float summation
    order; use the native version where bit-exact cross-engine results
    matter, this one where throughput matters.
    """
    import numpy as np

    av = np.stack(a.to_numpy())
    bv = np.stack(b.to_numpy())
    num = (av * bv).sum(axis=1)
    den = np.linalg.norm(av, axis=1) * np.linalg.norm(bv, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(den > 0, num / den, 0.0)
    return pd.Series(out)


def hashed_bow_embedding(col: Column | str, dim: int = 16,
                         seed: str = "bow") -> Column:
    """Deterministic hashed bag-of-words embedding of a text column —
    ``array<double>`` of length ``dim``: each token hashes (xxhash64)
    into one of ``dim`` buckets and the vector is the bucket-count
    histogram. The cheap, model-free featurizer that lets the
    semantic-dedup machinery (cosine cells, IVF) run over corpora
    that have no learned embeddings yet — e.g. freshly crawled web
    text in the streaming ingest loop. Pure native expressions: one
    token-hash pass then a ``dim``-wide count transform; map-only,
    zero shuffle. Cosine over raw counts is scale-invariant, so no
    normalization pass is needed."""
    from pyspark_deduplication_spark.functions.text import tokenize

    toks = F.filter(tokenize(_as_col(col)), lambda t: t != F.lit(""))
    bs = F.transform(
        toks, lambda t: F.pmod(F.xxhash64(F.concat(t, F.lit(seed))),
                               F.lit(dim)))
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.size(F.filter(bs, lambda b: b == i.cast("bigint")))
        .cast("double"))
