"""Document chunking for LLM training/embedding prep.

Splits each document into fixed-size token windows with configurable
overlap (stride = size - overlap), the standard preprocessing step before
tokenizer packing or embedding. Pure native expressions: tokens are
staged once per document, windows come from ``sequence`` + ``transform``
(JVM-side, no Python), and ``posexplode`` emits (doc, chunk_index, chunk)
rows — the operator is map-only, so chunking 100 TB of documents never
shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_deduplication_spark.functions.text import tokenize


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    size: int = 64,
    overlap: int = 16,
    min_tokens: int = 1,
) -> DataFrame:
    """Explode documents into overlapping token-window chunks.

    Adds ``chunk_index`` (0-based position within the doc), ``chunk_text``
    (space-joined window), and ``chunk_n_tokens``. The final window is the
    possibly-short tail; windows shorter than ``min_tokens`` are dropped.
    All other columns pass through unchanged.
    """
    if overlap >= size:
        raise ValueError(f"overlap ({overlap}) must be < size ({size})")
    stride = size - overlap
    toks = F.col("__toks")
    n = F.size(toks)
    # window starts: 0, stride, 2*stride, ... while start < n (at least one)
    n_windows = F.greatest(
        F.ceil((n - F.lit(overlap)).cast("double") / F.lit(stride)),
        F.lit(1),
    ).cast("int")
    windows = F.transform(
        F.sequence(F.lit(0), n_windows - 1),
        lambda i: F.slice(toks, i * stride + 1, size),
    )
    staged = df.withColumn("__toks", tokenize(F.col(text_col)))
    out = (
        staged.withColumn("__windows", windows)
        .select(
            *[c for c in df.columns],
            F.posexplode(F.col("__windows")).alias("chunk_index", "__chunk"),
        )
        .withColumn("chunk_n_tokens", F.size(F.col("__chunk")))
        .filter(F.col("chunk_n_tokens") >= min_tokens)
        .withColumn("chunk_text", F.concat_ws(" ", F.col("__chunk")))
        .drop("__chunk")
    )
    return out
