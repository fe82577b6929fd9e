"""Feature-hashed linear model inference — quality scoring at 100 TB.

The standard cheap quality classifier over a corpus (fastText-style
linear model on hashed token features) expressed as pure native
expressions: tokens hash to one of 256 buckets (the engine's
cross-engine md5 hex-pair idiom, ``operators.sampling.hash_bucket``),
each bucket carries a weight, and a document's score is the weight sum —
map-side-combinable, join-free when weights are an expression,
broadcast-joined when they come from a trained model table. No Python
anywhere; inference is one aggregation pass.

Determinism: demo weights are exact multiples of 1/16 (a power of two),
so every partial sum is exactly representable and the total is
ORDER-INDEPENDENT — the DuckDB oracle verifies the full inference path
bit-for-bit with no rounding tolerance. A real trained model replaces
``bucket_weight`` with a (bucket, weight) table via
``score_with_weight_table``; the plumbing is identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark_deduplication_spark.functions.text import tokenize
from pyspark_deduplication_spark.operators.sampling import hash_bucket

N_BUCKETS = 256  # one md5 hex pair


def bucket_weight(bucket: Column) -> Column:
    """Deterministic per-bucket weight in [-6/16, 6/16]: a pure
    expression both engines compute identically from the hex pair's
    character codes (no hex→int conversion, which DuckDB lacks).
    Exact in binary (denominator 16), so sums are associativity-safe."""
    code = (F.ascii(F.substring(bucket, 1, 1)) * 16
            + F.ascii(F.substring(bucket, 2, 1)))
    return ((code % 13 - 6).cast("double")) / 16.0


def hashed_linear_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "q5",
    bias: float = 0.0,
) -> DataFrame:
    """Score every document under the hashed linear model: one explode
    + one aggregation, weights computed in-expression (join-free).
    Returns (id, n_toks, score, band) — ``band`` buckets the raw score
    by exact thresholds (sigmoid intentionally omitted: libm ``exp``
    may differ across engines by 1 ulp; thresholding the exact sum
    keeps the whole path bit-deterministic)."""
    terms = (
        df.select(F.col(id_col),
                  F.explode(tokenize(F.col(text_col))).alias("term"))
        .filter(F.col("term") != "")
    )
    scored = terms.select(
        id_col,
        bucket_weight(hash_bucket(F.col("term"), seed)).alias("__w"),
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_toks"),
        (F.sum("__w") + F.lit(float(bias))).alias("score"),
    )
    return agg.select(
        id_col,
        "n_toks",
        "score",
        F.when(F.col("score") >= 1.0, F.lit("high"))
        .when(F.col("score") >= -1.0, F.lit("mid"))
        .otherwise(F.lit("low")).alias("band"),
    )


def score_with_weight_table(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = "q5",
    bucket_col: str = "bucket",
    weight_col: str = "weight",
) -> DataFrame:
    """Inference against a TRAINED (bucket, weight) table — ≤256 rows,
    always broadcast; unseen buckets score 0. Same aggregation shape as
    ``hashed_linear_score``; the corpus never shuffles for the join."""
    terms = (
        df.select(F.col(id_col),
                  F.explode(tokenize(F.col(text_col))).alias("term"))
        .filter(F.col("term") != "")
        .withColumn("__b", hash_bucket(F.col("term"), seed))
    )
    joined = terms.join(
        F.broadcast(weights.select(
            F.col(bucket_col).alias("__b"),
            F.col(weight_col).alias("__w"))),
        "__b", "left",
    )
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_toks"),
        F.sum(F.coalesce(F.col("__w"), F.lit(0.0))).alias("score"),
    )
