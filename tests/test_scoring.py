"""Feature-hashed linear scoring: expression path vs weight-table path."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_deduplication_spark.functions.scoring import (
    N_BUCKETS,
    bucket_weight,
    hashed_linear_score,
    score_with_weight_table,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "spark shuffles data between executors during wide stages"),
    (2, "aaa bbb ccc aaa bbb aaa"),
    (3, ""),
]


def test_weight_table_path_matches_expression_path(spark):
    """Inference against a materialized (bucket, weight) table — the
    trained-model path — must reproduce the in-expression demo weights
    exactly: same buckets, same exact-in-binary sums."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    buckets = spark.createDataFrame(
        [(format(i, "02x"),) for i in range(N_BUCKETS)], "bucket string"
    ).select("bucket", bucket_weight(F.col("bucket")).alias("weight"))

    via_expr = {r.doc_id: (r.n_toks, r.score)
                for r in hashed_linear_score(df).collect()}
    via_table = {r.doc_id: (r.n_toks, r.score)
                 for r in score_with_weight_table(df, buckets).collect()}
    assert via_expr == via_table
    # blank doc contributes no tokens → absent from both
    assert 3 not in via_expr


def test_scores_are_partition_order_invariant(spark):
    """Weights are exact multiples of 1/16, so the double sum is
    order-independent — repartitioning cannot move a score."""
    df = spark.createDataFrame(DOCS * 10, "doc_id long, text string")
    a = {(r.doc_id, r.score) for r in
         hashed_linear_score(df.repartition(1)).collect()}
    b = {(r.doc_id, r.score) for r in
         hashed_linear_score(df.repartition(17)).collect()}
    assert a == b


def test_band_thresholds(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    for r in hashed_linear_score(df).collect():
        want = "high" if r.score >= 1.0 else ("mid" if r.score >= -1.0
                                              else "low")
        assert r.band == want
