"""Similarity search: brute-force vs NumPy oracle, IVF recall."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pyspark_deduplication_spark.operators.knn import (
    brute_force_knn,
    embedding_near_dup_pairs,
    ivf_knn,
)


def _load(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _numpy_topk(vecs: dict[int, np.ndarray], qids: list[int], k: int):
    ids = sorted(vecs)
    mat = np.stack([vecs[i] for i in ids])
    norms = np.linalg.norm(mat, axis=1)
    out = {}
    for q in qids:
        sims = mat @ vecs[q] / (norms * np.linalg.norm(vecs[q]))
        order = sorted(
            (i for i in ids if i != q),
            key=lambda i: (-sims[ids.index(i)], i),
        )
        out[q] = order[:k]
    return out


def test_brute_force_matches_numpy(spark, sf_dir):
    emb = _load(spark, sf_dir)
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in emb.collect()}
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    got = brute_force_knn(emb, queries, k=5).collect()
    by_q: dict[int, list[int]] = {}
    for r in sorted(got, key=lambda r: (r.query_id, r.rank)):
        by_q.setdefault(r.query_id, []).append(r.neighbor_id)
    expected = _numpy_topk(vecs, list(range(5)), 5)
    assert by_q == expected


def test_ivf_recall_against_brute_force(spark, sf_dir):
    emb = _load(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    bf = brute_force_knn(emb, queries, k=5).collect()
    approx = ivf_knn(emb, queries, k=5, n_cells=8, n_probe=4).collect()
    truth = {(r.query_id, r.neighbor_id) for r in bf}
    got = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.5, f"IVF recall {recall} too low for n_probe=4/8"
    # probing ALL cells must be exact
    exact = ivf_knn(emb, queries, k=5, n_cells=8, n_probe=8).collect()
    assert {(r.query_id, r.neighbor_id) for r in exact} == truth


def test_near_dup_pairs_canonical_and_thresholded(spark, sf_dir):
    emb = _load(spark, sf_dir)
    rows = embedding_near_dup_pairs(emb, threshold=0.3,
                                    block_col="label").collect()
    assert rows, "expected some pairs at 0.3 within labels"
    assert all(r.id_a < r.id_b for r in rows)
    assert all(r.cosine_sim >= 0.3 for r in rows)


def test_broadcast_knn_plan(spark, sf_dir):
    from pyspark_deduplication_spark.plans.inspect import explain_str

    emb = _load(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    plan = explain_str(brute_force_knn(emb, queries, k=5))
    # queries must broadcast; the big vector side must not shuffle for the join
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
