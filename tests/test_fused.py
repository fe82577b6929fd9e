"""Fused lexical+semantic dedup — operator-form ground truth.

The batch query (`queries.fused_dedup_docs`) is oracle-backed; these tests
pin the OPERATOR family in `operators/fused.py`: the fused batch collapse
(MinHash lexical leg + SemDeDup semantic leg through one CC pass), the
incremental OR-probe against a standing corpus, and the persisted-index
path equivalence.
"""

from __future__ import annotations

import numpy as np
import pytest


def _sentence(prefix: str, n: int = 30) -> str:
    return " ".join(f"{prefix}w{i}" for i in range(n))


def _variant(text: str, pos: int = 15) -> str:
    """One middle token replaced — 3-gram Jaccard ≈ 0.8 ≥ 0.7, and the
    64/16 LSH banding deterministically collides on the shared bands."""
    toks = text.split()
    toks[pos] = toks[pos] + "x"
    return " ".join(toks)


@pytest.fixture(scope="module")
def fused_fixture(spark):
    rng = np.random.RandomState(7)
    centers = rng.standard_normal((8, 12)) * 5

    corpus_rows = []
    for d in range(8):
        vec = centers[d] + rng.standard_normal(12) * 0.2
        corpus_rows.append((d, _sentence(f"c{d}"), [float(x) for x in vec]))

    far = [  # mutually far-apart novel vectors
        [float(x) for x in rng.standard_normal(12) * 50]
        for _ in range(4)
    ]
    chain_vec = [float(x) for x in centers[2] * 3 + 40.0]
    batch_rows = [
        # text near-copies corpus doc 0, vector novel → LEXICAL drop
        (100, _variant(corpus_rows[0][1]), far[0]),
        # text novel, vector ≈ corpus doc 3 → SEMANTIC drop
        (101, _sentence("b101"), [x * 1.0005 for x in corpus_rows[3][2]]),
        # fused chain: 102 ~lex~ 103 (near-identical text, far vectors),
        # 103 ~sem~ 104 (near-identical vector, unrelated text)
        (102, _sentence("chain"), far[1]),
        (103, _variant(_sentence("chain")), chain_vec),
        (104, _sentence("b104"), [x * 1.0004 for x in chain_vec]),
        # fully novel → keep
        (105, _sentence("b105"), far[2]),
    ]
    schema = "doc_id long, text string, embedding array<float>"
    return (spark.createDataFrame(corpus_rows, schema),
            spark.createDataFrame(batch_rows, schema))


def test_fused_dedup_transitive_across_signals(spark, fused_fixture):
    """102 is lexically tied to 103 and 103 semantically tied to 104 —
    one fused component, min-id keep; neither single signal alone links
    102 to 104."""
    from pyspark_deduplication_spark.operators.fused import fused_dedup

    _, batch = fused_fixture
    sub = batch.filter("doc_id >= 102")
    out = fused_dedup(sub, jaccard_threshold=0.7, cosine_threshold=0.999,
                      n_cells=2).collect()
    comp = {r.doc_id: r.component for r in out}
    keep = sorted(r.doc_id for r in out if r.keep)
    assert comp[103] == 102 and comp[104] == 102, comp
    assert keep == [102, 105], keep


def test_incremental_fused_drops_and_keeps(spark, fused_fixture):
    """A batch row drops on EITHER probe hit (lexical 100, semantic 101);
    survivors collapse through the fused component (103/104 fold into
    102); the novel row survives; corpus rows are never returned."""
    from pyspark_deduplication_spark.operators.fused import (
        incremental_fused_dedup,
    )

    corpus, batch = fused_fixture
    out = incremental_fused_dedup(
        batch, corpus, jaccard_threshold=0.7, cosine_threshold=0.999,
        n_cells=2,
    )
    assert sorted(r.doc_id for r in out.collect()) == [102, 105]
    # all columns of the surviving rows come back intact
    assert set(out.columns) == {"doc_id", "text", "embedding"}


def test_incremental_fused_with_persisted_indexes(spark, fused_fixture):
    """The production shape: both train-once indexes persisted, the
    corpus argument never touched — identical survivors."""
    from pyspark_deduplication_spark.operators.dedup import (
        build_minhash_index,
    )
    from pyspark_deduplication_spark.operators.fused import (
        incremental_fused_dedup,
    )
    from pyspark_deduplication_spark.operators.knn import (
        build_semantic_dedup_index,
    )

    corpus, batch = fused_fixture
    mh_idx = build_minhash_index(corpus, "text", "doc_id")
    sem_idx = build_semantic_dedup_index(
        corpus.select("doc_id", "embedding"), n_cells=2,
        vec_id="doc_id", vec_col="embedding")
    out = incremental_fused_dedup(
        batch, corpus=None, jaccard_threshold=0.7, cosine_threshold=0.999,
        n_cells=2, minhash_index=mh_idx, semantic_index=sem_idx,
    )
    assert sorted(r.doc_id for r in out.collect()) == [102, 105]


def test_incremental_fused_requires_corpus_or_indexes(spark, fused_fixture):
    from pyspark_deduplication_spark.operators.fused import (
        incremental_fused_dedup,
    )

    _, batch = fused_fixture
    with pytest.raises(ValueError, match="requires BOTH"):
        incremental_fused_dedup(batch, corpus=None)


def _repetitive(tail_prefix: str, n_rep: int = 30, n_tail: int = 10) -> str:
    """Boilerplate-repetition text: a repeated 3-word block (high-tf
    shingles, tiny DISTINCT shingle set) plus a unique tail. Two docs
    sharing the block but not the tail have SET 3-gram Jaccard far
    below 0.7 while generalized (tf-weighted) Jaccard stays high —
    the pair class only the weighted leg can see."""
    block = "lorem ipsum boiler " * n_rep
    tail = " ".join(f"{tail_prefix}t{i}" for i in range(n_tail))
    return (block + tail).strip()


def test_fused_weighted_leg_catches_repetition_pairs(spark):
    """A repetition pair (shared high-tf block, disjoint tails,
    orthogonal vectors) survives the two-signal fused collapse but
    folds into one component when weighted_threshold arms the third
    leg — and the novel doc is untouched either way."""
    from pyspark_deduplication_spark.operators.fused import fused_dedup

    rows = [
        (1, _repetitive("a"), [1.0, 0.0, 0.0, 0.0]),
        (2, _repetitive("b"), [0.0, 1.0, 0.0, 0.0]),
        (3, _sentence("novel"), [0.0, 0.0, 1.0, 0.0]),
    ]
    schema = "doc_id long, text string, embedding array<float>"
    batch = spark.createDataFrame(rows, schema)

    two_signal = fused_dedup(
        batch, jaccard_threshold=0.7, cosine_threshold=0.999, n_cells=2)
    assert sorted(r.doc_id for r in two_signal.collect() if r.keep) \
        == [1, 2, 3]

    three_signal = fused_dedup(
        batch, jaccard_threshold=0.7, cosine_threshold=0.999, n_cells=2,
        weighted_threshold=0.5)
    out = {r.doc_id: (r.component, r.keep)
           for r in three_signal.collect()}
    assert out[2][0] == 1 and not out[2][1], out
    assert out[1][1] and out[3][1], out


def test_incremental_fused_weighted_probe_drops_corpus_repetition(spark):
    """Incremental three-signal probe: a batch doc tf-near an existing
    corpus doc (set-Jaccard low, vectors orthogonal) drops ONLY when
    the weighted leg is armed; with the leg armed the novel batch doc
    still survives. Also pinned: the persisted weighted index path
    admits exactly the same survivors as deriving from the corpus."""
    from pyspark_deduplication_spark.operators.dedup import (
        build_minhash_index,
        build_weighted_minhash_index,
    )
    from pyspark_deduplication_spark.operators.fused import (
        incremental_fused_dedup,
    )
    from pyspark_deduplication_spark.operators.knn import (
        build_semantic_dedup_index,
    )

    schema = "doc_id long, text string, embedding array<float>"
    corpus = spark.createDataFrame(
        [(1, _repetitive("c1"), [1.0, 0.0, 0.0, 0.0]),
         (2, _sentence("c2"), [0.0, 1.0, 0.0, 0.0])], schema)
    batch = spark.createDataFrame(
        [(10, _repetitive("x"), [0.0, 0.0, 1.0, 0.0]),   # tf-near doc 1
         (11, _sentence("fresh"), [0.0, 0.0, 0.0, 1.0])], schema)

    kw = dict(jaccard_threshold=0.7, cosine_threshold=0.999, n_cells=2)
    two = incremental_fused_dedup(batch, corpus, **kw)
    assert sorted(r.doc_id for r in two.collect()) == [10, 11]

    three = incremental_fused_dedup(
        batch, corpus, weighted_threshold=0.5, **kw)
    assert sorted(r.doc_id for r in three.collect()) == [11]

    # persisted-index path: same admission decision, corpus untouched
    mh = build_minhash_index(corpus).localCheckpoint()
    sem = build_semantic_dedup_index(corpus.select("doc_id", "embedding"),
                                     n_cells=2, vec_id="doc_id")
    w = build_weighted_minhash_index(corpus).localCheckpoint()
    via_index = incremental_fused_dedup(
        batch, corpus=None, minhash_index=mh, semantic_index=sem,
        weighted_threshold=0.5, weighted_index=w, **kw)
    assert sorted(r.doc_id for r in via_index.collect()) == [11]


def test_incremental_fused_match_pairs_names_the_matches(spark,
                                                         fused_fixture):
    """The pair-level probe returns exactly WHO matched WHAT: batch
    100 names corpus 0 (lexical), batch 101 names corpus 3
    (semantic), nothing else pairs, and the distinct new_id set
    equals the set incremental_fused_dedup drops in its probe stage
    — the consistency contract that lets quality-aware survivorship
    substitute the pair probe for the drop probe."""
    from pyspark_deduplication_spark.operators.fused import (
        incremental_fused_match_pairs,
    )

    corpus, batch = fused_fixture
    pairs = incremental_fused_match_pairs(
        batch, corpus, jaccard_threshold=0.7, cosine_threshold=0.999,
        n_cells=2)
    got = sorted((r.new_id, r.corpus_id) for r in pairs.collect())
    assert got == [(100, 0), (101, 3)], got
    # and through the persisted-index production shape
    from pyspark_deduplication_spark.operators.dedup import (
        build_minhash_index,
    )
    from pyspark_deduplication_spark.operators.knn import (
        build_semantic_dedup_index,
    )

    mh_idx = build_minhash_index(corpus, "text", "doc_id")
    sem_idx = build_semantic_dedup_index(
        corpus.select("doc_id", "embedding"), n_cells=2,
        vec_id="doc_id", vec_col="embedding")
    got2 = sorted((r.new_id, r.corpus_id)
                  for r in incremental_fused_match_pairs(
                      batch, corpus=None, jaccard_threshold=0.7,
                      cosine_threshold=0.999, n_cells=2,
                      minhash_index=mh_idx,
                      semantic_index=sem_idx).collect())
    assert got2 == got, got2
