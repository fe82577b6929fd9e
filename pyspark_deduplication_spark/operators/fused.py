"""Fused lexical + semantic deduplication (batch and incremental).

The production composition a training pipeline actually runs: near-verbatim
copies (lexical signal — MinHash/LSH over shingle sets) AND paraphrased
re-encodings (semantic signal — cosine over embeddings) must BOTH collapse,
and they must collapse TOGETHER: a doc lexically tied to one neighbor and
semantically tied to another pulls all three into one component — the
transitive closure ACROSS signal types that running the two dedups
independently cannot produce (the batch query ``queries.fused_dedup_docs``
pins this coarsening property against a recursive-CTE oracle; this module
is its operator form plus the incremental/continuous-ingest twin).

Scale shape (everything here composes existing guarded operators):

- Lexical edges/probes ride the MinHash machinery — slim ``(id, band,
  bucket)`` shuffles, exact-Jaccard verification via id join-backs, the
  ``max_bucket_size`` clone-collapse + cap skew guard
  (``dedup.incremental_minhash_candidates``).
- Semantic edges/probes ride the SemDeDup machinery — literal-argmax cell
  assignment (zero shuffle), within-cell Arrow matmul pair kernels, the
  ``max_cell_size`` guard (``knn.incremental_semantic_dedup_candidates``).
- The fusion itself moves BARE id pairs only: one union, one
  pointer-doubling connected-components pass (O(log diameter) rounds).
- Both legs take their persisted train-once indexes
  (``build_minhash_index``, ``build_semantic_dedup_index``) so a
  continuous-ingest pipeline runs ZERO corpus-sized work per batch.

Reference anchor: the reference's whole program is single-signal fuzzy
dedup (``soulutionOne.py:41-72`` exact keys, ``solutionTwo.py:40-53``
name-similarity links); fusing independent similarity signals through one
closure is the engine extension a 100 TB curation pipeline needs (near-dup
families in Lee et al. 2022 and Abbas et al. 2023 are complementary, not
nested — each catches pairs the other scores near zero).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_deduplication_spark.functions.similarity import jaccard
from pyspark_deduplication_spark.operators.dedup import (
    incremental_minhash_candidates,
    minhash_candidate_pairs,
    minhash_signatures,
    weighted_jaccard_of,
    weighted_minhash_candidate_pairs,
    weighted_minhash_signatures,
)
from pyspark_deduplication_spark.operators.knn import (
    _semantic_hit_ids,
    incremental_semantic_dedup_candidates,
    semantic_dedup_edges,
)
from pyspark_deduplication_spark.operators.linkage import transitive_clusters


def fused_dedup_edges(
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_col: str = "embedding",
    jaccard_threshold: float = 0.7,
    cosine_threshold: float = 0.95,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    max_bucket_size: int | None = None,
    n_cells: int = 16,
    n_iter: int = 4,
    n_probe: int = 1,
    train_sample_mod: int = 1,
    max_cell_size: int | None = None,
    sigs: DataFrame | None = None,
    weighted_threshold: float | None = None,
    wsigs: DataFrame | None = None,
) -> DataFrame:
    """Distinct ``(id_a, id_b)`` near-dup edges within ``batch`` under
    ANY enabled signal: MinHash-blocked exact-Jaccard ≥
    ``jaccard_threshold`` on ``text_col`` ∪ cell-blocked cosine ≥
    ``cosine_threshold`` on ``vec_col`` ∪ (when ``weighted_threshold``
    is set) ICWS-blocked exact generalized Jaccard Σmin(tf)/Σmax(tf) ≥
    ``weighted_threshold`` on the same text — the third leg for
    boilerplate-repetition near-dups, where tf weighting fires on pairs
    whose SET Jaccard is near zero (shared mass in repeated grams, so
    neither other signal sees them). The batch carries both columns in
    one frame (the 1:1 documents ↔ embeddings id space).

    ``sigs``/``wsigs`` forward precomputed MinHash / ICWS signatures
    (see each ``*_candidate_pairs``); all guards (``max_bucket_size``,
    ``max_cell_size``) forward to their legs — the weighted leg shares
    the banding machinery and hence the same clone-collapse/cap guard.
    Only bare id pairs move through the union."""
    lex = minhash_candidate_pairs(
        batch, text_col, id_col, num_hashes, bands, shingle_size,
        max_bucket_size, sigs=sigs,
    ).filter(F.col("jaccard_sim") >= jaccard_threshold).select("id_a", "id_b")
    sem = semantic_dedup_edges(
        batch.select(F.col(id_col), F.col(vec_col)), cosine_threshold,
        n_cells, id_col, vec_col, n_iter, n_probe, train_sample_mod,
        max_cell_size,
    ).select("id_a", "id_b")
    edges = lex.unionByName(sem)
    if weighted_threshold is not None:
        wtd = weighted_minhash_candidate_pairs(
            batch, text_col, id_col, num_hashes, bands, shingle_size,
            max_bucket_size, sigs=wsigs,
        ).filter(F.col("weighted_jaccard_sim") >= weighted_threshold) \
            .select("id_a", "id_b")
        edges = edges.unionByName(wtd)
    return edges.dropDuplicates(["id_a", "id_b"])


def fused_dedup(
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_col: str = "embedding",
    jaccard_threshold: float = 0.7,
    cosine_threshold: float = 0.95,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    max_bucket_size: int | None = None,
    n_cells: int = 16,
    n_iter: int = 4,
    n_probe: int = 1,
    train_sample_mod: int = 1,
    max_cell_size: int | None = None,
    sigs: DataFrame | None = None,
    weighted_threshold: float | None = None,
    wsigs: DataFrame | None = None,
) -> DataFrame:
    """Fused dedup labelling for one batch: ``(id, component, keep)`` —
    one connected-components pass over the union edge set, min-id keep
    per fused component. The MinHash-leg twin of
    ``queries.fused_dedup_docs`` (which spells the lexical leg with the
    exact inverted-index join so its oracle stays deterministic); this
    operator form is the 100 TB spelling for all legs.
    ``weighted_threshold`` arms the optional third (tf-weighted ICWS)
    edge leg — see ``fused_dedup_edges``."""
    edges = fused_dedup_edges(
        batch, id_col, text_col, vec_col, jaccard_threshold,
        cosine_threshold, num_hashes, bands, shingle_size, max_bucket_size,
        n_cells, n_iter, n_probe, train_sample_mod, max_cell_size, sigs,
        weighted_threshold, wsigs,
    )
    clustered = transitive_clusters(batch.select(id_col), edges, id_col)
    return clustered.select(
        F.col(id_col),
        F.col("component"),
        (F.col(id_col) == F.col("component")).alias("keep"),
    )


def incremental_fused_dedup(
    new_batch: DataFrame,
    corpus: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_col: str = "embedding",
    jaccard_threshold: float = 0.7,
    cosine_threshold: float = 0.95,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    max_bucket_size: int | None = None,
    n_cells: int = 16,
    n_iter: int = 4,
    n_probe: int = 2,
    train_sample_mod: int = 1,
    max_cell_size: int | None = None,
    minhash_index: DataFrame | None = None,
    semantic_index: tuple[DataFrame, DataFrame] | None = None,
    weighted_threshold: float | None = None,
    weighted_index: DataFrame | None = None,
) -> DataFrame:
    """Fused near-dup filter for a NEW batch against an EXISTING corpus —
    the OR-composition of ``incremental_minhash_dedup`` and
    ``incremental_semantic_dedup``: a batch row drops if it near-matches
    ANY corpus row under EITHER signal (lexical Jaccard ≥
    ``jaccard_threshold`` via the LSH band probe, or cosine ≥
    ``cosine_threshold`` via the cell probe); survivors then collapse
    batch-internally through ONE fused connected-components pass
    (``fused_dedup``), so the returned frame is clean against
    corpus ∪ itself under the FUSED relation — append it (and its index
    entries) and the invariant holds for the next batch.

    The corpus never self-joins on either leg. In production both legs
    probe their persisted train-once artifacts — pass
    ``minhash_index=build_minhash_index(corpus)`` and
    ``semantic_index=build_semantic_dedup_index(corpus)`` and the
    ``corpus`` argument is never touched (it may be ``None``); without
    them the indexes derive from ``corpus`` per call (correct, but
    corpus-sized work per batch). Guards (``max_bucket_size``,
    ``max_cell_size``) forward to each leg's candidate machinery; when
    an index is passed its guard stages already ran at build time.

    Fusing the CORPUS probe is pure OR (drop if either leg hits), so leg
    independence is lossless there; fusing the BATCH-internal collapse
    uses the union edge graph, whose components coarsen both
    single-signal partitions (pinned for the batch operator in
    ``test_queries``' fused coarsening test, and for this path in
    ``test_fused.py``).

    ``weighted_threshold`` arms the optional third (tf-weighted ICWS)
    leg on both the corpus probe and the batch-internal collapse — the
    boilerplate-repetition signal the other two miss (see
    ``fused_dedup_edges``); ``weighted_index`` passes its persisted
    ``build_weighted_minhash_index`` table.

    Returns the surviving rows of ``new_batch`` (all columns)."""
    if corpus is None and (minhash_index is None or semantic_index is None):
        raise ValueError(
            "incremental_fused_dedup: corpus=None requires BOTH "
            "minhash_index and semantic_index")
    if (corpus is None and weighted_threshold is not None
            and weighted_index is None):
        raise ValueError(
            "incremental_fused_dedup: corpus=None with the weighted leg "
            "armed requires weighted_index")

    # -- lexical corpus probe (incremental_minhash_dedup's probe stage) --
    new_sigs = minhash_signatures(
        new_batch, text_col, id_col, num_hashes, shingle_size).persist()
    pre_collapsed = minhash_index is not None
    own_corpus_sigs = minhash_index is None
    corpus_sigs = minhash_index
    if corpus_sigs is None:
        # only frames derived HERE get persisted/unpersisted — a passed
        # minhash_index is caller-owned (the train-once reuse shape:
        # evicting it would force every later batch to rebuild the
        # corpus-sized signature cache; same lifecycle rule as
        # minhash_candidate_pairs' sigs= contract)
        corpus_sigs = minhash_signatures(
            corpus, text_col, id_col, num_hashes, shingle_size).persist()
    # eager: both frames are read by the band probe AND the shingle
    # join-back — see the fan-out race note in minhash_candidate_pairs
    new_sigs.count()
    if own_corpus_sigs:
        corpus_sigs.count()
    cand = incremental_minhash_candidates(
        new_sigs, corpus_sigs, id_col, num_hashes, bands, max_bucket_size,
        pre_collapsed)
    new_sh = new_sigs.select(F.col(id_col).alias("new_id"),
                             F.col("shingles").alias("sh_new"))
    corpus_sh = corpus_sigs.select(F.col(id_col).alias("corpus_id"),
                                   F.col("shingles").alias("sh_corpus"))
    lex_hits = (
        cand.join(new_sh, "new_id")
        .join(corpus_sh, "corpus_id")
        .filter(jaccard(F.col("sh_new"), F.col("sh_corpus"))
                >= jaccard_threshold)
        .select(F.col("new_id").alias(id_col))
        .distinct()
    )

    # -- semantic corpus probe (incremental_semantic_dedup's probe stage)
    sem_cand = incremental_semantic_dedup_candidates(
        new_batch.select(F.col(id_col), F.col(vec_col)),
        None if corpus is None
        else corpus.select(F.col(id_col), F.col(vec_col)),
        n_cells, id_col, vec_col, n_iter, n_probe, train_sample_mod,
        max_cell_size, semantic_index,
    )
    sem_hits = _semantic_hit_ids(sem_cand, cosine_threshold, id_col)
    all_hits = lex_hits.unionByName(sem_hits)

    # -- weighted corpus probe (incremental_weighted_minhash_dedup's
    # probe stage; shares the banded candidate machinery via
    # content_col="whashes") --------------------------------------------
    new_wsigs = None
    own_corpus_wsigs = False
    corpus_wsigs = weighted_index
    if weighted_threshold is not None:
        new_wsigs = weighted_minhash_signatures(
            new_batch, text_col, id_col, num_hashes, shingle_size).persist()
        w_pre_collapsed = weighted_index is not None
        own_corpus_wsigs = weighted_index is None
        if corpus_wsigs is None:
            corpus_wsigs = weighted_minhash_signatures(
                corpus, text_col, id_col, num_hashes,
                shingle_size).persist()
        new_wsigs.count()
        if own_corpus_wsigs:
            corpus_wsigs.count()
        wcand = incremental_minhash_candidates(
            new_wsigs, corpus_wsigs, id_col, num_hashes, bands,
            max_bucket_size, w_pre_collapsed, content_col="whashes")
        new_wh = new_wsigs.select(F.col(id_col).alias("new_id"),
                                  F.col("whashes").alias("wh_new"))
        corpus_wh = corpus_wsigs.select(F.col(id_col).alias("corpus_id"),
                                        F.col("whashes").alias("wh_corpus"))
        wtd_hits = (
            wcand.join(new_wh, "new_id")
            .join(corpus_wh, "corpus_id")
            .filter(weighted_jaccard_of(F.col("wh_new"),
                                        F.col("wh_corpus"))
                    >= weighted_threshold)
            .select(F.col("new_id").alias(id_col))
            .distinct()
        )
        all_hits = all_hits.unionByName(wtd_hits)

    # Materialize the bare hit-id set ONCE before it fans out into the
    # anti-joins below — without this, each eager localCheckpoint
    # re-executes the whole lexical AND semantic (AND weighted) corpus
    # probe (band join, Jaccard verify, cell assignment, Arrow cosine)
    # a second time; dup_ids is ids only, so the checkpoint is tiny.
    dup_ids = all_hits.distinct().localCheckpoint(eager=True)
    fresh = new_batch.join(dup_ids, id_col, "left_anti")
    # Materialize the survivor set before the fused self-collapse fans
    # out into the edge legs (and before releasing the signature caches).
    fresh = fresh.localCheckpoint(eager=True)
    dropped = dup_ids.withColumnRenamed(id_col, "__dropped")
    fresh_sigs = (
        new_sigs.join(dropped, new_sigs[id_col] == F.col("__dropped"),
                      "left_anti")
        .localCheckpoint(eager=True)
    )
    fresh_wsigs = None
    if new_wsigs is not None:
        fresh_wsigs = (
            new_wsigs.join(dropped,
                           new_wsigs[id_col] == F.col("__dropped"),
                           "left_anti")
            .localCheckpoint(eager=True)
        )
        new_wsigs.unpersist()
    if own_corpus_wsigs:
        corpus_wsigs.unpersist()
    new_sigs.unpersist()
    if own_corpus_sigs:
        corpus_sigs.unpersist()

    # -- batch-internal fused collapse ---------------------------------
    keep = fused_dedup(
        fresh, id_col, text_col, vec_col, jaccard_threshold,
        cosine_threshold, num_hashes, bands, shingle_size, max_bucket_size,
        n_cells, n_iter, 1, train_sample_mod, max_cell_size,
        sigs=fresh_sigs, weighted_threshold=weighted_threshold,
        wsigs=fresh_wsigs,
    ).filter(F.col("keep")).select(id_col)
    return fresh.join(keep, id_col, "left_semi")


def incremental_fused_match_pairs(
    new_batch: DataFrame,
    corpus: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_col: str = "embedding",
    jaccard_threshold: float = 0.7,
    cosine_threshold: float = 0.95,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    max_bucket_size: int | None = None,
    n_cells: int = 16,
    n_iter: int = 4,
    n_probe: int = 2,
    train_sample_mod: int = 1,
    max_cell_size: int | None = None,
    minhash_index: DataFrame | None = None,
    semantic_index: tuple[DataFrame, DataFrame] | None = None,
    weighted_threshold: float | None = None,
    weighted_index: DataFrame | None = None,
) -> DataFrame:
    """The PAIR-level fused corpus probe: distinct (new_id, corpus_id)
    rows for every batch doc that near-matches a corpus doc under ANY
    armed signal — exactly ``incremental_fused_dedup``'s probe stage
    with the ids kept instead of collapsed to a drop set. This is the
    primitive quality-aware SURVIVORSHIP needs (streaming keep-best:
    the decision is per matched corpus doc, so the probe cannot
    pre-aggregate), and it is independently useful as a streaming
    provenance/lineage report ("what did this batch collide with").

    Same index contracts as ``incremental_fused_dedup``: pass the
    persisted ``minhash_index`` / ``semantic_index`` /
    ``weighted_index`` artifacts and the ``corpus`` argument is never
    touched; guards forward to each leg's candidate machinery. The
    corpus never self-joins. The returned frame is eagerly
    materialized (ids only — tiny), so callers may fan it out freely.
    """
    if corpus is None and (minhash_index is None or semantic_index is None):
        raise ValueError(
            "incremental_fused_match_pairs: corpus=None requires BOTH "
            "minhash_index and semantic_index")
    if (corpus is None and weighted_threshold is not None
            and weighted_index is None):
        raise ValueError(
            "incremental_fused_match_pairs: corpus=None with the "
            "weighted leg armed requires weighted_index")

    new_sigs = minhash_signatures(
        new_batch, text_col, id_col, num_hashes, shingle_size).persist()
    pre_collapsed = minhash_index is not None
    own_corpus_sigs = minhash_index is None
    corpus_sigs = minhash_index
    if corpus_sigs is None:
        corpus_sigs = minhash_signatures(
            corpus, text_col, id_col, num_hashes, shingle_size).persist()
    new_sigs.count()
    if own_corpus_sigs:
        corpus_sigs.count()
    cand = incremental_minhash_candidates(
        new_sigs, corpus_sigs, id_col, num_hashes, bands, max_bucket_size,
        pre_collapsed)
    new_sh = new_sigs.select(F.col(id_col).alias("new_id"),
                             F.col("shingles").alias("sh_new"))
    corpus_sh = corpus_sigs.select(F.col(id_col).alias("corpus_id"),
                                   F.col("shingles").alias("sh_corpus"))
    pairs = (
        cand.join(new_sh, "new_id")
        .join(corpus_sh, "corpus_id")
        .filter(jaccard(F.col("sh_new"), F.col("sh_corpus"))
                >= jaccard_threshold)
        .select("new_id", "corpus_id")
    )

    sem_cand = incremental_semantic_dedup_candidates(
        new_batch.select(F.col(id_col), F.col(vec_col)),
        None if corpus is None
        else corpus.select(F.col(id_col), F.col(vec_col)),
        n_cells, id_col, vec_col, n_iter, n_probe, train_sample_mod,
        max_cell_size, semantic_index,
    )
    from pyspark_deduplication_spark.functions.vectors import (
        cosine_similarity_pd,
    )

    sem_pairs = (
        sem_cand.filter(
            cosine_similarity_pd(F.col("__nvec"), F.col("__cvec"))
            >= cosine_threshold)
        .select(F.col("__nid").alias("new_id"),
                F.col("__cid").alias("corpus_id"))
    )
    pairs = pairs.unionByName(sem_pairs)

    new_wsigs = None
    own_corpus_wsigs = False
    corpus_wsigs = weighted_index
    if weighted_threshold is not None:
        new_wsigs = weighted_minhash_signatures(
            new_batch, text_col, id_col, num_hashes, shingle_size).persist()
        w_pre_collapsed = weighted_index is not None
        own_corpus_wsigs = weighted_index is None
        if corpus_wsigs is None:
            corpus_wsigs = weighted_minhash_signatures(
                corpus, text_col, id_col, num_hashes,
                shingle_size).persist()
        new_wsigs.count()
        if own_corpus_wsigs:
            corpus_wsigs.count()
        wcand = incremental_minhash_candidates(
            new_wsigs, corpus_wsigs, id_col, num_hashes, bands,
            max_bucket_size, w_pre_collapsed, content_col="whashes")
        new_wh = new_wsigs.select(F.col(id_col).alias("new_id"),
                                  F.col("whashes").alias("wh_new"))
        corpus_wh = corpus_wsigs.select(F.col(id_col).alias("corpus_id"),
                                        F.col("whashes").alias("wh_corpus"))
        wtd_pairs = (
            wcand.join(new_wh, "new_id")
            .join(corpus_wh, "corpus_id")
            .filter(weighted_jaccard_of(F.col("wh_new"),
                                        F.col("wh_corpus"))
                    >= weighted_threshold)
            .select("new_id", "corpus_id")
        )
        pairs = pairs.unionByName(wtd_pairs)

    # eager ids-only materialization BEFORE releasing the signature
    # caches (the dup_ids discipline in incremental_fused_dedup)
    out = pairs.distinct().localCheckpoint(eager=True)
    if new_wsigs is not None:
        new_wsigs.unpersist()
    if own_corpus_wsigs:
        corpus_wsigs.unpersist()
    new_sigs.unpersist()
    if own_corpus_sigs:
        corpus_sigs.unpersist()
    return out
