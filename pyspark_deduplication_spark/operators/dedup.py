"""Deduplication operators — the engine's namesake (SURVEY.md §2.5).

Exact family (reference parity):
- ``dedup_exact``      ≙ ``dropDuplicates(keys)``  (``soulutionOne.py:41``)
- ``dedup_full_row``   ≙ ``dropDuplicates()``      (``DAG/sample.py:41``)
- ``dedup_keep_first`` deterministic keep-one via ``row_number() = 1`` —
  the testable spelling of A1 (the reference keeps an *arbitrary* row,
  which cannot be oracle-checked; SURVEY §5 normalization rule).
- ``with_surrogate_id`` ≙ ``monotonically_increasing_id``
  (``soulutionOne.py:44``) with a deterministic ``row_number`` variant.

Near-duplicate family (training-data-pipeline extensions):
- ``dedup_fingerprint``        md5-of-normalized-text exact-content dedup
- ``minhash_candidate_pairs``  MinHash + LSH banding, all native exprs
- ``minhash_dedup``            LSH candidates → Jaccard verify → connected
  components → keep one doc per near-dup cluster
- ``simhash_dedup``            64-bit SimHash + Hamming-ball grouping

Scale notes: every operator here is a shuffle-on-key hash aggregation or
an equi-join on a derived blocking key — no cross products anywhere. The
MinHash path turns O(n²) pair generation into O(candidates) via banding:
at 100 TB the band-key join shuffles only (band_id, signature-slice) keys,
and AQE's skew-join splitting handles hot buckets (e.g. boilerplate docs).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark_deduplication_spark.functions.similarity import jaccard
from pyspark_deduplication_spark.functions.text import (
    doc_fingerprint,
    normalize_text,
    tokenize,
    word_ngrams,
    word_ngrams_of,
)


def dedup_exact(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Keep one arbitrary row per key tuple (reference semantics).
    ``keys=None`` → full-row dedup (A2)."""
    return df.dropDuplicates(keys) if keys else df.dropDuplicates()


def dedup_full_row(df: DataFrame) -> DataFrame:
    return df.distinct()


def dedup_keep_first(
    df: DataFrame, keys: list[str], order_by: list[str | Column]
) -> DataFrame:
    """Deterministic dedup: keep the first row per key under an explicit
    tiebreak order.

    Implemented as ``min_by(struct(*), struct(order))`` — a hash aggregate
    with map-side partial merge, so each shuffle partition receives one
    candidate row per (key, mapper) instead of every duplicate. The
    equivalent ``row_number() = 1`` window needs a full sort of every
    duplicate group post-shuffle; at 100 TB with hot keys that sort is the
    bottleneck, while min_by degrades gracefully (the combine is O(1) per
    row). Order keys must be non-null for well-defined struct ordering.
    """
    order_cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    winner = F.min_by(
        F.struct(*[F.col(c) for c in df.columns]), F.struct(*order_cols)
    ).alias("__row")
    return (
        df.groupBy(*[F.col(k) for k in keys])
        .agg(winner)
        .select("__row.*")
    )


def with_surrogate_id(
    df: DataFrame,
    id_col: str = "id",
    deterministic_order: list[str] | None = None,
    scalable: bool = False,
) -> DataFrame:
    """Surrogate key assignment (reference ``soulutionOne.py:44``).

    - Default: ``monotonically_increasing_id`` — zero-shuffle, unique, but
      non-contiguous and run-dependent.
    - ``deterministic_order``: contiguous 1-based ids in a total order.
      The plain spelling (``row_number`` over an unpartitioned window)
      funnels everything through ONE task — fine for final small outputs,
      fatal at scale. ``scalable=True`` switches to distributed sort +
      ``zipWithIndex``: the sort is cluster-wide (range-partitioned) and
      the index needs only one extra tiny job to count per-partition rows.
    """
    if not deterministic_order:
        return df.withColumn(id_col, F.monotonically_increasing_id())
    if not scalable:
        w = Window.orderBy(*deterministic_order)
        return df.withColumn(id_col, F.row_number().over(w).cast("long"))

    sorted_df = df.sort(*deterministic_order)
    schema = sorted_df.schema
    indexed = sorted_df.rdd.zipWithIndex().map(
        lambda pair: (*pair[0], pair[1] + 1)
    )
    out_schema = schema.add(id_col, "long", False)
    return df.sparkSession.createDataFrame(indexed, out_schema)


def dedup_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-content dedup for documents: group by md5(normalized text),
    keep the row with the smallest id. One hash-shuffle; the md5 key is
    16 bytes regardless of document size, so the shuffle stays narrow at
    100 TB (only id + fingerprint move if the caller projects first)."""
    fp = doc_fingerprint(F.col(text_col))
    return dedup_keep_first(
        df.withColumn("fingerprint", fp), ["fingerprint"], [id_col]
    )


def merge_upsert(
    base: DataFrame, changes: DataFrame, keys: list[str]
) -> DataFrame:
    """Batch MERGE-INTO emulation (upsert): rows from ``changes`` replace
    base rows with the same key; new keys append. Without a transactional
    table format this is the standard anti-join + union rewrite: the base
    keeps only keys absent from changes, then changes come in wholesale.
    One broadcast-or-shuffle hash join — no per-row driver logic."""
    survivors = base.join(changes.select(*keys).distinct(), keys, "left_anti")
    return survivors.unionByName(changes)


def incremental_dedup(
    new_docs: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental ingestion dedup: drop new documents whose normalized
    content fingerprint already exists in the corpus OR duplicates another
    new document (keep min id within the batch). The corpus side reduces
    to a set of 16-byte fingerprints — at 100 TB that projection is what
    shuffles (or broadcasts), never the documents."""
    fp = doc_fingerprint(F.col(text_col))
    new_fp = new_docs.withColumn("fingerprint", fp)
    corpus_fp = corpus.select(fp.alias("fingerprint")).distinct()
    fresh = new_fp.join(corpus_fp, "fingerprint", "left_anti")
    return dedup_keep_first(fresh, ["fingerprint"], [id_col]).drop("fingerprint")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def _minhash_signature(shingles: Column, num_hashes: int) -> Column:
    """MinHash signature as ``array<bigint>`` of length ``num_hashes``.

    Hash function family: ``xxhash64(seed_i, shingle)`` — mixing a
    distinct literal seed per function through xxhash64 gives independent
    64-bit hash functions entirely JVM-side (no Python, no MLlib vector
    conversion). ``array_min`` over the transformed shingle array is the
    row-local min — MinHash needs no shuffle at all to compute signatures.
    """
    mins = [
        F.array_min(F.transform(shingles, lambda s, i=i: F.xxhash64(F.lit(i), s)))
        for i in range(num_hashes)
    ]
    return F.array(*mins)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_size: int = 3,
) -> DataFrame:
    """(id, shingles, signature) — the signature stage of MinHash dedup.

    Two separate projections on purpose: shingling (normalize + split +
    n-gram + distinct) is expensive, and the signature references it 64
    times. Computing the signature from the *materialized* ``shingles``
    column lets Catalyst's CollapseProject duplication check keep the
    shingle expression evaluated once per row instead of 64 times (a
    measured 40× difference at sf0.1). Entirely row-local — zero shuffle.
    """
    # Empty-doc guard on the RAW column: it pushes down to the parquet
    # scan. Filtering on size(shingles) instead would sit between the
    # shingle and signature projections and defeat Catalyst's expensive-
    # expression reuse — measured 4.5× slower (the shingle expression gets
    # inlined into all 64 signature slots).
    tokenized = df.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col), tokenize(F.col(text_col)).alias("__toks")
    )
    shingled = tokenized.select(
        F.col(id_col),
        word_ngrams_of(F.col("__toks"), shingle_size).alias("shingles"),
    )
    return shingled.withColumn(
        "signature", _minhash_signature(F.col("shingles"), num_hashes)
    )


def minhash_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` bands of
    ``num_hashes/bands`` rows; docs sharing any band hash become a
    candidate pair. Returns distinct (id_a, id_b, jaccard_sim) with
    id_a < id_b, Jaccard computed exactly on the shingle sets.

    Plan shape: signatures (narrow, zero-shuffle) → explode to compact
    (id, band, bucket) keys → self-equi-join on (band, bucket) → distinct
    id pairs → join the shingle sets back by id → exact verify. Only ids
    and 8-byte band keys ever shuffle for the join; the wide shingle
    arrays move only for the (few) surviving candidate pairs. A band
    shared by m docs yields m² candidates; boilerplate-heavy corpora
    should pre-filter with ``dedup_fingerprint`` (removes exact clones,
    the usual source of mega-buckets), and AQE skew-join splits the rest.

    ``max_bucket_size``: hard skew guard for 100 TB corpora — buckets with
    more members are dropped before the self-join (m² suppression). Docs
    in an oversized bucket almost always collide in several OTHER, smaller
    buckets too (b bands = b independent chances), so recall loss is
    marginal while the worst-case join cost becomes bounded. None = off.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_size)
    # One pass computes shingles + signatures; both the band join and the
    # verify join-back reuse it. At cluster scale this would be a persisted
    # intermediate table; locally an eager checkpoint plays that role and
    # keeps the O(expensive-shingling) work single-execution.
    sigs = sigs.persist()

    banded = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(
                        F.lit(b),
                        F.concat_ws(
                            ",",
                            *[
                                F.col("signature")[b * rows_per_band + r].cast("string")
                                for r in range(rows_per_band)
                            ],
                        ),
                    ).alias("bucket"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select(id_col, "bk.band", "bk.bucket")

    if max_bucket_size is not None:
        w = Window.partitionBy("band", "bucket")
        banded = (
            banded.withColumn("__bsz", F.count(F.lit(1)).over(w))
            .filter(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )

    left = banded.alias("a")
    right = banded.alias("b")
    pairs = (
        left.join(
            right,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    shingle_sets = sigs.select(F.col(id_col), F.col("shingles"))
    out = (
        pairs.join(shingle_sets.withColumnRenamed(id_col, "id_a")
                   .withColumnRenamed("shingles", "sh_a"), "id_a")
        .join(shingle_sets.withColumnRenamed(id_col, "id_b")
              .withColumnRenamed("shingles", "sh_b"), "id_b")
        .select("id_a", "id_b",
                jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard_sim"))
    )
    # Materialize the result before releasing the cached signatures: a
    # long-lived session running the whole catalog (the driver does)
    # would otherwise accumulate cached blocks across invocations.
    out = out.localCheckpoint(eager=True)
    sigs.unpersist()
    return out


def ngram_index_pairs(
    shingled: DataFrame,
    id_col: str = "doc_id",
    grams_col: str = "grams",
    prefix_jaccard: float | None = None,
) -> DataFrame:
    """EXACT candidate pairs via an inverted index — the scale-safe
    replacement for the O(n²) ``a.id < b.id`` cross self-join.

    Any pair with ≥1 shared shingle appears exactly once in the output
    (distinct ``id_a < id_b``); pairs sharing nothing have Jaccard and
    overlap 0 and can never pass a positive threshold, so downstream
    exact verification loses NOTHING vs all-pairs. The join is an
    equi-join on the shingle (posting lists), so there is no
    BroadcastNestedLoop/Cartesian anywhere and cost is Σ_g m_g² over
    per-shingle posting sizes, not n².

    ``prefix_jaccard``: optional prefix filter (Chaudhuri et al. /
    Bayardo SSJoin; Vernica et al. for the MapReduce formulation) — for
    a Jaccard threshold t, two sets can only reach J ≥ t if their
    rare-first prefixes of length ``|x| - ceil(t·|x|) + 1`` intersect
    under one global (frequency, gram) order. Shrinks posting lists
    drastically while staying EXACT for Jaccard ≥ t. Leave None for
    metrics without a per-set prefix bound (e.g. overlap coefficient,
    whose denominator is min(|a|,|b|)).
    """
    posting = shingled.select(
        F.col(id_col), F.explode(F.col(grams_col)).alias("gram"))
    if prefix_jaccard is not None:
        t = float(prefix_jaccard)
        freq = posting.groupBy("gram").agg(F.count(F.lit(1)).alias("__df"))
        w = Window.partitionBy(id_col).orderBy("__df", "gram")
        posting = (
            posting.join(freq, "gram")
            .withColumn("__rn", F.row_number().over(w))
            .withColumn("__n", F.count(F.lit(1)).over(Window.partitionBy(id_col)))
            .filter(F.col("__rn")
                    <= F.col("__n") - F.ceil(F.lit(t) * F.col("__n")) + 1)
            .select(id_col, "gram")
        )
    a = posting.select(F.col(id_col).alias("id_a"), "gram")
    b = posting.select(F.col(id_col).alias("id_b"), "gram")
    return (
        a.join(b, "gram")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_size: int = 3,
) -> DataFrame:
    """Near-duplicate removal: LSH candidates → exact-Jaccard verify at
    ``threshold`` → connected components over the surviving pair graph →
    keep the min-id doc per component. Returns the deduplicated frame."""
    from pyspark_deduplication_spark.operators.linkage import connected_components

    edges = minhash_candidate_pairs(
        df, text_col, id_col, num_hashes, bands, shingle_size
    ).filter(F.col("jaccard_sim") >= threshold)
    comps = connected_components(edges, "id_a", "id_b")  # (node, component)
    losers = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 64


@F.pandas_udf(T.LongType())
def _simhash64(tokens: pd.Series) -> pd.Series:
    """64-bit SimHash over token arrays (Arrow-batched NumPy kernel).

    Per token: a stable 64-bit hash (blake2b-derived, seed-free so rows
    are independent); per bit position: sum of ±1 votes across tokens;
    sign → bit. NumPy does the 64-lane vote accumulation per batch —
    this is the genuinely non-SQL-expressible hot kernel, hence the one
    pandas_udf in the dedup family.
    """
    import hashlib

    import numpy as np

    def h64(tok: str) -> int:
        return int.from_bytes(
            hashlib.blake2b(tok.encode("utf-8"), digest_size=8).digest(), "big"
        )

    out = []
    shifts = np.arange(_SIMHASH_BITS, dtype=np.uint64)
    for toks in tokens:
        if toks is None or len(toks) == 0:
            out.append(0)
            continue
        hs = np.fromiter((h64(t) for t in toks), dtype=np.uint64, count=len(toks))
        bits = (hs[:, None] >> shifts[None, :]) & np.uint64(1)  # (n_tok, 64)
        votes = bits.sum(axis=0) * 2 - len(toks)
        sig = np.uint64(0)
        for b in np.nonzero(votes > 0)[0]:
            sig |= np.uint64(1) << np.uint64(b)
        out.append(int(np.int64(sig)))
    return pd.Series(out, dtype="int64")


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    return df.select(
        F.col(id_col), _simhash64(tokenize(F.col(text_col))).alias("simhash")
    )


def simhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """SimHash near-dup removal.

    Pigeonhole blocking: split the 64-bit signature into ``blocks``
    16-bit chunks; any pair within Hamming distance < ``blocks`` must
    agree on at least one chunk, so an equi-join per chunk finds all
    candidates without a cross product. Verify with native
    ``bit_count(a XOR b) <= max_hamming``, cluster, keep min id.
    """
    from pyspark_deduplication_spark.operators.linkage import connected_components

    assert max_hamming < blocks, "pigeonhole needs max_hamming < blocks"
    width = _SIMHASH_BITS // blocks
    sigs = simhash_signatures(df, text_col, id_col)
    chunked = sigs.select(
        id_col,
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("chunk_id"),
                    F.shiftright("simhash", i * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("chunk"),
                )
                for i in range(blocks)
            ])
        ).alias("c"),
    ).select(id_col, "simhash", "c.chunk_id", "c.chunk")

    a, b = chunked.alias("a"), chunked.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))) <= max_hamming)
        .select("id_a", "id_b")
    )
    comps = connected_components(edges, "id_a", "id_b")
    losers = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")
