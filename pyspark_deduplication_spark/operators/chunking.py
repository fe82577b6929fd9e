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

from pyspark_deduplication_spark.functions.text import (
    tokenize,
    word_ngrams_all_of,
)


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


def pack_sequences(
    chunks: DataFrame,
    len_col: str = "chunk_n_tokens",
    order_cols: list[str] | None = None,
    context_len: int = 2048,
    n_streams: int = 32,
    stream_key: str = "doc_id",
    stream_expr=None,
) -> DataFrame:
    """Assign chunks to fixed-length training sequences (GPT-style
    packing: concatenate the token stream, cut every ``context_len``).

    Scale shape: a single global stream would force one sort partition,
    so the corpus is split into ``n_streams`` hash-bucketed streams
    (all chunks of a document stay in one stream); each stream packs
    independently with a window cumulative sum. Emits ``stream``,
    ``pack_id`` (bin within stream), ``pack_offset`` (the chunk's token
    start within its pack) and a ``straddles`` flag for chunks cut by a
    pack boundary. ``stream_expr`` overrides the default murmur3-hash
    stream assignment (e.g. a modulo for cross-engine reproducibility).
    """
    order_cols = order_cols or ["doc_id", "chunk_index"]
    from pyspark.sql import Window

    stream = (stream_expr if stream_expr is not None
              else F.abs(F.hash(F.col(stream_key))) % n_streams).alias("stream")
    staged = chunks.select("*", stream)
    w = (Window.partitionBy("stream").orderBy(*order_cols)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum(F.col(len_col)).over(w)
    start = (cum - F.col(len_col)).alias("__start")
    out = staged.select("*", start)
    return (
        out.withColumn("pack_id",
                       F.floor(F.col("__start") / context_len).cast("long"))
        .withColumn("pack_offset",
                    (F.col("__start") % context_len).cast("long"))
        .withColumn(
            "straddles",
            (F.col("pack_offset") + F.col(len_col)) > F.lit(context_len))
        .drop("__start")
    )


def remove_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span: int = 50,
    hash_grams: bool = False,
) -> DataFrame:
    """ExactSubstr-style duplicated-span REMOVAL (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", §4.2):
    where ``doc_dup_span_fraction`` only *measures* span-level dup
    pressure, this removes the duplicated spans and reassembles the
    cleaned text — the step ExactSubstr deduplication actually performs.

    Token-window semantics: a token position is COVERED when any
    ``span``-token window containing it also occurs in at least one
    OTHER document; covered tokens are removed from EVERY occurrence
    (the released deduplicate-text-datasets tool likewise removes all
    copies of a duplicated span, not all-but-one) and each document's
    survivors re-join in order. Two documented deviations from the
    suffix-array tool: granularity is the engine's whitespace token
    stream, not bytes, and "duplicated" means cross-document
    (df ≥ 2 over distinct docs, matching ``doc_dup_span_fraction``),
    not within-document repeats. Documents shorter than ``span`` tokens
    form one whole-doc window, so exact short clones erase each other.

    Returns ``(id, n_tokens, n_kept, clean_text)`` — blank documents
    pass through as (0, 0, ''). ``hash_grams=True`` is the 100 TB
    spelling: the dup-frequency shuffle and the semi-join key on
    ``xxhash64(gram)`` (8 bytes, ~2⁻⁶⁴ collision risk) instead of the
    wide gram string.

    Scale shape: grams and the token stream are map-only explodes; the
    frequency aggregate shuffles (gram → distinct-doc count) once with
    map-side partials; covered positions are (id, int) pairs; the
    reassembly groupBy is the one shuffle that moves token text, keyed
    by document — identical to ``strip_boilerplate_chunks``'s tail.
    """
    staged = (
        df.filter(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col), tokenize(F.col(text_col)).alias("__t"))
    )
    gram_expr = word_ngrams_all_of(F.col("__t"), span)
    if hash_grams:
        gram_expr = F.transform(gram_expr, lambda g: F.xxhash64(g))
    grams = staged.select(
        id_col, F.posexplode(gram_expr).alias("pos", "gram")
    )
    dup_grams = (
        grams.select(id_col, "gram").distinct()
        .groupBy("gram").agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") >= 2).select("gram")
    )
    covered = (
        grams.join(dup_grams, "gram", "left_semi")
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(span - 1))
            ).alias("tpos"),
        )
        .distinct()
    )
    return _clean_from_covered(df, staged, covered, text_col, id_col)


def _clean_from_covered(
    df: DataFrame, staged: DataFrame, covered: DataFrame,
    text_col: str, id_col: str,
) -> DataFrame:
    """Shared reassembly tail of the span-removal family: drop the
    covered (id, tpos) positions from the staged token stream, re-join
    each document's survivors in order, and pass blank documents
    through as (0, 0, '') — one spelling for the batch operator and
    the incremental twin."""
    tokens = staged.select(
        id_col, F.posexplode(F.col("__t")).alias("tpos", "token")
    )
    kept = tokens.join(covered, [id_col, "tpos"], "left_anti")
    reassembled = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("tpos"), F.col("token"))
                    )
                ),
                lambda s: s["token"],
            ),
        ).alias("clean_text"),
    )
    cleaned = (
        staged.select(id_col, F.size(F.col("__t")).cast("long")
                      .alias("n_tokens"))
        .join(reassembled, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long")
            .alias("n_kept"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )
    blanks = (
        df.filter(F.trim(F.col(text_col)) == "")
        .select(
            F.col(id_col),
            F.lit(0).cast("long").alias("n_tokens"),
            F.lit(0).cast("long").alias("n_kept"),
            F.lit("").alias("clean_text"),
        )
    )
    return cleaned.unionByName(blanks)


def build_span_index(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span: int = 50,
    hash_grams: bool = False,
) -> DataFrame:
    """Distinct table of ALL overlapping ``span``-token windows in the
    corpus — the train-once artifact for
    ``incremental_remove_duplicate_spans`` (the span-level member of
    the persisted-index family: MinHash / SemDeDup / decontam / IVF).
    Persist once; append-merge = union + distinct with each ingested
    batch's windows. ``hash_grams=True`` stores ``xxhash64(gram)``
    longs instead of gram strings (the 100 TB spelling — 8 bytes per
    row, ~2⁻⁶⁴ collision risk); the probe side must match."""
    staged = (
        corpus.filter(F.trim(F.col(text_col)) != "")
        .select(tokenize(F.col(text_col)).alias("__t"))
    )
    gram_expr = word_ngrams_all_of(F.col("__t"), span)
    if hash_grams:
        gram_expr = F.transform(gram_expr, lambda g: F.xxhash64(g))
    return staged.select(F.explode(gram_expr).alias("gram")).distinct()


def incremental_remove_duplicate_spans(
    new_docs: DataFrame,
    corpus: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    span: int = 50,
    hash_grams: bool = False,
    span_index: DataFrame | None = None,
) -> DataFrame:
    """ExactSubstr span removal for a NEW batch against a STANDING
    corpus — the incremental twin of ``remove_duplicate_spans`` for
    continuous ingest: a batch token position is covered (and removed)
    when any ``span``-token window containing it occurs in the standing
    corpus OR in another document of the batch itself; survivors
    reassemble in order. The batch-internal rule keeps the batch clean
    against itself, so appending survivors (and union-merging their
    windows into the index) preserves the invariant for the next batch.

    One documented asymmetry vs the batch operator: the standing corpus
    is immutable here, so its copies of a shared span REMAIN (the batch
    operator removes every occurrence corpus-wide); a periodic offline
    ``remove_duplicate_spans`` over the full corpus restores the
    remove-all semantics, the same cadence as index rebuilds elsewhere.

    ``span_index`` short-circuits the corpus scan with the persisted
    ``build_span_index`` table (the production shape — the corpus
    argument is never touched and may be None). The index probe is a
    gram-keyed semi-join (shuffle join at scale — the index is
    corpus-sized; nothing broadcasts); ``hash_grams`` must match the
    index build. Returns ``(id, n_tokens, n_kept, clean_text)``."""
    if span_index is None:
        if corpus is None:
            raise ValueError(
                "incremental_remove_duplicate_spans: corpus=None "
                "requires span_index")
        span_index = build_span_index(
            corpus, text_col, id_col, span, hash_grams)
    staged = (
        new_docs.filter(F.trim(F.col(text_col)) != "")
        .select(F.col(id_col), tokenize(F.col(text_col)).alias("__t"))
    )
    gram_expr = word_ngrams_all_of(F.col("__t"), span)
    if hash_grams:
        gram_expr = F.transform(gram_expr, lambda g: F.xxhash64(g))
    grams = staged.select(
        id_col, F.posexplode(gram_expr).alias("pos", "gram")
    )
    batch_dup = (
        grams.select(id_col, "gram").distinct()
        .groupBy("gram").agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") >= 2).select("gram")
    )
    hit_grams = (
        span_index.select("gram").unionByName(batch_dup).distinct()
    )
    covered = (
        grams.join(hit_grams, "gram", "left_semi")
        .select(
            id_col,
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + F.lit(span - 1))
            ).alias("tpos"),
        )
        .distinct()
    )
    return _clean_from_covered(new_docs, staged, covered, text_col, id_col)


def strip_boilerplate_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 16,
    max_occurrences: int = 2,
) -> DataFrame:
    """Remove corpus-frequent chunks (boilerplate) from every document
    and reassemble the cleaned text — sub-document dedup for navboxes,
    license headers, cookie banners and other templated spans that
    whole-document dedup can never catch.

    Non-overlapping ``size``-token chunks are fingerprinted (md5);
    a chunk whose fingerprint occurs more than ``max_occurrences``
    times corpus-wide is dropped from every document containing it,
    and each document's survivors re-join in order. Returns
    ``(id, clean_text, n_chunks_kept, n_chunks_dropped)`` for documents
    with at least one surviving chunk.

    Scale shape: chunking is map-only (``chunk_documents``); the
    frequency count shuffles only 16-byte fingerprints with map-side
    partial aggregation; the boilerplate set (high-frequency tail) is
    tiny by construction, so the anti-join against it broadcasts under
    AQE; the reassembly groupBy is the one inherent wide shuffle —
    surviving chunk text moves once, keyed by document.
    """
    chunks = chunk_documents(
        df.select(id_col, text_col), text_col, size=size, overlap=0
    ).select(
        F.col(id_col),
        F.col("chunk_index"),
        F.col("chunk_text"),
        F.md5(F.col("chunk_text")).alias("__fp"),
    )
    boilerplate = (
        chunks.groupBy("__fp")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > max_occurrences)
        .select("__fp")
    )
    kept = chunks.join(boilerplate, "__fp", "left_anti")
    dropped_per_doc = (
        chunks.join(boilerplate, "__fp", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_chunks_dropped"))
    )
    reassembled = (
        kept.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(F.col("chunk_index"), F.col("chunk_text"))
                        )
                    ),
                    lambda s: s["chunk_text"],
                ),
            ).alias("clean_text"),
        )
    )
    return (
        reassembled.join(dropped_per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.col("clean_text"),
            F.col("n_chunks_kept"),
            F.coalesce(F.col("n_chunks_dropped"), F.lit(0)).alias(
                "n_chunks_dropped"
            ),
        )
    )
