"""Distributed BPE vocabulary training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units"; pre-tokenizer
units per Radford et al. 2019's GPT-2 splitter, see
``functions.text.pretokenize``).

The canonical tokenizer-prep job over a training corpus: learn the top-k
byte-pair merges by iterated most-frequent-adjacent-pair counting.

Scale shape — the whole point of the design: the corpus is touched
EXACTLY ONCE (pretoken explode → (word, count) hash aggregate with
map-side combine). Every merge round after that runs on the *word
table* — vocabulary-sized (millions of rows), not corpus-sized — so 100
TB of text trains at the cost of one corpus shuffle plus k small jobs:

1. pair counting pos-pairs each word's symbol array weighted by the
   word count — map-only explode plus one (pair → sum) shuffle over the
   word table;
2. the argmax pair is a 1-row ``orderBy().limit(1)`` collect — model
   state, exactly like ``train_centroids``' per-round centroid pull;
3. the merge applies as a map-only native ``aggregate`` fold over each
   symbol array (greedy left-to-right, the reference semantics) — no
   Python in the loop;
4. ``localCheckpoint`` truncates lineage each round so round k's plan
   does not re-analyze k stacked projections.

No step ever re-reads or re-shuffles the corpus.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyspark_deduplication_spark.functions.text import pretokenize


def bpe_word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wc): pre-tokenizer unit frequencies over the corpus — the
    single corpus-sized pass of BPE training. Leading-space units (the
    GPT-2 convention) are preserved; the space is a trainable symbol."""
    return (
        df.select(F.explode(pretokenize(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def _char_symbols(word):
    """Split a word into single-character symbols (array<string>)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: word.substr(i, F.lit(1)),
    )


def bpe_symbol_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(symbols, wc): the round-0 word table — every word split into
    single-character symbols. The input to the first merge round."""
    return bpe_word_counts(df, text_col).select(
        _char_symbols(F.col("word")).alias("symbols"), F.col("wc")
    )


def bpe_pair_counts(words: DataFrame) -> DataFrame:
    """(sym_left, sym_right, pair_count) over a (symbols, wc) word
    table: adjacent-pair frequencies weighted by word count. Words with
    a single symbol left contribute nothing (the ``size >= 2`` filter
    also dodges Spark's descending ``sequence(1, 0)`` surprise)."""
    sym = F.col("symbols")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(sym) - 1),
        lambda i: F.struct(
            F.element_at(sym, i).alias("l"),
            F.element_at(sym, F.lit(1) + i).alias("r"),
        ),
    )
    return (
        words.filter(F.size(sym) >= 2)
        .select(F.col("wc"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("sym_left"), F.col("p.r").alias("sym_right"))
        .agg(F.sum("wc").alias("pair_count"))
    )


def _apply_merge(sym_col, left: str, right: str):
    """Greedy left-to-right merge of adjacent (left, right) into one
    symbol — a native fold, matching the reference scan: 'aaa' under
    (a,a) becomes ['aa','a']."""
    merged = left + right
    return F.aggregate(
        sym_col,
        F.slice(sym_col, 1, 0),  # empty array<string>, typed
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def train_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
) -> DataFrame:
    """Learn the first ``k`` BPE merges over a text corpus. Returns a
    k-row DataFrame (merge_rank, sym_left, sym_right, pair_count) in
    merge order; ties break deterministically by (count desc, left asc,
    right asc). Stops early if no pair remains (fully merged corpus).

    The per-round 1-row collect is model state (the learned merge),
    not a data-path action — the corpus itself is aggregated once and
    never revisited (see module docstring for the full 100 TB shape).
    """
    spark = df.sparkSession
    words = bpe_symbol_table(df, text_col).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(k):
        top = (
            bpe_pair_counts(words)
            .orderBy(
                F.col("pair_count").desc(),
                F.col("sym_left").asc(),
                F.col("sym_right").asc(),
            )
            .limit(1)
            .collect()  # 1 row — the learned merge (model state)
        )
        if not top:
            break
        l, r, cnt = top[0]["sym_left"], top[0]["sym_right"], top[0]["pair_count"]
        merges.append((rank, l, r, int(cnt)))
        if rank < k - 1:
            words = words.select(
                _apply_merge(F.col("symbols"), l, r).alias("symbols"),
                F.col("wc"),
            ).localCheckpoint()
    return spark.createDataFrame(
        merges,
        "merge_rank long, sym_left string, sym_right string, pair_count long",
    )


def apply_bpe_merges(
    df: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode a corpus with trained merges and report per-document
    token budgets: (id, n_pretokens, n_bpe_tokens) — the
    post-tokenizer sequence length every packing/budgeting step keys
    on. Merges apply sequentially in rank order with the same greedy
    left-to-right scan as training, so encoding the training corpus
    reproduces the trainer's final word table exactly (pinned by
    test).

    Scale shape — the dictionary trick: the corpus explodes to
    pretokens map-only and aggregates per (doc, word); the Python
    encode kernel (an Arrow ``pandas_udf`` looping over the learned
    merges) runs only on the DISTINCT word table — vocabulary-sized,
    like training itself — and the per-word token count joins back
    onto the per-doc word counts (AQE picks broadcast when the vocab
    fits, shuffle-hash otherwise). No Python ever touches a
    corpus-sized relation.

    The merge list itself is model state (k rows) collected once into
    the kernel's closure."""
    from pyspark.sql import types as T

    ordered = [
        (r["sym_left"], r["sym_right"])
        for r in sorted(
            merges.collect(), key=lambda r: r["merge_rank"]
        )  # k rows — the learned vocabulary (model state)
    ]

    def encode(word: str) -> list[str]:
        sym = list(word)
        for left, right in ordered:
            out: list[str] = []
            for x in sym:
                if out and out[-1] == left and x == right:
                    out[-1] = left + right
                else:
                    out.append(x)
            sym = out
        return sym

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def enc(words: pd.Series) -> pd.Series:
        return words.map(encode)

    pretoks = df.select(
        F.col(id_col), F.explode(pretokenize(F.col(text_col))).alias("word")
    )
    per_doc_word = pretoks.groupBy(id_col, "word").agg(
        F.count(F.lit(1)).alias("__n")
    )
    vocab = per_doc_word.select("word").distinct().withColumn(
        "__len", F.size(enc(F.col("word")))
    )
    return (
        per_doc_word.join(vocab, "word")
        .groupBy(id_col)
        .agg(
            F.sum("__n").cast("long").alias("n_pretokens"),
            F.sum(F.col("__n") * F.col("__len")).cast("long")
            .alias("n_bpe_tokens"),
        )
    )
