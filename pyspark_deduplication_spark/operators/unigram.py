"""Distributed unigram-LM tokenizer training (Kudo 2018, "Subword
Regularization" — the SentencePiece `--model_type=unigram` algorithm),
completing the tokenizer family next to ``operators/bpe.py``.

Same 100 TB shape as BPE training: the corpus is touched EXACTLY ONCE
(pretoken explode → (word, wc) hash aggregate); every EM round runs on
the vocabulary-sized word table. The piece inventory is MODEL STATE —
bounded by the seed size, like BPE's merge list or k-means' centroids —
so it collects to the driver between rounds and enters the next round's
Arrow kernel as a closure constant. The per-round E-step is one
map-only segmentation pass over distinct words plus one (piece → Σ wc)
hash aggregate; nothing corpus-sized ever re-shuffles.

Documented deviations from the SentencePiece trainer (simplifications,
each pinned by the pure-Python reference test in ``test_unigram.py``):

- **Hard EM** (Viterbi counts) by DEFAULT instead of full
  forward-backward expectations — the common "viterbi EM" variant;
  piece probabilities converge to the same dominant segmentations on
  separable corpora. ``train_unigram(em="soft")`` closes this
  deviation: the E-step runs true forward-backward posterior expected
  counts (``_forward_backward``), pinned against brute-force
  segmentation enumeration in ``test_unigram.py``.
- **Probability-ranked pruning** by DEFAULT instead of loss-delta
  pruning: after each EM phase the lowest-probability multi-char
  pieces drop (single characters are never pruned, so every word
  stays segmentable — the same invariant SentencePiece maintains).
  ``train_unigram(prune="loss")`` closes this deviation too: pieces
  drop by the estimated LIKELIHOOD COST of removal — expected count ×
  (own logprob − best alternative segmentation's logprob), Kudo's
  criterion — so a rare piece whose characters are otherwise scarce
  (expensive to re-segment) outlives a more probable piece that
  decomposes cheaply; pinned by a planted contrast in
  ``test_unigram.py``.
- Seeding uses frequency-weighted substring counts (all substrings up
  to ``max_piece_len``) rather than the Enhanced Suffix Array; both
  yield "frequent substrings" — ESA is an implementation optimization,
  not a semantic difference, at bounded piece length.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pyspark_deduplication_spark.operators.bpe import bpe_word_counts

_CHAR_FLOOR_LP = -30.0  # log-prob floor for unseen single chars at encode


def substring_candidates(
    words: DataFrame, max_piece_len: int = 4
) -> DataFrame:
    """(piece, score) over a (word, wc) table: every substring of every
    word up to ``max_piece_len``, scored by the frequency-weighted
    POSITIONAL occurrence count Σ wc (a word 'aaa' contributes 'a'
    three times) — map-only nested-HOF explode + one hash aggregate."""
    subs = F.flatten(F.transform(
        F.sequence(F.lit(1), F.length("word")),
        lambda i: F.transform(
            F.sequence(
                F.lit(1),
                F.least(F.lit(max_piece_len), F.length("word") - i + 1)),
            lambda ln: F.col("word").substr(i, ln),
        ),
    ))
    return (
        words.select(F.col("wc"), F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("wc").alias("score"))
    )


def _viterbi(word: str, logp: dict, max_len: int,
             char_floor_lp: float = _CHAR_FLOOR_LP) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs — earliest
    split wins ties (strict improvement only), so the result is
    deterministic. Unknown single chars take the floor log-prob (cannot
    occur when the vocab was seeded from the same corpus; needed for
    encoding unseen text). ``char_floor_lp`` must live on the SAME
    scale as the model's logprobs — a caller feeding quantized-integer
    scores (the ``unigram_encode_seeded_docs`` 1e8-unit spelling) must
    scale the floor too, or an out-of-model char at ~-30 would be
    nearly free next to ~-1e9 piece scores (advisory r8)."""
    n = len(word)
    neg = float("-inf")
    dp = [0.0] + [neg] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            p = logp.get(word[j:i])
            if p is None and i - j == 1:
                p = char_floor_lp
            if p is not None and dp[j] + p > dp[i]:
                dp[i] = dp[j] + p
                back[i] = j
    out: list[str] = []
    i = n
    while i > 0:
        out.append(word[back[i]:i])
        i = back[i]
    return out[::-1]


def _segmenter_udf(logp: dict, max_len: int,
                   char_floor_lp: float = _CHAR_FLOOR_LP):
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def seg(words: pd.Series) -> pd.Series:
        return words.map(
            lambda w: _viterbi(w, logp, max_len, char_floor_lp))

    return seg


def _viterbi_counts(
    words: DataFrame, logp: dict, max_len: int
) -> dict[str, int]:
    """E-step: segment every DISTINCT word under the current model and
    aggregate wc-weighted piece counts — one Arrow pass over the word
    table + one (piece → Σ wc) shuffle; the returned dict is
    vocab-bounded model state."""
    seg = _segmenter_udf(logp, max_len)
    rows = (
        words.select(F.col("wc"), F.explode(seg(F.col("word"))).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("wc").alias("n"))
        .collect()
    )
    return {r["piece"]: int(r["n"]) for r in rows}


def _forward_backward(
    word: str, logp: dict, max_len: int
) -> list[tuple[str, float]]:
    """Posterior expected piece counts for one word under the current
    model — the FULL-EM E-step kernel (forward-backward over the
    segmentation lattice; spans ≤ ``max_len``): expected count of a
    piece = Σ over its spans of exp(α_j + log p + β_i − log Z). Words
    are short, so plain log-sum-exp per position is cheap and stable.
    Unknown single chars take the floor log-prob (cannot occur when the
    vocab was seeded from the same corpus)."""
    neg = float("-inf")

    def lse(vals: list[float]) -> float:
        if not vals:
            return neg
        m = max(vals)
        if m == neg:
            return neg
        return m + math.log(sum(math.exp(v - m) for v in vals))

    def span_lp(j: int, i: int):
        p = logp.get(word[j:i])
        if p is None and i - j == 1:
            p = _CHAR_FLOOR_LP
        return p

    n = len(word)
    alpha = [neg] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        acc = []
        for j in range(max(0, i - max_len), i):
            p = span_lp(j, i)
            if p is not None and alpha[j] > neg:
                acc.append(alpha[j] + p)
        alpha[i] = lse(acc)
    beta = [neg] * (n + 1)
    beta[n] = 0.0
    for j in range(n - 1, -1, -1):
        acc = []
        for i in range(j + 1, min(j + max_len, n) + 1):
            p = span_lp(j, i)
            if p is not None and beta[i] > neg:
                acc.append(p + beta[i])
        beta[j] = lse(acc)
    z = alpha[n]
    if z == neg:
        return []
    out: dict[str, float] = {}
    for j in range(n):
        if alpha[j] == neg:
            continue
        for i in range(j + 1, min(j + max_len, n) + 1):
            p = span_lp(j, i)
            if p is None or beta[i] == neg:
                continue
            w = math.exp(alpha[j] + p + beta[i] - z)
            piece = word[j:i]
            out[piece] = out.get(piece, 0.0) + w
    return sorted(out.items())


def _soft_counts(
    words: DataFrame, logp: dict, max_len: int
) -> dict[str, float]:
    """Full-EM E-step: expected piece counts over every DISTINCT word,
    weighted by word frequency — same one-pass shape as
    ``_viterbi_counts`` but emitting (piece, weight) posteriors from
    the forward-backward kernel. Aggregated sums round to 9 decimals
    so partition-order float jitter cannot reach the model (the
    ``train_centroids`` convention)."""
    model = dict(logp)
    ml = max_len

    @F.pandas_udf(T.ArrayType(T.StructType([
        T.StructField("piece", T.StringType()),
        T.StructField("w", T.DoubleType()),
    ])))
    def seg(words_s: pd.Series) -> pd.Series:
        return words_s.map(lambda w: _forward_backward(w, model, ml))

    rows = (
        words.select(F.col("wc"), F.explode(seg(F.col("word"))).alias("e"))
        .groupBy(F.col("e.piece").alias("piece"))
        .agg(F.round(F.sum(F.col("e.w") * F.col("wc")), 9).alias("n"))
        .collect()
    )
    return {r["piece"]: float(r["n"]) for r in rows}


def _loss_deltas(
    logp: dict, char_set: set, counts: dict, max_len: int
) -> dict[str, float]:
    """Per-piece removal cost (Kudo's pruning criterion, driver-side
    over the vocab-bounded model state): Δ(p) ≈ E[count(p)] ·
    (log p(p) − logprob of p's text best-segmented WITHOUT p). Always
    ≥ 0 — the alternative segmentation is available to the Viterbi
    path too, so it can only score lower. Pieces whose characters are
    otherwise scarce re-segment expensively and get LARGE deltas even
    at low own-probability — the case probability-ranked pruning gets
    backwards."""
    deltas: dict[str, float] = {}
    for p, lp in list(logp.items()):
        if p in char_set:
            continue
        # pop/restore the single key instead of copying the dict per
        # piece — keeps a prune round O(V·piece_len), not O(V²)
        del logp[p]
        try:
            alt = sum(
                logp.get(piece, _CHAR_FLOOR_LP)
                for piece in _viterbi(p, logp, max_len))
        finally:
            logp[p] = lp
        deltas[p] = counts.get(p, 0) * (lp - alt)
    return deltas


def train_unigram(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 120,
    max_piece_len: int = 4,
    seed_multi: int = 400,
    n_iters: int = 2,
    prune_frac: float = 0.25,
    em: str = "hard",
    prune: str = "prob",
) -> DataFrame:
    """Learn a unigram-LM piece vocabulary over a text corpus. Returns
    (piece, logprob, is_char) — the trained model table
    ``unigram_encode`` consumes (persist it as the production
    artifact). Characters are never pruned; multi-char
    pieces shrink by ``prune_frac`` per round (lowest probability
    first, ties by piece) with an EM re-fit after each prune, until at
    most ``vocab_size`` pieces remain.

    ``em="hard"`` (default) uses Viterbi counts — fast, the common
    simplification. ``em="soft"`` runs FULL forward-backward EM
    (posterior expected counts — closing the main documented deviation
    from the SentencePiece trainer): pieces that lose every Viterbi
    argmax but carry real posterior mass keep calibrated
    probabilities instead of starving to the floor; distributed shape
    is identical (one Arrow pass over the word table per round, model
    state collected between rounds).

    ``prune="prob"`` (default) ranks drops by probability;
    ``prune="loss"`` ranks by estimated removal cost
    (``_loss_deltas`` — Kudo's criterion): both are driver-side over
    vocab-bounded state, but loss ranking protects rare pieces whose
    characters are otherwise scarce (expensive to re-segment) over
    probable pieces that decompose cheaply."""
    spark = df.sparkSession
    words = bpe_word_counts(df, text_col).localCheckpoint()
    seeds = substring_candidates(words, max_piece_len)
    chars = [
        (r["piece"], int(r["score"]))
        for r in seeds.filter(F.length("piece") == 1).collect()
    ]
    multi = [
        (r["piece"], int(r["score"]))
        for r in (
            seeds.filter(F.length("piece") >= 2)
            .orderBy(F.col("score").desc(), F.col("piece").asc())
            .limit(seed_multi)
            .collect()
        )
    ]
    counts = dict(chars)
    counts.update(dict(multi))
    char_set = {p for p, _ in chars}

    def normalize(cnt: dict) -> dict:
        # chars keep a count floor of 1 so every word stays segmentable
        # — iterate cnt ∪ char_set, NOT cnt alone: a char fully covered
        # by a retained multi-char piece gets NO Viterbi count and
        # would silently vanish from the model (review-caught; the
        # "characters are never pruned" invariant is pinned by test)
        full = {}
        for p in set(cnt) | char_set:
            n = cnt.get(p, 0)
            if p in char_set:
                n = max(n, 1)
            if n > 0:
                full[p] = n
        total = float(sum(full.values()))
        return {p: math.log(n / total) for p, n in full.items()}

    if em not in ("hard", "soft"):
        raise ValueError(f"train_unigram: unknown em mode {em!r}")
    if prune not in ("prob", "loss"):
        raise ValueError(f"train_unigram: unknown prune mode {prune!r}")
    estep = _viterbi_counts if em == "hard" else _soft_counts

    last_counts: dict = dict(counts)
    logp = normalize(counts)
    for _ in range(n_iters):
        last_counts = estep(words, logp, max_piece_len)
        logp = normalize(last_counts)
    while len(logp) > vocab_size:
        if prune == "prob":
            ranked = sorted(
                ((lp, p) for p, lp in logp.items() if p not in char_set))
        else:
            ranked = sorted(
                ((d, p) for p, d in _loss_deltas(
                    logp, char_set, last_counts, max_piece_len).items()))
        n_drop = min(
            max(1, int(len(ranked) * prune_frac)),
            len(logp) - vocab_size,
            len(ranked),
        )
        if n_drop <= 0:
            break
        dropped = {p for _, p in ranked[:n_drop]}
        logp = {p: lp for p, lp in logp.items() if p not in dropped}
        last_counts = estep(words, logp, max_piece_len)
        logp = normalize(last_counts)
    rows = sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))
    return spark.createDataFrame(
        [(p, float(lp), p in char_set) for p, lp in rows],
        "piece string, logprob double, is_char boolean",
    )


def unigram_encode(
    df: DataFrame,
    pieces: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    char_floor_lp: float = _CHAR_FLOOR_LP,
) -> DataFrame:
    """Encode a corpus with a trained unigram model and report per-doc
    token budgets (id, n_pretokens, n_unigram_tokens) — the
    ``apply_bpe_merges`` dictionary trick verbatim: the Viterbi kernel
    touches only the DISTINCT word table; per-word piece counts join
    back onto per-(doc, word) counts. The model (vocab-bounded) is
    collected once into the kernel closure. ``char_floor_lp`` (the
    unseen-single-char penalty) must be on the same scale as the
    model's ``logprob`` column — pass a scaled floor when the model's
    scores are quantized (advisory r8)."""
    from pyspark_deduplication_spark.functions.text import pretokenize

    model = {r["piece"]: float(r["logprob"]) for r in pieces.collect()}
    max_len = max((len(p) for p in model), default=1)
    seg = _segmenter_udf(model, max_len, char_floor_lp)
    pretoks = df.select(
        F.col(id_col), F.explode(pretokenize(F.col(text_col))).alias("word"))
    per_doc_word = pretoks.groupBy(id_col, "word").agg(
        F.count(F.lit(1)).alias("__n"))
    vocab = per_doc_word.select("word").distinct().withColumn(
        "__len", F.size(seg(F.col("word"))))
    return (
        per_doc_word.join(vocab, "word")
        .groupBy(id_col)
        .agg(F.sum("__n").cast("long").alias("n_pretokens"),
             F.sum(F.col("__n") * F.col("__len")).cast("long")
             .alias("n_unigram_tokens"))
    )
