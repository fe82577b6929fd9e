"""Unigram-LM tokenizer: distributed trainer vs a pure-Python reference
(the ``test_bpe.py`` pattern), segmentation invariants, planted-unit
recovery, and the encode dictionary trick."""

from __future__ import annotations

import math
import re

import pytest

_PRETOK = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+|"
    r" ?[^a-zA-Z0-9\s']+|\s+")

_FLOOR = -30.0


def _ref_viterbi(word, logp, max_len):
    n = len(word)
    dp = [0.0] + [float("-inf")] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            p = logp.get(word[j:i])
            if p is None and i - j == 1:
                p = _FLOOR
            if p is not None and dp[j] + p > dp[i]:
                dp[i], back[i] = dp[j] + p, j
    out, i = [], n
    while i > 0:
        out.append(word[back[i]:i])
        i = back[i]
    return out[::-1]


def _ref_train(texts, vocab_size, max_piece_len, seed_multi, n_iters,
               prune_frac):
    """Pure-Python mirror of operators/unigram.py::train_unigram."""
    wc: dict[str, int] = {}
    for t in texts:
        for w in _PRETOK.findall(t):
            wc[w] = wc.get(w, 0) + 1
    scores: dict[str, int] = {}
    for w, c in wc.items():
        for i in range(len(w)):
            for ln in range(1, min(max_piece_len, len(w) - i) + 1):
                p = w[i:i + ln]
                scores[p] = scores.get(p, 0) + c
    chars = {p: s for p, s in scores.items() if len(p) == 1}
    multi = sorted(((p, s) for p, s in scores.items() if len(p) >= 2),
                   key=lambda kv: (-kv[1], kv[0]))[:seed_multi]
    counts = dict(chars)
    counts.update(dict(multi))
    char_set = set(chars)

    def normalize(cnt):
        full = {}
        for p in set(cnt) | char_set:
            n = cnt.get(p, 0)
            if p in char_set:
                n = max(n, 1)
            if n > 0:
                full[p] = n
        total = float(sum(full.values()))
        return {p: math.log(n / total) for p, n in full.items()}

    def estep(logp):
        cnt: dict[str, int] = {}
        for w, c in wc.items():
            for p in _ref_viterbi(w, logp, max_piece_len):
                cnt[p] = cnt.get(p, 0) + c
        return cnt

    logp = normalize(counts)
    for _ in range(n_iters):
        logp = normalize(estep(logp))
    while len(logp) > vocab_size:
        multi_now = sorted(
            ((lp, p) for p, lp in logp.items() if p not in char_set))
        n_drop = min(max(1, int(len(multi_now) * prune_frac)),
                     len(logp) - vocab_size, len(multi_now))
        if n_drop <= 0:
            break
        dropped = {p for _, p in multi_now[:n_drop]}
        logp = {p: lp for p, lp in logp.items() if p not in dropped}
        logp = normalize(estep(logp))
    return logp, char_set


TEXTS = [
    "the market opened the market closed the market rallied",
    "a quiet market and a quiet day in the market hall",
    "markets market the of of of weather weather report",
]


def test_train_unigram_matches_reference(spark):
    from pyspark_deduplication_spark.operators.unigram import train_unigram

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    got = {r.piece: (r.logprob, r.is_char)
           for r in train_unigram(df, vocab_size=40, max_piece_len=4,
                                  seed_multi=200, n_iters=2).collect()}
    ref, char_set = _ref_train(TEXTS, 40, 4, 200, 2, 0.25)
    assert set(got) == set(ref), (set(got) ^ set(ref))
    for p, lp in ref.items():
        assert abs(got[p][0] - lp) < 1e-9, p
        assert got[p][1] == (p in char_set)


def test_unigram_recovers_planted_unit_and_covers(spark):
    """A corpus dominated by one multi-char unit keeps that unit as a
    piece through pruning, and every Viterbi segmentation concatenates
    back to its word."""
    from pyspark_deduplication_spark.operators.unigram import (
        _viterbi,
        train_unigram,
    )

    texts = ["zzqx zzqx zzqx zzqx zzqx other words here"] * 4
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    pieces = train_unigram(df, vocab_size=30, max_piece_len=4,
                           seed_multi=100, n_iters=2)
    model = {r.piece: r.logprob for r in pieces.collect()}
    assert "zzqx" in model
    max_len = max(len(p) for p in model)
    for w in [" zzqx", "zzqx", " other", " words", "unseen"]:
        segs = _viterbi(w, model, max_len)
        assert "".join(segs) == w, (w, segs)
    # the planted word segments as (space, unit) — not characters
    assert _viterbi(" zzqx", model, max_len) == [" ", "zzqx"]


def test_unigram_encode_budgets(spark):
    """The dictionary-trick encoder: budgets equal the reference
    per-word Viterbi lengths times word counts; pretoken counts match
    the pretokenizer."""
    from pyspark_deduplication_spark.operators.unigram import (
        train_unigram,
        unigram_encode,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    pieces = train_unigram(df, vocab_size=40, max_piece_len=4,
                           seed_multi=200, n_iters=2)
    model = {r.piece: r.logprob for r in pieces.collect()}
    max_len = max(len(p) for p in model)
    out = {r.doc_id: r for r in
           unigram_encode(df, pieces).collect()}
    for i, t in enumerate(TEXTS):
        words = _PRETOK.findall(t)
        n_uni = sum(len(_ref_viterbi(w, model, max_len)) for w in words)
        assert out[i].n_pretokens == len(words), i
        assert out[i].n_unigram_tokens == n_uni, i
        assert out[i].n_unigram_tokens <= sum(len(w) for w in words)


def test_substring_candidates_positional_scores(spark):
    from pyspark_deduplication_spark.operators.bpe import bpe_word_counts
    from pyspark_deduplication_spark.operators.unigram import (
        substring_candidates,
    )

    df = spark.createDataFrame([(0, "aaa aaa")], "doc_id long, text string")
    words = bpe_word_counts(df, "text")
    got = {r.piece: r.score
           for r in substring_candidates(words, 3).collect()}
    # 'aaa' appears twice as a pretoken ('aaa' and ' aaa'); positional
    # substring counts: in 'aaa' -> a x3, aa x2, aaa x1
    assert got["a"] == 6
    assert got["aa"] == 4
    assert got["aaa"] == 2
    assert got[" aa"] == 1 and got[" "] == 1


def test_chars_never_pruned_even_when_fully_covered(spark):
    """The review-caught invariant: a character that only ever appears
    inside a retained multi-char piece gets zero Viterbi count, yet
    must stay in the model with a floored probability (is_char row
    present), keeping unseen words segmentable."""
    from pyspark_deduplication_spark.operators.unigram import train_unigram

    # 'qu' dominates; 'q' and 'u' never appear outside it
    texts = ["ququ ququ ququ ququ"] * 4
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    pieces = train_unigram(df, vocab_size=20, max_piece_len=4,
                           seed_multi=50, n_iters=2)
    rows = {r.piece: r for r in pieces.collect()}
    for ch in ("q", "u"):
        assert ch in rows and rows[ch].is_char, ch


def test_forward_backward_matches_enumeration():
    """The soft-EM kernel's posterior expected counts equal brute-force
    enumeration over ALL segmentations of the word."""
    from pyspark_deduplication_spark.operators.unigram import (
        _forward_backward,
    )

    logp = {p: math.log(v) for p, v in
            {"a": 0.2, "b": 0.15, "ab": 0.3, "ba": 0.1, "aba": 0.05,
             "bb": 0.2}.items()}
    word, max_len = "abab", 3

    def enumerate_segs(w):
        if not w:
            return [([], 0.0)]
        out = []
        for ln in range(1, min(max_len, len(w)) + 1):
            piece = w[:ln]
            lp = logp.get(piece)
            if lp is None and ln == 1:
                lp = -30.0
            if lp is None:
                continue
            for rest, rlp in enumerate_segs(w[ln:]):
                out.append(([piece] + rest, lp + rlp))
        return out

    segs = enumerate_segs(word)
    z = math.log(sum(math.exp(lp) for _, lp in segs))
    expect: dict[str, float] = {}
    for pieces, lp in segs:
        post = math.exp(lp - z)
        for p in pieces:
            expect[p] = expect.get(p, 0.0) + post
    got = dict(_forward_backward(word, logp, max_len))
    assert set(got) == set(expect)
    for p in expect:
        assert abs(got[p] - expect[p]) < 1e-12, p


def test_soft_em_matches_sequential_reference(spark):
    """The distributed soft-EM loop (Arrow kernel + rounded aggregate)
    equals a sequential driver loop over the same kernel — pinning the
    dataflow; and soft EM keeps calibrated mass on a piece hard EM
    starves (the documented fidelity difference)."""
    from pyspark_deduplication_spark.operators.unigram import (
        _forward_backward,
        train_unigram,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    got = {r.piece: r.logprob
           for r in train_unigram(df, vocab_size=40, max_piece_len=4,
                                  seed_multi=200, n_iters=2,
                                  em="soft").collect()}

    # sequential mirror (same seeding as _ref_train, soft E-step)
    wc: dict[str, int] = {}
    for t in TEXTS:
        for w in _PRETOK.findall(t):
            wc[w] = wc.get(w, 0) + 1
    scores: dict[str, int] = {}
    for w, c in wc.items():
        for i in range(len(w)):
            for ln in range(1, min(4, len(w) - i) + 1):
                p = w[i:i + ln]
                scores[p] = scores.get(p, 0) + c
    chars = {p: s for p, s in scores.items() if len(p) == 1}
    multi = sorted(((p, s) for p, s in scores.items() if len(p) >= 2),
                   key=lambda kv: (-kv[1], kv[0]))[:200]
    counts = dict(chars)
    counts.update(dict(multi))
    char_set = set(chars)

    def normalize(cnt):
        full = {}
        for p in set(cnt) | char_set:
            n = cnt.get(p, 0)
            if p in char_set:
                n = max(n, 1)
            if n > 0:
                full[p] = n
        total = float(sum(full.values()))
        return {p: math.log(n / total) for p, n in full.items()}

    def estep(logp):
        cnt: dict[str, float] = {}
        for w, c in wc.items():
            for p, wgt in _forward_backward(w, logp, 4):
                cnt[p] = cnt.get(p, 0.0) + wgt * c
        return {p: round(n, 9) for p, n in cnt.items()}

    ref = normalize(counts)
    for _ in range(2):
        ref = normalize(estep(ref))
    while len(ref) > 40:
        multi_now = sorted(
            ((lp, p) for p, lp in ref.items() if p not in char_set))
        n_drop = min(max(1, int(len(multi_now) * 0.25)),
                     len(ref) - 40, len(multi_now))
        if n_drop <= 0:
            break
        dropped = {p for _, p in multi_now[:n_drop]}
        ref = {p: lp for p, lp in ref.items() if p not in dropped}
        ref = normalize(estep(ref))

    assert set(got) == set(ref), set(got) ^ set(ref)
    for p, lp in ref.items():
        assert abs(got[p] - lp) < 1e-6, p


def test_loss_delta_pruning_protects_irreplaceable_pieces(spark):
    """The prune-mode contrast: probability ranking drops the rarer
    piece, while loss-delta ranking protects the piece whose removal
    costs the most likelihood — the rare unit over scarce characters
    outlives the probable unit that decomposes cheaply."""
    from pyspark_deduplication_spark.operators.unigram import (
        _loss_deltas,
        train_unigram,
    )

    # unit-level contrast on a hand-built model: 'ab' is more probable
    # (20 occurrences, chars a/b common → cheap alternative), 'xyz' is
    # rarer (10) but its chars are floor-probability (alternative
    # catastrophic). Probability ranking drops 'xyz' first; loss-delta
    # ranks 'ab' as the cheaper removal.
    logp = {"a": math.log(0.25), "b": math.log(0.25),
            "x": math.log(0.001), "y": math.log(0.001),
            "z": math.log(0.001),
            "ab": math.log(0.3), "xyz": math.log(0.15)}
    counts = {"ab": 20, "xyz": 10}
    char_set = {"a", "b", "x", "y", "z"}
    deltas = _loss_deltas(logp, char_set, counts, max_len=3)
    assert set(deltas) == {"ab", "xyz"}
    assert all(d >= 0 for d in deltas.values())
    assert deltas["ab"] < deltas["xyz"]          # loss: 'ab' cheaper
    assert logp["xyz"] < logp["ab"]              # prob: 'xyz' first

    # end-to-end: loss-mode training runs, respects vocab_size, keeps
    # every char, and still recovers the dominant planted unit
    texts = ["zzqx zzqx zzqx zzqx other words here"] * 4
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    pieces = train_unigram(df, vocab_size=30, max_piece_len=4,
                           seed_multi=100, n_iters=2, prune="loss")
    rows = {r.piece: r for r in pieces.collect()}
    assert len(rows) <= 30 + sum(1 for p in rows if rows[p].is_char)
    assert "zzqx" in rows
    chars_in_corpus = {c for t in texts for w in _PRETOK.findall(t)
                       for c in w}
    for c in chars_in_corpus:
        assert c in rows and rows[c].is_char, c


def test_encode_floor_must_match_model_quantization_scale(spark):
    """VERDICT r9 item 7: with 1e8-quantized integer logprobs, an
    UNSCALED -30 floor makes unseen single chars nearly free, flipping
    segmentations against any real multi-char piece — the silent
    cross-engine divergence the scaled floor parameter exists to
    prevent. Pin both directions so the floor scale can never silently
    regress."""
    from pyspark_deduplication_spark.operators.unigram import unigram_encode

    # 'q' is NOT a model piece; 'qq' is. Piece path costs -50e8; the
    # two-unseen-chars path costs 2*floor.
    pieces = spark.createDataFrame(
        [("a", -1.0e8), ("qq", -50.0e8)], "piece string, logprob double")
    docs = spark.createDataFrame([(1, "qq")], "doc_id long, text string")

    scaled = unigram_encode(docs, pieces, char_floor_lp=-30.0 * 1e8)
    assert scaled.collect()[0]["n_unigram_tokens"] == 1  # piece wins

    unscaled = unigram_encode(docs, pieces, char_floor_lp=-30.0)
    assert unscaled.collect()[0]["n_unigram_tokens"] == 2  # chars "win"
