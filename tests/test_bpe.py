"""Distributed BPE merge training vs a pure-Python reference trainer."""

from __future__ import annotations

import re

from pyspark_deduplication_spark.functions.text import _PRETOKEN_RE
from pyspark_deduplication_spark.operators.bpe import (
    bpe_pair_counts,
    bpe_symbol_table,
    train_bpe_merges,
)

FIXTURE = [
    "the theater there is thin; the thing is that the theory holds",
    "then the throne fell, and the thunder thinned the thick throng",
    "she said she'd see the sea; the sun set, the sand shone",
    "123 1234 12 99 999 9999 the total=$42.07 (rush? yes!) again",
    "we'll see what they're doing when the weather there thaws",
]


def _py_train(texts: list[str], k: int):
    """Reference BPE (Sennrich et al. 2016): greedy left-to-right merge
    of the (count desc, left asc, right asc) argmax pair, k rounds."""
    pat = re.compile(_PRETOKEN_RE)
    counts: dict[str, int] = {}
    for t in texts:
        for w in pat.findall(t):
            counts[w] = counts.get(w, 0) + 1
    words = [(list(w), c) for w, c in counts.items()]
    merges = []
    for rank in range(k):
        pc: dict[tuple[str, str], int] = {}
        for sym, c in words:
            for a, b in zip(sym, sym[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + c
        if not pc:
            break
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, cnt))
        nxt = []
        for sym, c in words:
            out: list[str] = []
            for x in sym:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            nxt.append((out, c))
        words = nxt
    return merges


def test_train_bpe_merges_matches_python_reference(spark):
    df = spark.createDataFrame([(t,) for t in FIXTURE], "text string")
    got = [
        (r.merge_rank, r.sym_left, r.sym_right, r.pair_count)
        for r in sorted(
            train_bpe_merges(df, "text", k=8).collect(),
            key=lambda r: r.merge_rank,
        )
    ]
    want = _py_train(FIXTURE, 8)
    assert got == want
    # sanity: " the" must emerge as a merged unit within 8 rounds —
    # ' t'+'h' then +'e' dominates this fixture
    merged_syms = {l + r for _, l, r, _ in got}
    assert " th" in merged_syms


def test_bpe_pair_counts_handles_single_symbol_words(spark):
    """One-char words contribute no pairs (and must not trip Spark's
    descending sequence(1, 0))."""
    df = spark.createDataFrame([("a",), ("a b ab",)], "text string")
    words = bpe_symbol_table(df, "text")
    rows = {(r.sym_left, r.sym_right): r.pair_count
            for r in bpe_pair_counts(words).collect()}
    # words: 'a'(x2 via both rows? 'a' once, ' b', ' ab') — only multi
    # char words pair up
    assert all(len(l) >= 1 and len(r) >= 1 for l, r in rows)
    assert (" ", "b") in rows and (" ", "a") in rows and ("a", "b") in rows


def test_apply_bpe_merges_matches_python_encoder(spark):
    """Encoding with the trained merges must reproduce a pure-Python
    sequential encoder's token counts per document — and encoding the
    training corpus with all k merges yields exactly the trainer's
    final word-table token counts."""
    from pyspark_deduplication_spark.operators.bpe import apply_bpe_merges

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(FIXTURE)], "doc_id long, text string"
    )
    merges_df = train_bpe_merges(df, "text", k=8)
    got = {r.doc_id: (r.n_pretokens, r.n_bpe_tokens)
           for r in apply_bpe_merges(df, merges_df).collect()}

    pat = re.compile(_PRETOKEN_RE)
    merges = _py_train(FIXTURE, 8)

    def encode(word: str) -> list[str]:
        sym = list(word)
        for _, l, r, _ in merges:
            out: list[str] = []
            for x in sym:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            sym = out
        return sym

    for i, t in enumerate(FIXTURE):
        words = pat.findall(t)
        want = (len(words), sum(len(encode(w)) for w in words))
        assert got[i] == want, (i, got[i], want)
    # BPE compresses: merged tokens are strictly fewer than characters
    # and at least as many as pretokens
    for i, t in enumerate(FIXTURE):
        n_pre, n_bpe = got[i]
        assert n_pre <= n_bpe < sum(len(w) for w in pat.findall(t))


def test_early_stop_on_fully_merged_corpus(spark):
    df = spark.createDataFrame([("ab",)], "text string")
    out = train_bpe_merges(df, "text", k=10).collect()
    # 'ab' → one merge ('a','b'); afterwards no pairs remain
    assert len(out) == 1
    assert (out[0].sym_left, out[0].sym_right) == ("a", "b")
