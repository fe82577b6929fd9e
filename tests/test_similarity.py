"""Similarity kernels: point-oracles against difflib (the reference's own
scoring function, ``soulutionOne.py:8-11``) and algebraic properties."""

from __future__ import annotations

from difflib import SequenceMatcher

import pytest
from pyspark.sql import functions as F

from pyspark_deduplication_spark.functions.similarity import (
    canonical_pair_key,
    char_ngrams,
    levenshtein_within,
    ngram_jaccard,
    ratcliff_similarity,
)

PAIRS = [
    ("hot rod", "hot rood"),
    ("red widget", "red widget"),
    ("blue bolt", "small anvil"),
    ("", "x"),
    ("Customer#000001", "Customer#000010"),
    ("a", "a"),
]


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "a string, b string")


def test_ratcliff_matches_difflib(spark):
    rows = (
        _df(spark, PAIRS)
        .select("a", "b", ratcliff_similarity("a", "b").alias("sim"))
        .collect()
    )
    for r in rows:
        expected = SequenceMatcher(None, r.a, r.b).ratio() * 100.0
        assert r.sim == pytest.approx(expected, abs=1e-9), (r.a, r.b)


def test_ratcliff_nulls_score_zero(spark):
    rows = (
        spark.createDataFrame([("x", None), (None, None)], "a string, b string")
        .select(ratcliff_similarity("a", "b").alias("sim"))
        .collect()
    )
    assert [r.sim for r in rows] == [0.0, 0.0]


def test_ratcliff_direction_fidelity(spark):
    # Ratcliff/Obershelp is NOT symmetric (difflib's block matching is
    # order-dependent); the engine must be faithful to difflib in
    # whichever direction it's called — same quirk as the reference.
    rev = _df(spark, PAIRS).select("a", "b", ratcliff_similarity("b", "a").alias("s")).collect()
    for r in rev:
        expected = SequenceMatcher(None, r.b, r.a).ratio() * 100.0
        assert r.s == pytest.approx(expected, abs=1e-9)


def test_levenshtein_within_guards_minus_one(spark):
    # Spark's 3-arg levenshtein returns -1 above the bound; the predicate
    # must NOT treat that as a match.
    rows = (
        spark.createDataFrame([("abcdefgh", "zzzzzzzz"), ("abc", "abd")],
                              "a string, b string")
        .select(levenshtein_within("a", "b", 3).alias("hit"))
        .collect()
    )
    assert [r.hit for r in rows] == [False, True]


def test_canonical_pair_key_is_least(spark):
    rows = (
        spark.createDataFrame([("b", "a"), ("a", "b"), ("x", "x")],
                              "a string, b string")
        .select(canonical_pair_key("a", "b").alias("k"))
        .collect()
    )
    assert [r.k for r in rows] == ["a", "a", "x"]


def test_char_ngrams_short_strings(spark):
    rows = (
        spark.createDataFrame([("ab",), ("abcd",)], "s string")
        .select(char_ngrams("s", 3).alias("g"))
        .collect()
    )
    assert rows[0].g == ["ab"]
    assert rows[1].g == ["abc", "bcd"]


def test_ngram_jaccard_bounds(spark):
    rows = (
        spark.createDataFrame(
            [("same text", "same text"), ("abcabc", "xyzxyz")],
            "a string, b string",
        )
        .select(ngram_jaccard("a", "b").alias("j"))
        .collect()
    )
    assert rows[0].j == 1.0
    assert rows[1].j == 0.0


def test_null_text_behavior_pinned(spark):
    """Null handling contract for the text kernels: null text propagates
    null (not empty-string coercion) through normalize/token_count, and
    null fingerprints group together in dedup (documented behavior)."""
    from pyspark_deduplication_spark.functions.text import (
        doc_fingerprint, normalize_text, token_count)
    from pyspark_deduplication_spark.operators.dedup import dedup_fingerprint

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "real text")], "doc_id long, text string")
    row = df.select(
        normalize_text("text").alias("n"),
        token_count("text").alias("t"),
        doc_fingerprint("text").alias("f"),
    ).collect()[0]
    assert row.n is None and row.t is None and row.f is None
    kept = sorted(r.doc_id for r in
                  dedup_fingerprint(df, "text", "doc_id").collect())
    assert kept == [1, 3]  # null-text docs collapse to one representative
