"""String-similarity kernels (SURVEY.md §2.8 F1-F5, §2.9 U1-U2).

The reference scores every candidate pair with a row-at-a-time Python UDF
wrapping ``difflib.SequenceMatcher`` (``soulutionOne.py:8-11,21``) — placed
*inside* a join predicate, which forces a nested-loop join with per-row
Python round-trips. Our engine:

- keeps predicates JVM-native wherever the 80-threshold contract allows
  (``F.levenshtein``, n-gram Jaccard built from array functions — all
  codegen-friendly, all usable in pushed-down predicates),
- ships the faithful Ratcliff/Obershelp score as an Arrow-vectorized
  ``pandas_udf`` for post-blocking rescoring only,
- replaces the ``equalName`` canonical-key UDF (``soulutionOne.py:13-20``)
  with native ``F.least``.
"""

from __future__ import annotations

from difflib import SequenceMatcher

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


@F.pandas_udf(T.DoubleType())
def ratcliff_similarity(a: pd.Series, b: pd.Series) -> pd.Series:
    """Ratcliff/Obershelp (difflib) similarity * 100, range [0, 100].

    Exactly the reference's ``string_similarity`` (``soulutionOne.py:8-11``,
    ``solutionTwo.py:8-11``) but Arrow-vectorized: one Python invocation
    per batch instead of per row. Nulls score 0.0 (the reference would
    raise on None; our engine treats null as no-match, consistent with the
    join's 3VL drop of null names at ``soulutionOne.py:54``).
    """

    def score(x: object, y: object) -> float:
        if x is None or y is None:
            return 0.0
        return SequenceMatcher(None, str(x), str(y)).ratio() * 100.0

    return pd.Series([score(x, y) for x, y in zip(a, b)])


def levenshtein_within(a: Column | str, b: Column | str, max_dist: int = 3) -> Column:
    """Edit-distance predicate (reference ``solutionThree.py:20``).

    Passes the threshold to Spark's 3-arg ``levenshtein`` so the JVM can
    abandon a pair early once the distance exceeds the bound — O(n*k)
    instead of O(n*m) per comparison. The 3-arg form returns -1 when the
    bound is exceeded, hence the >= 0 guard.
    """
    d = F.levenshtein(F.col(a) if isinstance(a, str) else a,
                      F.col(b) if isinstance(b, str) else b,
                      max_dist)
    return (d >= 0) & (d <= max_dist)


def canonical_pair_key(a: Column | str, b: Column | str) -> Column:
    """Lexicographic minimum of two strings as a cluster anchor key —
    native replacement for the reference's ``equalName`` UDF
    (``soulutionOne.py:13-20``)."""
    return F.least(F.col(a) if isinstance(a, str) else a,
                   F.col(b) if isinstance(b, str) else b)


def char_ngrams(col: Column | str, n: int = 3) -> Column:
    """Distinct character n-grams of a string as ``array<string>``,
    computed with native array expressions (codegen, no Python).

    ``transform(sequence(1, len-n+1), i -> substring(s, i, n))`` then
    ``array_distinct``. Strings shorter than ``n`` yield a single-element
    array containing the whole string, so short names still block/compare.
    """
    s = F.col(col) if isinstance(col, str) else col
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(s) - (n - 1), F.lit(1))),
        lambda i: s.substr(i, F.lit(n)),
    )
    return F.array_distinct(grams)


def jaccard(a: Column, b: Column) -> Column:
    """Jaccard similarity of two array columns: |a ∩ b| / |a ∪ b|.
    Returns DoubleType in [0, 1]; empty-union pairs score 0.0."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union > 0, inter.cast("double") / union.cast("double")
                  ).otherwise(F.lit(0.0))


def ngram_jaccard(a: Column | str, b: Column | str, n: int = 3) -> Column:
    """Character n-gram Jaccard similarity of two string columns —
    the engine's native, pushdown-friendly proxy for difflib similarity."""
    a_col = F.col(a) if isinstance(a, str) else a
    b_col = F.col(b) if isinstance(b, str) else b
    return jaccard(char_ngrams(a_col, n), char_ngrams(b_col, n))
