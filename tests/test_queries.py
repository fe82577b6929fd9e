"""Catalog smoke + contract checks: every query runs at sf0.001 with a
stable schema; every oracle is valid DuckDB SQL. Full value-level parity
is tools/parity.py (and the driver's own gate)."""

from __future__ import annotations

import duckdb
import pytest

from pyspark_deduplication_spark.queries import CATALOG

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# the O(n²) exact ground-truth query is correctness-scale only and slow;
# covered by parity runs, skipped in the fast suite
SLOW = {"jaccard_near_dup_docs", "minhash_dedup_docs", "simhash_dedup_docs",
        "minhash_candidates_docs", "ratcliff_rescored_pairs"}


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", [n for n in CATALOG if n not in SLOW])
def test_query_runs_and_schema_stable(spark, sf_dir, name):
    q = CATALOG[name]
    df = q.fn(spark, sf_dir)
    schema1 = df.schema.simpleString()
    rows = df.collect()
    assert rows is not None
    df2 = q.fn(spark, sf_dir)
    assert df2.schema.simpleString() == schema1


@pytest.mark.parametrize("name", [n for n in CATALOG if CATALOG[n].oracle])
def test_oracle_sql_is_valid_duckdb(duck, name):
    res = duck.execute(CATALOG[name].oracle)
    assert res.description  # has columns
    res.fetchall()


def test_entry_contract():
    import __spark_entry__ as e

    qs = e.queries()
    os_ = e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) == len(CATALOG)
    assert all(callable(f) for f in qs.values())


def test_readme_catalog_counts_match():
    """The README's scoreboard line must track the real catalog — the
    counts drifted twice (VERDICT r03 / ADVICE r03), so pin them."""
    import pathlib
    import re

    readme = (pathlib.Path(__file__).parent.parent / "README.md").read_text()
    m = re.search(r"the (\d+)-query catalog \((\d+) DuckDB-oracle-backed\)",
                  readme)
    assert m, "README scoreboard line not found"
    n_oracle = sum(1 for q in CATALOG.values() if q.oracle)
    assert (int(m.group(1)), int(m.group(2))) == (len(CATALOG), n_oracle), (
        f"README says {m.group(1)}/{m.group(2)}, catalog is "
        f"{len(CATALOG)}/{n_oracle}")


def test_dup_span_hashed_spelling_matches_exact(spark):
    """The 100 TB spelling (xxhash64 gram keys) must produce identical
    per-doc fractions to the oracle-verified raw-gram spelling."""
    from pyspark_deduplication_spark.queries import doc_dup_span_fraction

    sf = "/root/testdata/sf0.001"
    exact = {r.doc_id: (r.n_windows, r.n_dup_windows, r.dup_fraction)
             for r in doc_dup_span_fraction(spark, sf).collect()}
    hashed = {r.doc_id: (r.n_windows, r.n_dup_windows, r.dup_fraction)
              for r in doc_dup_span_fraction(spark, sf,
                                             hash_grams=True).collect()}
    assert exact == hashed


def test_remove_dup_spans_hashed_spelling_matches_exact(spark):
    """The 100 TB spelling (xxhash64 gram keys) must reassemble
    byte-identical cleaned text to the oracle-verified raw-gram
    spelling."""
    from pyspark_deduplication_spark.queries import remove_dup_spans_docs

    sf = "/root/testdata/sf0.001"
    exact = {r.doc_id: (r.n_tokens, r.n_kept, r.clean_md5)
             for r in remove_dup_spans_docs(spark, sf).collect()}
    hashed = {r.doc_id: (r.n_tokens, r.n_kept, r.clean_md5)
              for r in remove_dup_spans_docs(spark, sf,
                                             hash_grams=True).collect()}
    assert exact == hashed
    # the corpus actually exercises removal (some doc loses tokens)
    assert any(k < t for t, k, _ in exact.values())


def test_remove_duplicate_spans_semantics(spark):
    """ExactSubstr removal on a planted fixture: the shared span
    disappears from BOTH docs (remove-every-occurrence semantics),
    unique text survives in order, untouched docs round-trip."""
    from pyspark_deduplication_spark.operators.chunking import (
        remove_duplicate_spans,
    )

    shared = "alpha beta gamma delta"  # 4 tokens = one span window
    docs = spark.createDataFrame(
        [
            (1, f"one two {shared} three four"),
            (2, f"five six seven {shared} eight"),
            (3, "totally unrelated text with unique words only"),
            (4, "   "),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           remove_duplicate_spans(docs, "text", "doc_id", span=4)
           .collect()}
    assert out[1].clean_text == "one two three four"
    assert out[2].clean_text == "five six seven eight"
    assert (out[1].n_tokens, out[1].n_kept) == (8, 4)
    assert out[3].clean_text == "totally unrelated text with unique words only"
    assert out[3].n_kept == out[3].n_tokens == 7
    assert (out[4].n_tokens, out[4].n_kept, out[4].clean_text) == (0, 0, "")
    # whole-doc window floor: two short clones erase each other
    shorts = spark.createDataFrame(
        [(1, "tiny clone"), (2, "tiny clone"), (3, "other words")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.clean_text for r in
           remove_duplicate_spans(shorts, "text", "doc_id", span=4)
           .collect()}
    assert got[1] == got[2] == "" and got[3] == "other words"


def test_remove_dup_spans_w50_published_window(spark):
    """Lee et al.'s production 50-token window on sub-50-token docs:
    the whole-doc-window clause means only EXACT clones erase — a doc
    sharing a long-but-partial span with another is untouched, because
    no 50-token (here: whole-doc) window repeats verbatim."""
    from pyspark_deduplication_spark.operators.chunking import (
        remove_duplicate_spans,
    )

    base = " ".join(f"w{i}" for i in range(30))
    docs = spark.createDataFrame(
        [
            (1, base),                # exact clone pair — both erase
            (2, base),
            (3, base + " extra"),     # superset, not an exact window
            (4, "short unique doc"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in
           remove_duplicate_spans(docs, "text", "doc_id", span=50)
           .collect()}
    assert out[1].clean_text == "" and out[2].clean_text == ""
    assert out[3].n_kept == out[3].n_tokens == 31
    assert out[4].clean_text == "short unique doc"
    # at span=8 the same corpus loses the shared 30-token prefix from
    # doc 3 as well — the window knob is what separates the regimes
    out8 = {r.doc_id: r for r in
            remove_duplicate_spans(docs, "text", "doc_id", span=8)
            .collect()}
    assert out8[3].n_kept == 1 and out8[3].clean_text == "extra"


def test_mixture_waterfill_saturation_cascade(spark):
    """The 20k budget must produce a genuine cascade at sf0.01: the
    Zipf head saturates (planned == inventory), the tail does not, and
    the redistributed total respects the budget while exceeding the
    naive single-pass plan's spend."""
    from pyspark_deduplication_spark.queries import corpus_mixture_waterfill

    rows = corpus_mixture_waterfill(spark, "/root/testdata/sf0.01").collect()
    sat = [r for r in rows if r.saturated]
    unsat = [r for r in rows if not r.saturated]
    assert sat and unsat, (len(sat), len(unsat))
    assert all(r.planned_tokens == r.tokens and r.sample_rate == 1.0
               for r in sat)
    assert all(r.planned_tokens < r.tokens for r in unsat)
    total = sum(r.planned_tokens for r in rows)
    # fixed-round rounding jitter stays within ±1 token per source
    assert total <= 20_000 + len(rows)
    # shortfall really redistributed: unsaturated sources got MORE than
    # their naive global-weight share of the budget
    wsum = sum(1.0 / (int(r.source[3:]) + 1) for r in rows)
    for r in unsat:
        naive = 20_000 * (1.0 / (int(r.source[3:]) + 1)) / wsum
        assert r.planned_tokens > naive, (r.source, r.planned_tokens, naive)


def test_mixture_plan_rejects_malformed_source_ids(spark, tmp_path):
    """ADVICE r4: a source id not shaped src<N> must fail loudly, not
    propagate NULL plan rows."""
    import pytest
    from pyspark.sql import functions as F

    from pyspark_deduplication_spark.queries import corpus_mixture_plan

    src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bad = src.withColumn(
        "source",
        F.when(F.col("doc_id") == 0, F.lit("common-crawl"))
        .otherwise(F.col("source")))
    bad.write.parquet(f"{tmp_path}/documents.parquet")
    with pytest.raises(Exception, match="not shaped src<N>"):
        corpus_mixture_plan(spark, str(tmp_path)).collect()


def test_no_oracle_constant_redefinition():
    """A module-level `_*_ORACLE` name assigned twice silently clobbers
    the earlier query's oracle (the CATALOG literal reads the final
    value) — caught once in round 3 when a new pivot oracle reused
    `_PIVOT_ORACLE`. Parse the module and forbid duplicate assignments."""
    import ast
    import collections
    import inspect

    import pyspark_deduplication_spark.queries as q

    tree = ast.parse(inspect.getsource(q))
    seen = collections.Counter()
    for node in tree.body:
        if isinstance(node, ast.Assign):
            for t in node.targets:
                if isinstance(t, ast.Name) and t.id.endswith("_ORACLE"):
                    seen[t.id] += 1
    dups = {k: v for k, v in seen.items() if v > 1}
    assert not dups, f"oracle constants defined more than once: {dups}"


def test_fused_dedup_coarsens_both_single_signal_partitions(spark, sf_dir):
    """Fused CC must coarsen BOTH single-signal partitions: any two docs
    sharing a lexical-only component or a semantic-only component must
    share a fused component (union of edge sets can only merge), and the
    fused keep-set can never be larger than either single-signal
    keep-set."""
    from pyspark_deduplication_spark.operators.knn import (
        embedding_near_dup_pairs,
    )
    from pyspark_deduplication_spark.operators.linkage import (
        transitive_clusters,
    )
    from pyspark_deduplication_spark.queries import (
        fused_dedup_docs,
        jaccard_near_dup_docs,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # the same single-signal spellings the fused query composes
    lex = jaccard_near_dup_docs(spark, sf_dir).select("id_a", "id_b")
    sem = (embedding_near_dup_pairs(emb, threshold=0.3, block_col="label")
           .select("id_a", "id_b"))
    ids = docs.select("doc_id")

    def comp_map(edges):
        return {r.doc_id: r.component
                for r in transitive_clusters(ids, edges, "doc_id").collect()}

    lex_c, sem_c = comp_map(lex), comp_map(sem)
    fused = {r.doc_id: (r.component, r.keep)
             for r in fused_dedup_docs(spark, sf_dir).collect()}
    assert set(fused) == set(lex_c) == set(sem_c)
    by_lex, by_sem = {}, {}
    for d in fused:
        by_lex.setdefault(lex_c[d], set()).add(fused[d][0])
        by_sem.setdefault(sem_c[d], set()).add(fused[d][0])
    # same single-signal component => same fused component
    assert all(len(v) == 1 for v in by_lex.values())
    assert all(len(v) == 1 for v in by_sem.values())
    n_fused_keep = sum(1 for c, k in fused.values() if k)
    assert n_fused_keep <= len(set(lex_c.values()))
    assert n_fused_keep <= len(set(sem_c.values()))
    # the fusion is non-trivial on this fixture: at least one single-
    # signal component pair actually merged
    assert n_fused_keep < min(len(set(lex_c.values())),
                              len(set(sem_c.values()))) or (
        len(set(lex_c.values())) == len(set(sem_c.values()))
        == n_fused_keep)


def test_lsh_banding_plan_s_curve_math(spark):
    """The planner's S-curve must match the closed form on a planted
    pair set, and recall must be monotone in bands (more, narrower
    bands → higher collision probability at fixed hash budget)."""
    import math

    from pyspark_deduplication_spark.queries import lsh_banding_plan_docs

    rows = {(r["bands"], r["rows_per_band"]): r
            for r in lsh_banding_plan_docs(
                spark, "/root/testdata/sf0.001").collect()}
    assert set(rows) == {(4, 16), (8, 8), (16, 4), (32, 2)}
    for (b, r), row in rows.items():
        assert abs(row["s_star"] - (1.0 / b) ** (1.0 / r)) < 1e-6
        assert 0.0 <= row["exp_recall_target"] <= 1.0
    recalls = [rows[k]["exp_recall_target"]
               for k in ((4, 16), (8, 8), (16, 4), (32, 2))]
    assert recalls == sorted(recalls), recalls


def test_dup_threshold_sensitivity_monotone(spark):
    """Pairs and affected docs must be non-increasing in the threshold
    — each rung's set is a subset of the rung below."""
    from pyspark_deduplication_spark.queries import (
        dup_threshold_sensitivity_docs,
    )

    rows = dup_threshold_sensitivity_docs(
        spark, "/root/testdata/sf0.001").collect()
    ts = [r["threshold"] for r in rows]
    assert ts == sorted(ts) and ts[0] == 0.5
    pairs = [r["n_pairs"] for r in rows]
    docs = [r["n_docs_affected"] for r in rows]
    assert pairs == sorted(pairs, reverse=True)
    assert docs == sorted(docs, reverse=True)


def test_sampled_planners_exact_at_fraction_one(spark):
    """At fraction=1.0 the hash-sample keeps everything and every
    extrapolation weight is exactly 1 — the sampled planner twins must
    reproduce the exact planners value-for-value (the estimator
    machinery adds zero error of its own)."""
    from pyspark_deduplication_spark.queries import (
        dup_threshold_sensitivity_docs,
        dup_threshold_sensitivity_sampled_docs,
        lsh_banding_plan_docs,
        lsh_banding_plan_sampled_docs,
    )

    sf = "/root/testdata/sf0.001"
    exact = {(r["bands"], r["rows_per_band"]): r
             for r in lsh_banding_plan_docs(spark, sf).collect()}
    samp = {(r["bands"], r["rows_per_band"]): r
            for r in lsh_banding_plan_sampled_docs(
                spark, sf, fraction=1.0).collect()}
    assert set(exact) == set(samp)
    for k, e in exact.items():
        s = samp[k]
        assert s["est_target_pairs"] == e["n_target_pairs"]
        assert s["est_gray_pairs"] == e["n_gray_pairs"]
        assert s["exp_recall_target"] == e["exp_recall_target"]
        assert s["exp_gray_hit_rate"] == e["exp_gray_hit_rate"]

    e_rows = {r["threshold"]: r for r in dup_threshold_sensitivity_docs(
        spark, sf).collect()}
    s_rows = {r["threshold"]: r
              for r in dup_threshold_sensitivity_sampled_docs(
                  spark, sf, fraction=1.0).collect()}
    assert set(e_rows) == set(s_rows)
    for t, e in e_rows.items():
        s = s_rows[t]
        assert s["n_pairs_est"] == e["n_pairs"]
        assert s["n_docs_affected_lb"] == e["n_docs_affected"]
        assert s["affected_frac_lb"] == e["affected_frac"]


def test_sampled_planners_agree_with_exact(spark):
    """At the default fraction (0.25) on the sf0.01 fixture the sampled
    estimators must land near the exact report: pair-count estimates
    within a small-sample factor band, the lower-bound doc estimators
    actually below (≈) the exact values, and the S-curve ratio
    estimates within a few points of the exact distribution's."""
    from pyspark_deduplication_spark.queries import (
        dup_threshold_sensitivity_docs,
        dup_threshold_sensitivity_sampled_docs,
        lsh_banding_plan_docs,
        lsh_banding_plan_sampled_docs,
    )

    sf = "/root/testdata/sf0.01"
    exact = {(r["bands"], r["rows_per_band"]): r
             for r in lsh_banding_plan_docs(spark, sf).collect()}
    samp = {(r["bands"], r["rows_per_band"]): r
            for r in lsh_banding_plan_sampled_docs(spark, sf).collect()}
    for k, s in samp.items():
        e = exact[k]
        # ~2 sampled pairs at this SF: allow a wide small-sample band,
        # but the estimate must be the right order of magnitude
        assert e["n_target_pairs"] / 4 <= s["est_target_pairs"] \
            <= e["n_target_pairs"] * 4
        if e["exp_recall_target"] is not None:
            assert abs(s["exp_recall_target"] - e["exp_recall_target"]) < 0.05

    e_rows = {r["threshold"]: r for r in dup_threshold_sensitivity_docs(
        spark, sf).collect()}
    s_rows = {r["threshold"]: r
              for r in dup_threshold_sensitivity_sampled_docs(
                  spark, sf).collect()}
    for t, s in s_rows.items():
        e = e_rows[t]
        assert e["n_pairs"] / 4 <= s["n_pairs_est"] <= e["n_pairs"] * 4
        # documented lower bounds: biased DOWN (partner must also be
        # sampled), so they must not exceed the exact values by more
        # than upweight rounding
        assert 0 < s["n_docs_affected_lb"] <= e["n_docs_affected"] * 1.5
        assert s["affected_frac_lb"] <= e["affected_frac"] * 1.5


def test_c4_rules_known_doc_matrix(spark, tmp_path):
    """Each C4/line rule verified against a handcrafted corpus where
    the pass/fail pattern is known per document — the rule logic is
    pinned here (the parquet fixture is single-line word soup, so the
    fixture report only exercises determinism)."""
    from pyspark_deduplication_spark.queries import c4_quality_rules_docs

    good = ("This is a perfectly normal first sentence of prose.\n"
            "Here is another long and complete second sentence.\n"
            "And finally a third sentence to clear the floor.")
    docs = [
        # doc 0: passes everything
        (0, good),
        # doc 1: all bullets (>90%) -> fails bullet rule; also <3
        # retained sentences (bullet lines lack terminal punct)
        (1, "• first bullet item\n• second bullet item\n• third one"),
        # doc 2: every line ends with an ellipsis -> fails ellipsis
        # rule and the sentence floor
        (2, "to be continued...\nstill going...\nnever ending..."),
        # doc 3: lorem ipsum marker (case-insensitive)
        (3, good + "\nLorem Ipsum dolor sit amet."),
        # doc 4: curly brace (code marker)
        (4, good + "\nfunction f() { return 1; }"),
        # doc 5: a javascript line -> fails the js rule, and the
        # retained-line filter drops that line before counting
        # sentences (still >=3 from the good lines)
        (5, good + "\nPlease enable JavaScript to view this page."),
        # doc 6: fine lines but each has <5 words -> retained set is
        # empty -> fails only the sentence floor
        (6, "Too short.\nAlso short.\nStill short."),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {r["rule"]: r for r in
            c4_quality_rules_docs(spark, str(tmp_path)).collect()}
    assert set(rows) == {
        "bullet_lines_le_90pct", "ellipsis_lines_le_30pct",
        "no_lorem_ipsum", "no_curly_brace", "no_javascript_line",
        "min_3_sentences_retained", "all_rules"}
    n = len(docs)
    expected = {
        "bullet_lines_le_90pct": n - 1,          # doc 1
        "ellipsis_lines_le_30pct": n - 1,        # doc 2
        "no_lorem_ipsum": n - 1,                 # doc 3
        "no_curly_brace": n - 1,                 # doc 4
        "no_javascript_line": n - 1,             # doc 5
        "min_3_sentences_retained": n - 3,       # docs 1, 2, 6 fail
        "all_rules": 1,                          # only doc 0
    }
    got = {k: r["n_pass"] for k, r in rows.items()}
    assert got == expected, got
    for r in rows.values():
        assert r["n_docs"] == n
        assert abs(r["pass_rate"] - round(r["n_pass"] / n, 6)) < 1e-9


def test_c4_signals_consistent_with_rules(spark, tmp_path):
    """The raw signals table and the pass/fail report must agree on
    the handcrafted corpus: thresholding the signals reproduces the
    rule pass counts, and the per-doc dials match hand-computed
    values."""
    from pyspark_deduplication_spark.queries import (
        c4_quality_rules_docs,
        c4_quality_signals_docs,
    )

    docs = [
        (0, "Solid first sentence here.\nAnd a proper second one."),
        (1, "• bullet one\n• bullet two\nplain closing line."),
        (2, "trailing off...\nLorem ipsum filler { code }."),
        (3, "   "),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    sig = {r.doc_id: r for r in
           c4_quality_signals_docs(spark, str(tmp_path)).collect()}
    assert sig[0].n_lines == 2 and sig[0].frac_lines_bullet == 0.0
    assert sig[0].frac_lines_terminal_punct == 1.0
    assert sig[1].n_lines == 3
    assert abs(sig[1].frac_lines_bullet - round(2 / 3, 6)) < 1e-9
    assert sig[2].frac_lines_ellipsis == 0.5
    assert sig[2].has_lorem_ipsum == 1 and sig[2].has_curly_brace == 1
    assert sig[3].n_lines == 0 and sig[3].frac_lines_bullet is None
    # cross-check: thresholding the signals reproduces the rule report
    rules = {r.rule: r.n_pass for r in
             c4_quality_rules_docs(spark, str(tmp_path)).collect()}
    n_bullet_pass = sum(
        1 for r in sig.values()
        if r.n_lines == 0 or r.frac_lines_bullet <= 0.9)
    assert rules["bullet_lines_le_90pct"] == n_bullet_pass
    n_ellipsis_pass = sum(
        1 for r in sig.values()
        if r.n_lines == 0 or r.frac_lines_ellipsis <= 0.3)
    assert rules["ellipsis_lines_le_30pct"] == n_ellipsis_pass
    assert rules["no_lorem_ipsum"] == sum(
        1 for r in sig.values() if r.has_lorem_ipsum == 0)
    assert rules["no_curly_brace"] == sum(
        1 for r in sig.values() if r.has_curly_brace == 0)


def test_gopher_rules_report_conjunction_bound(spark):
    """The all_rules row is the conjunction: its pass count can never
    exceed any individual rule's, and rates are exact count ratios."""
    from pyspark_deduplication_spark.queries import gopher_quality_rules_docs

    rows = {r["rule"]: r for r in gopher_quality_rules_docs(
        spark, "/root/testdata/sf0.001").collect()}
    assert set(rows) == {"word_count_50_100k", "mean_word_len_3_10",
                         "alpha_word_frac_80", "stopword_hits_2",
                         "all_rules"}
    n_docs = {r["n_docs"] for r in rows.values()}
    assert len(n_docs) == 1 and n_docs.pop() == 500
    for k, r in rows.items():
        assert 0 <= r["n_pass"] <= r["n_docs"]
        assert abs(r["pass_rate"] - round(r["n_pass"] / r["n_docs"], 6)) < 1e-9
        if k != "all_rules":
            assert rows["all_rules"]["n_pass"] <= r["n_pass"]


def test_gopher_repetition_signals_hand_matrix(spark, tmp_path):
    """The Gopher repetition dials (Rae et al. 2021 A1.1) on a
    handcrafted corpus with hand-computed expected values: overlapping
    top-gram repeats (frac > 1 allowed, as in the paper's reference
    implementations), union-of-spans dup coverage (each char once),
    0.0 for measurable-but-clean, NULL for too-short."""
    from pyspark_deduplication_spark.queries import (
        gopher_repetition_signals_docs,
    )

    docs = [
        # alternating pair: every window is a repeat of itself
        (0, "aa bb aa bb aa bb"),
        # all-distinct tokens: top fracs are the single-gram floor,
        # every dup frac measurable and 0.0
        (1, "x y z w v u q r s t"),
        # one repeated 5-gram, non-overlapping: covers 10 of 11 chars
        (2, "a b c d e a b c d e f"),
        # empty after normalization -> everything NULL
        (3, "   "),
        # single token -> even the 2-gram signal is NULL
        (4, "hello"),
        # maximal self-overlap: dup coverage still counts chars once
        (5, "z z z z z z"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    sig = {r.doc_id: r for r in
           gopher_repetition_signals_docs(spark, str(tmp_path)).collect()}
    assert len(sig) == len(docs)

    # doc 0: m=6, chars=12; top2 "aa bb" cnt3 gc4 -> 12/12; top3 cnt2
    # gc6 -> 12/12; top4 "aa bb aa bb" cnt2 gc8 -> 16/12; both 5-grams
    # and the single 6-gram are unique -> 0.0; 7..10-grams undefined
    r = sig[0]
    assert r.top_2gram_char_frac == 1.0
    assert r.top_3gram_char_frac == 1.0
    assert abs(r.top_4gram_char_frac - round(16 / 12, 6)) < 1e-9
    assert r.dup_5gram_char_frac == 0.0 and r.dup_6gram_char_frac == 0.0
    assert r.dup_7gram_char_frac is None
    assert r.dup_10gram_char_frac is None

    # doc 1: every gram unique, cnt=1, chars=10 -> top_n = n/10;
    # m=10 so all dup signals measurable and 0.0
    r = sig[1]
    assert r.top_2gram_char_frac == 0.2
    assert r.top_3gram_char_frac == 0.3
    assert r.top_4gram_char_frac == 0.4
    for n in range(5, 11):
        assert getattr(r, f"dup_{n}gram_char_frac") == 0.0

    # doc 2: "a b c d e" repeats at positions 1 and 6 -> 10 of 11
    # chars covered at n=5; no longer gram repeats; top fracs from the
    # doubled prefix grams
    r = sig[2]
    assert abs(r.dup_5gram_char_frac - round(10 / 11, 6)) < 1e-9
    for n in range(6, 11):
        assert getattr(r, f"dup_{n}gram_char_frac") == 0.0
    assert abs(r.top_2gram_char_frac - round(4 / 11, 6)) < 1e-9
    assert abs(r.top_3gram_char_frac - round(6 / 11, 6)) < 1e-9
    assert abs(r.top_4gram_char_frac - round(8 / 11, 6)) < 1e-9

    # docs 3 and 4: nothing to measure
    for d in (3, 4):
        for n in (2, 3, 4):
            assert getattr(sig[d], f"top_{n}gram_char_frac") is None
        for n in range(5, 11):
            assert getattr(sig[d], f"dup_{n}gram_char_frac") is None

    # doc 5: the two overlapping "z z z z z" occurrences cover all 6
    # chars exactly once -> 1.0 (not 10/6); top2 cnt5 gc2 -> 10/6 > 1
    r = sig[5]
    assert r.dup_5gram_char_frac == 1.0
    assert r.dup_6gram_char_frac == 0.0
    assert abs(r.top_2gram_char_frac - round(10 / 6, 6)) < 1e-9


def test_gopher_repetition_rules_threshold_consistency(spark, tmp_path):
    """Thresholding the signals table reproduces the rule report's
    pass counts exactly (NULL signal = vacuous pass), and the
    conjunction row is bounded by every individual rule."""
    from pyspark_deduplication_spark.queries import (
        _REP_DUP_THRESHOLDS,
        _REP_TOP_THRESHOLDS,
        gopher_repetition_rules_docs,
        gopher_repetition_signals_docs,
    )

    docs = [
        (0, "aa bb aa bb aa bb"),          # trips every top rule
        (1, "x y z w v u q r s t"),        # top2 at exactly 0.20: <= passes
        (2, "a b c d e a b c d e f"),      # trips the dup5 rule
        (3, "hi"),                         # NULL signals -> all pass
        (4, "one two three four five six seven eight nine ten eleven"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    sig = gopher_repetition_signals_docs(spark, str(tmp_path)).collect()
    rules = {r.rule: r for r in
             gopher_repetition_rules_docs(spark, str(tmp_path)).collect()}
    assert len(rules) == len(_REP_TOP_THRESHOLDS) + len(
        _REP_DUP_THRESHOLDS) + 1

    def passes(row, col, thr):
        v = getattr(row, col)
        return v is None or v <= thr

    expected_all = 0
    for row in sig:
        ok = all(passes(row, f"top_{n}gram_char_frac", t)
                 for n, t in _REP_TOP_THRESHOLDS.items())
        ok = ok and all(passes(row, f"dup_{n}gram_char_frac", t)
                        for n, t in _REP_DUP_THRESHOLDS.items())
        expected_all += int(ok)
    for n, t in _REP_TOP_THRESHOLDS.items():
        name = f"top_{n}gram_char_frac_le_{int(t * 100)}pct"
        want = sum(int(passes(r, f"top_{n}gram_char_frac", t)) for r in sig)
        assert rules[name].n_pass == want, name
    for n, t in _REP_DUP_THRESHOLDS.items():
        name = f"dup_{n}gram_char_frac_le_{int(round(t * 100))}pct"
        want = sum(int(passes(r, f"dup_{n}gram_char_frac", t)) for r in sig)
        assert rules[name].n_pass == want, name
    assert rules["all_rules"].n_pass == expected_all
    # doc 1 sits exactly ON the top-2 threshold (0.20) and must pass;
    # doc 3 is NULL and passes vacuously; docs 0/2/4 trip it (1.0,
    # 4/11, and 10/45 — the all-distinct doc still "tops" at its
    # longest bigram, 'seven eight' = 10 of 45 chars)
    assert rules["top_2gram_char_frac_le_20pct"].n_pass == 2
    for k, r in rules.items():
        assert r.n_docs == len(docs)
        assert abs(r.pass_rate - round(r.n_pass / len(docs), 6)) < 1e-9
        if k != "all_rules":
            assert rules["all_rules"].n_pass <= r.n_pass


def test_dedup_keep_best_quality_argmax_not_min_id(spark, tmp_path):
    """Survivorship must keep the highest-QUALITY member, not the
    min-id: punctuation is stripped by shingle normalization (so the
    planted pairs are exact near-dups, J=1.0) but raw-text punctuation
    lowers the quality score — the clean higher-id twin must win.
    Ties fall back to min doc_id; singletons never appear."""
    from pyspark_deduplication_spark.queries import (
        dedup_keep_best_quality_docs,
    )

    # three DISJOINT base texts (no shared 3-grams), so the planted
    # clusters cannot transitively merge
    base_a = ("the quick brown fox jumps over a lazy dog near the "
              "river bank today")
    base_b = ("market prices rose sharply while cautious traders "
              "watched global supply signals")
    base_c = ("gentle rain settled across sleeping valleys before "
              "morning light returned again")
    noisy_a = base_a.replace(" ", " !?! ", 8)  # same tokens, punct-heavy
    noisy_c = base_c.replace(" ", " !?! ", 8)
    docs = [
        (10, noisy_a),              # dirty, LOWER id
        (11, base_a),               # clean, higher id -> must win
        (20, base_b),               # exact tie pair ...
        (21, base_b),               # ... min-id wins
        (30, "completely different singleton content stands alone here"),
        (40, noisy_c),              # triple: 41 is cleanest
        (41, base_c),
        (42, noisy_c + "!!"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = dedup_keep_best_quality_docs(spark, str(tmp_path)).collect()
    by_doc = {r.doc_id: r for r in rows}
    assert 30 not in by_doc                      # singleton excluded
    kept = {r.doc_id for r in rows if r.keep == 1}
    assert 11 in kept and 10 not in kept         # argmax beats min-id
    assert by_doc[11].quality > by_doc[10].quality
    assert 20 in kept and 21 not in kept         # tie -> min id
    assert by_doc[20].quality == by_doc[21].quality
    assert 41 in kept and 40 not in kept and 42 not in kept
    assert by_doc[41].cluster_size == 3
    # exactly one keeper per component, every member reported
    import collections
    per_comp = collections.Counter(r.component for r in rows if r.keep == 1)
    sizes = {r.component: r.cluster_size for r in rows}
    members = collections.Counter(r.component for r in rows)
    assert all(v == 1 for v in per_comp.values())
    assert all(members[c] == s for c, s in sizes.items())
    # the production LSH-pair spelling must agree exactly here: every
    # planted cluster is J=1.0 (identical shingle sets -> identical
    # signatures -> guaranteed band collision, recall 1.0)
    lsh_rows = dedup_keep_best_quality_docs(
        spark, str(tmp_path), lsh_pairs=True).collect()
    key = lambda r: (r.component, r.doc_id, r.quality,  # noqa: E731
                     r.cluster_size, r.keep)
    assert sorted(map(key, lsh_rows)) == sorted(map(key, rows))


def test_dedup_signal_overlap_combos(spark, tmp_path):
    """Planted pairs land in the right signal buckets: identical text
    + identical embedding -> three-way core; same shingle SET with
    wildly different multiplicities -> lex-only (generalized Jaccard
    dilutes); repeated boilerplate phrase -> wtd-only (distinct-set
    Jaccard dilutes); paraphrase twins (same embedding, different
    text) -> sem-only."""
    from pyspark_deduplication_spark.queries import (
        dedup_signal_overlap_report,
    )

    twelve = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"
    phrase = ("m n o " * 15).strip()
    docs = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta theta"),
        (3, twelve),
        (4, " ".join([twelve] * 3)),
        (5, phrase),
        (6, phrase + " uniq1 uniq2 uniq3 uniq4 uniq5 uniq6"),
        (7, "completely different seven text content here"),
        (8, "unrelated eight words that share nothing lexical"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    v = [1.0, 2.0, 3.0, 4.0]
    far = [-4.0, 3.0, -2.0, 1.0]          # orthogonal-ish, cosine 0
    emb = [
        (1, v, "a"), (2, v, "a"),          # sem fires for (1,2)
        (3, v, "c3"), (4, v, "c4"),        # label-blocked
        (5, far, "c5"), (6, v, "c6"),
        (7, v, "b"), (8, v, "b"),          # sem-only pair
    ]
    edf = spark.createDataFrame(
        emb, "vec_id long, embedding array<float>, label string")
    edf.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    rows = {r.signals: r for r in
            dedup_signal_overlap_report(spark, str(tmp_path)).collect()}
    assert set(rows) == {"lex+sem+wtd", "lex", "wtd", "sem"}, rows
    assert all(r.n_pairs == 1 for r in rows.values())
    assert all(abs(r.share - 0.25) < 1e-9 for r in rows.values())


def test_signal_overlap_sampled_exact_at_fraction_one(spark):
    """At fraction=1.0 the hash-sample keeps everything and the pair
    weight is exactly 1 — the sampled overlap report must reproduce
    the exact report value-for-value (only the count column is
    renamed est_n_pairs)."""
    from pyspark_deduplication_spark.queries import (
        dedup_signal_overlap_report,
        dedup_signal_overlap_sampled_docs,
    )

    sf = "/root/testdata/sf0.001"
    exact = {r.signals: r for r in
             dedup_signal_overlap_report(spark, sf).collect()}
    samp = {r.signals: r for r in dedup_signal_overlap_sampled_docs(
        spark, sf, fraction=1.0).collect()}
    assert set(exact) == set(samp)
    for k, e in exact.items():
        assert samp[k].est_n_pairs == e.n_pairs
        assert samp[k].share == e.share


def test_signal_overlap_sampled_estimates_reasonable(spark):
    """At the default fraction (0.25) on sf0.01: every sampled combo
    class exists in the exact report, the dominant class matches, and
    the extrapolated total pair count lands within a small-sample
    band of the exact total (f²=1/16 thinning of ~136 pairs leaves
    only a handful, so the band is loose but bounded)."""
    from pyspark_deduplication_spark.queries import (
        dedup_signal_overlap_report,
        dedup_signal_overlap_sampled_docs,
    )

    sf = "/root/testdata/sf0.01"
    exact = {r.signals: r.n_pairs for r in
             dedup_signal_overlap_report(spark, sf).collect()}
    samp = {r.signals: r.est_n_pairs for r in
            dedup_signal_overlap_sampled_docs(spark, sf).collect()}
    assert samp, "sample produced no pairs at all"
    assert set(samp) <= set(exact), (set(samp), set(exact))
    n_exact, n_samp = sum(exact.values()), sum(samp.values())
    assert 0.2 * n_exact <= n_samp <= 5 * n_exact, (n_exact, n_samp)
    assert max(samp, key=samp.get) == max(exact, key=exact.get)


def test_incremental_keep_best_quality_actions(spark, tmp_path):
    """Dedup-with-upgrade decisions on planted batch/corpus twins:
    a better batch doc REPLACES its corpus twin, a worse one DROPS,
    an exact tie DROPS (standing corpus wins - idempotent replay),
    unmatched inserts, and a multi-match batch doc is judged against
    the BEST corpus match."""
    from pyspark_deduplication_spark.queries import (
        incremental_keep_best_quality_docs,
    )

    base_a = ("the quick brown fox jumps over a lazy dog near the "
              "river bank today")
    base_b = ("market prices rose sharply while cautious traders "
              "watched global supply signals")
    base_c = ("gentle rain settled across sleeping valleys before "
              "morning light returned again")
    base_d = ("seven silver engines hummed beneath the frozen station "
              "platform during winter repairs")
    dirty = lambda s: s.replace(" ", " !?! ", 8)  # noqa: E731
    docs = [
        # corpus (even) / batch (odd)
        (2, dirty(base_a)), (3, base_a),     # batch cleaner -> replace 2
        (4, base_b), (5, dirty(base_b)),     # corpus cleaner -> drop
        (6, base_c), (7, base_c),            # exact tie -> drop (corpus)
        (9, "wholly new unmatched content that inserts cleanly here"),
        # multi-match on its OWN base text (no cross-group 3-grams):
        # 8 dirty, 10 clean, batch 11 mid-dirty (4 marks) -> best match
        # is 10; 11 is worse than 10 -> drop, matched 10
        (8, dirty(base_d)), (10, base_d),
        (11, base_d.replace(" ", " !?! ", 4)),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {r.doc_id: r for r in
            incremental_keep_best_quality_docs(spark, str(tmp_path))
            .collect()}
    assert set(rows) == {3, 5, 7, 9, 11}     # one row per batch doc
    assert rows[3].action == "replace" and rows[3].matched_id == 2
    assert rows[3].batch_quality > rows[3].corpus_quality
    assert rows[5].action == "drop" and rows[5].matched_id == 4
    assert rows[7].action == "drop" and rows[7].matched_id == 6
    assert rows[7].batch_quality == rows[7].corpus_quality
    assert rows[9].action == "insert"
    assert rows[9].matched_id is None and rows[9].corpus_quality is None
    assert rows[11].action == "drop" and rows[11].matched_id == 10


def test_repetition_signals_hashed_spelling_matches_exact(spark):
    """The 100 TB spelling (xxhash64 gram keys) must produce identical
    per-doc repetition dials to the oracle-verified raw-gram
    spelling."""
    from pyspark_deduplication_spark.queries import (
        gopher_repetition_signals_docs,
    )

    sf = "/root/testdata/sf0.001"
    cols = None
    exact = {}
    for r in gopher_repetition_signals_docs(spark, sf).collect():
        d = r.asDict()
        exact[d.pop("doc_id")] = d
        cols = cols or sorted(d)
    hashed = {}
    for r in gopher_repetition_signals_docs(spark, sf,
                                            hash_grams=True).collect():
        d = r.asDict()
        hashed[d.pop("doc_id")] = d
    assert exact == hashed
    # the corpus actually exercises the signals (nonzero top fracs)
    assert any(v["top_2gram_char_frac"] for v in exact.values())


def test_strip_html_adversarial_markup(spark):
    """The extractor on hostile markup: multiline/uppercase script
    blocks vanish wholesale, style and comments vanish, entities
    decode in the order that cannot double-decode (&amp;lt; -> '&lt;'
    literal, never '<'), and malformed tags degrade to whitespace
    rather than eating visible text."""
    from pyspark_deduplication_spark.functions.text import strip_html

    cases = [
        ("<SCRIPT>\nvar a = '<p>not text</p>';\n</SCRIPT>ok", "ok"),
        ("<style>p { content: '<fake>' }</style>visible", "visible"),
        ("a<!-- multi\nline\ncomment -->b", "a b"),
        ("x &amp;lt; y", "x &lt; y"),          # no double decode
        ("5 &lt; 6 &amp;&amp; 7 &gt; 2", "5 < 6 && 7 > 2"),
        ("<div class='q' data-x=\"1\">inner</div>", "inner"),
        ("plain text with no markup", "plain text with no markup"),
        ("<p>spaced</p>\n\n<p>out</p>", "spaced out"),
        ("&quot;q&#39;s&quot;&nbsp;end", "\"q's\" end"),
    ]
    df = spark.createDataFrame(
        list(enumerate(c[0] for c in cases)), "i long, html string")
    got = {r.i: r.out for r in
           df.select("i", strip_html("html").alias("out")).collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_unicode_whitespace_policy_pins(spark):
    """The engine-wide Unicode-whitespace policy, pinned (VERDICT r11
    item 8). Java/RE2 ``\\s`` is ASCII-only; the kernels differ by
    design:

    - ``strip_html`` collapses the FULL Python-Unicode ``\\s`` class
      (``WS_RUN_RE``) — extracted web text must not carry raw NBSP;
    - ``normalize_text``/``tokenize`` already treat NBSP (and every
      other Unicode space) as a separator via the ``[^a-z0-9\\s]``
      punctuation strip — no change needed, pinned here;
    - ``pretokenize`` keeps GPT-2 fidelity: Unicode spaces fall in the
      punctuation-run class (``[^a-zA-Z0-9\\s']``), so they become
      their own pretoken units rather than splitting like ASCII
      space — matching the released pattern's ASCII-\\s behavior.
    """
    import re

    from pyspark.sql import functions as F

    from pyspark_deduplication_spark.functions.text import (
        UNICODE_EXTRA_WS,
        WS_RUN_RE,
        normalize_text,
        pretoken_count,
        strip_html,
        tokenize,
    )

    # the class IS Python's \s minus ASCII — equivalence by enumeration
    py_ws = {c for c in map(chr, range(0x11000)) if re.match(r"\s", c)}
    assert set(UNICODE_EXTRA_WS) == py_ws - set(" \t\n\x0b\f\r")
    # ASCII spelled explicitly (NOT \s): RE2's \s omits \x0b while
    # Java's includes it, so bare \s would silently diverge between
    # Spark and the DuckDB oracles on vertical-tab text (ADVICE r12).
    # The explicit class must still equal Python's FULL \s by match.
    assert WS_RUN_RE == "[ \\t\\n\\x0b\\f\\r" + UNICODE_EXTRA_WS + "]+"
    ws_re = re.compile(WS_RUN_RE)
    for c in map(chr, range(0x11000)):
        assert bool(ws_re.fullmatch(c)) == bool(re.fullmatch(r"\s", c)), (
            hex(ord(c)))

    df = spark.createDataFrame(
        [(0, "a\xa0b"), (1, " x "), (2, "\xa0\xa0"),
         (3, "one　two")],
        "i long, t string")
    rows = {r.i: r for r in df.select(
        "i",
        strip_html(F.col("t")).alias("html_out"),
        normalize_text("t").alias("norm"),
        tokenize("t").alias("toks"),
        pretoken_count("t").alias("n_pre"),
    ).collect()}
    assert rows[0].html_out == "a b" and rows[0].norm == "a b"
    assert rows[0].toks == ["a", "b"]
    assert rows[1].html_out == "x" and rows[1].norm == "x"
    assert rows[2].html_out == "" and rows[2].norm == ""
    assert rows[3].toks == ["one", "two"]
    # pretokenizer: 'a\xa0b' -> ['a', '\xa0', 'b'] (3 units, the NBSP
    # is a punctuation run), unlike 'a b' -> ['a', ' b'] (2 units)
    assert rows[0].n_pre == 3


def test_charref_decode_matches_html_unescape(spark):
    """The bounded numeric-charref table (VERDICT r12 item 3) agrees
    with Python's ``html.unescape`` on every decoded codepoint, in
    every spelling — decimal, hex, upper-hex, zero-padded — modulo
    the whitespace collapse (U+00A0 maps to plain space by design).
    The ampersand family is single-pass: '&amp;#38;' must surface the
    LITERAL '&#38;', exactly like html.unescape, never cascade to
    '&'. Charrefs outside the table survive verbatim (the documented
    bounded contract — html.unescape would decode them, pinned here
    as the known divergence)."""
    import html as htmlmod
    import re

    from pyspark.sql import functions as F

    from pyspark_deduplication_spark.functions.text import (
        _CHARREFS,
        strip_html,
    )

    cases = []
    for cp, ch in _CHARREFS:
        cases.append(f"a &#{cp}; b")
        cases.append(f"a &#0{cp}; b")
        cases.append(f"a &#x{cp:x}; b")
        cases.append(f"a &#X{cp:X}; b")
        assert htmlmod.unescape(f"&#{cp};") == (
            "\xa0" if cp == 160 else ch)
    cases += ["&amp;#38; literal", "&amp;lt; literal",
              "&#8364; outside-table",
              "x &rsquo;&mdash;&hellip;&copy; y",  # named typographic
              "it&apos;s &ldquo;q&rdquo; &ndash; &deg;&middot;&times;"
              "&bull;&reg;&trade;&lsquo;ok&rsquo;"]
    df = spark.createDataFrame(list(enumerate(cases)), "i long, t string")
    got = {r.i: r.s for r in
           df.select("i", strip_html("t").alias("s")).collect()}
    for i, t in enumerate(cases):
        if "outside-table" in t:
            want = t  # bounded contract: € charref survives verbatim
        else:
            want = re.sub(r"\s+", " ", htmlmod.unescape(t)).strip()
        assert got[i] == want, (t, got[i], want)


def test_unicode_lower_divergence_codepoints_pinned(spark):
    """The ``normalize_text_unicode`` cross-engine caveat, as an
    executable contract (VERDICT r12 item 7): sweep every BMP LETTER
    codepoint through Spark's ``lower()`` and DuckDB's (utf8proc)
    ``lower()`` and pin the exact divergence set. Graded fixtures
    stay on the ASCII kernel because of precisely these codepoints;
    this test turns the prose caveat into a list that fails loudly
    if either engine's casing tables move."""
    import unicodedata

    import duckdb
    from pyspark.sql import functions as F

    chars = [chr(cp) for cp in range(0x80, 0x10000)
             if unicodedata.category(chr(cp)).startswith("L")]
    df = spark.createDataFrame([(c,) for c in chars], "c string")
    s_lower = {r.c: r.l for r in
               df.select("c", F.lower("c").alias("l")).collect()}
    con = duckdb.connect()
    d_lower = {c: con.execute("select lower(?)", [c]).fetchone()[0]
               for c in chars}
    diverged = sorted(c for c in chars if s_lower[c] != d_lower[c])
    # The pinned contract — two divergence classes, 9 codepoints:
    # 1. MAPPING SEMANTICS: dotted capital İ (U+0130) — the JVM
    #    applies the Unicode FULL mapping (i + COMBINING DOT ABOVE),
    #    utf8proc the SIMPLE mapping (bare 'i'). Final sigma (Σ→ς)
    #    is contextual in both engines' simple mappings (Σ lowers to
    #    σ unconditionally) so it does NOT diverge codepoint-wise.
    # 2. UNICODE VERSION SKEW: eight capitals added in Unicode
    #    12-14 (Glagolitic caudate chrivi + seven Latin Extended-D
    #    letters: Old Polish O, D/S with short stroke overlay,
    #    closed insular G, Middle Scots S, sigmoid S, reversed half
    #    H) — the JVM's casing tables know them, this DuckDB
    #    build's utf8proc predates them and returns them UNCHANGED.
    assert [ord(c) for c in diverged] == [
        0x0130, 0x2C2F, 0xA7C0, 0xA7C7, 0xA7C9,
        0xA7D0, 0xA7D6, 0xA7D8, 0xA7F5,
    ], [hex(ord(c)) for c in diverged]
    assert s_lower["İ"] == "i̇" and d_lower["İ"] == "i"
    for c in diverged[1:]:
        # skew class: JVM lowers, utf8proc passes through
        assert d_lower[c] == c and s_lower[c] != c, hex(ord(c))


def test_main_content_extraction_semantics(spark):
    """extract_main_content pins (VERDICT r11 item 4): the density
    gate (not length) kills long link-bars, the length gate kills
    short stray blocks, inline links inside long prose survive, and
    the extraction chains into the C4 doc rules — boilerplate that
    fails no_curly_brace / no_javascript on the raw page passes
    after extraction."""
    from pyspark.sql import functions as F

    from pyspark_deduplication_spark.functions.text import (
        extract_main_content,
        strip_html,
    )

    art1 = ("The actual article text is long enough to keep and has "
            "no links at all in it.")
    art2 = ("Second paragraph keeps a single inline "
            "<a href=\"/r\">reference link</a> inside longer prose.")
    page = (
        "<html><head><title>T</title><script>var x = '<p>no</p>';"
        "</script><style>p { color: red; }</style></head><body>"
        # link-bar: 30 visible chars (passes the >=20 length gate) but
        # 24 anchor chars -> density 0.8 kills it
        "<div><a href=\"/\">HomePage</a> | <a href=\"/a\">AboutUs</a>"
        " | <a href=\"/c\">ContactUs</a></div>"
        # stray short block: linkless but under 20 chars
        "<div>skip me</div>"
        "<p>" + art1 + "</p><p>" + art2 + "</p>"
        # footer chrome that violates C4 rules on the raw page; its
        # anchor share (41 of 78 chars) trips the 1/3 density gate
        "<div>Please enable JavaScript { } | "
        "<a href=\"/t\">Terms of use</a> | "
        "<a href=\"/p\">Privacy policy</a> | "
        "<a href=\"/c\">Cookie settings</a></div>"
        "</body></html>")
    df = spark.createDataFrame([(page,)], "html string")
    row = df.select(
        extract_main_content("html").alias("main"),
        strip_html("html").alias("raw")).head()
    want = art1 + " " + "Second paragraph keeps a single inline " \
        "reference link inside longer prose."
    assert row.main == want, row.main
    # the chain: C4 doc rules flip from fail (raw page) to pass (main)
    for txt, ok in [(row.raw, False), (row.main, True)]:
        no_curly = "{" not in txt
        no_js = "javascript" not in txt.lower()
        assert (no_curly and no_js) is ok, (txt, ok)


def test_warc_sliced_binary_payloads(spark):
    """Content-Length slicing on a mixed text/binary WARC blob
    (VERDICT r11 item 3): payloads carrying every heuristic-killer —
    embedded blank lines, an embedded fake WARC/1.0 version line,
    trailing CRLF runs, and a REAL binary image (an ASCII-safe P6 PPM
    whose pixel bytes round-trip through the string column) — must
    recover byte-exactly, the recovered PPM must decode through the
    multimodal parser, and the blank-line heuristic parser must be
    demonstrably corrupted on the same blob (the reason the sliced
    parser exists)."""
    from pyspark.sql import functions as F

    from pyspark_deduplication_spark.functions.text import (
        warc_header_of,
        warc_records_of,
        warc_records_sliced,
    )
    from pyspark_deduplication_spark.operators.multimodal import parse_ppm

    crlf, blank = "\r\n", "\r\n\r\n"

    def rec(uri, payload):
        return ("WARC/1.0" + crlf + "WARC-Type: response" + crlf
                + "WARC-Target-URI: " + uri + crlf
                + "Content-Length: " + str(len(payload))
                + blank + payload + blank)

    # 2x2 P6 PPM with all pixel bytes < 0x80 so UTF-8 round-trips them;
    # includes 0x0d 0x0a 0x0d 0x0a (an embedded blank line) as pixels
    ppm = "P6\n2 2\n255\n" + "".join(
        chr(b) for b in [13, 10, 13, 10, 87, 65, 82, 67, 47, 49, 46, 48])
    cases = {
        "doc://t/1": "text\r\n\r\nWARC/1.0\r\nmid\r\n\r\n",
        "doc://t/2": ppm,
        "doc://t/3": "",
        "doc://t/4": "ends in CRLF run\r\n\r\n\r\n",
    }
    blob = "".join(rec(u, p) for u, p in cases.items())
    df = spark.createDataFrame([(blob,)], "blob string")
    rows = (df.select(F.explode(warc_records_sliced("blob")).alias("r"))
            .select(warc_header_of(F.col("r.headers"), "WARC-Target-URI")
                    .alias("uri"), F.col("r.payload").alias("p"))
            .collect())
    got = {r.uri: r.p for r in rows}
    assert got == cases, got
    # the recovered "binary" payload decodes as a real image
    w, h, px = parse_ppm(got["doc://t/2"].encode("utf-8"))
    assert (w, h) == (2, 2) and px.shape == (2, 2, 3)
    # and the heuristic parser IS corrupted on this blob: the embedded
    # version line splits records, embedded blank lines truncate
    old = df.select(F.size(warc_records_of("blob")).alias("n")).head().n
    assert old != len(cases)


def test_warc_binary_kernel_octet_exact_gzip_and_ppm(spark):
    """The BinaryType WARC kernel (VERDICT r12 item 2), pinned on
    payloads a string column cannot even carry:

    - TRUE binary payloads (bytes ≥ 0x80 that are not valid UTF-8,
      including every adversarial sentinel shape) recover byte-exactly
      by octet slicing;
    - a real P6 PPM whose PIXELS include 0xFF/0x00 bytes and a fake
      record terminator decodes through ``multimodal.parse_ppm``;
    - on the multi-byte-UTF-8 fixture shape the STRING kernel's char
      cursor provably mis-slices (Content-Length counts octets, the
      payload has fewer chars than octets) while the binary kernel
      round-trips — the reason the twin exists;
    - ``gzip_members=True`` inflates a multi-member ``.warc.gz`` blob
      (one gzip member per record, the CommonCrawl layout) to the same
      records, and a truncated trailing member degrades to the records
      already inflated, never to garbage."""
    import gzip

    from pyspark.sql import functions as F

    from pyspark_deduplication_spark.functions.text import (
        warc_header_of,
        warc_records_sliced,
        warc_records_sliced_binary,
    )
    from pyspark_deduplication_spark.operators.multimodal import parse_ppm

    crlf, blank = b"\r\n", b"\r\n\r\n"

    def rec(uri: str, payload: bytes) -> bytes:
        return (b"WARC/1.0" + crlf + b"WARC-Type: response" + crlf
                + b"WARC-Target-URI: " + uri.encode() + crlf
                + b"Content-Length: " + str(len(payload)).encode()
                + blank + payload + blank)

    ppm = (b"P6\n2 2\n255\n"
           + bytes([255, 0, 128, 13, 10, 13, 10, 87, 65, 82, 67, 0]))
    cases = {
        "doc://b/1": b"\xff\xfe raw bytes \r\n\r\nWARC/1.0\r\n tail \r\n",
        "doc://b/2": ppm,
        "doc://b/3": "café — multi-byte …".encode(),
        "doc://b/4": b"",
    }
    blob = b"".join(rec(u, p) for u, p in cases.items())
    df = spark.createDataFrame([(blob,)], "blob binary")
    rows = (df.select(F.explode(warc_records_sliced_binary("blob"))
                      .alias("r"))
            .select(warc_header_of(F.col("r.headers"), "WARC-Target-URI")
                    .alias("uri"), F.col("r.payload").alias("p"))
            .collect())
    assert {r.uri: bytes(r.p) for r in rows} == cases

    # recovered binary image decodes: pixel bytes incl. 0xFF/0x00
    got_ppm = next(bytes(r.p) for r in rows if r.uri == "doc://b/2")
    w, h, px = parse_ppm(got_ppm)
    assert (w, h) == (2, 2) and px[0, 0, 0] == 255 and px[0, 0, 2] == 128

    # char cursor mis-slices where octets > chars: same records as a
    # STRING blob (valid UTF-8 only, so it CAN ride a string column)
    tcases = {u: p for u, p in cases.items() if u in ("doc://b/3",)}
    tblob = b"".join(rec(u, p) for u, p in tcases.items()) \
        + rec("doc://b/5", b"second record shreds")
    sdf = spark.createDataFrame([(tblob.decode("utf-8"), tblob)],
                                "sblob string, bblob binary")
    n_char, n_byte = sdf.select(
        F.size(warc_records_sliced("sblob")).alias("nc"),
        F.size(warc_records_sliced_binary("bblob")).alias("nb"),
    ).head()
    assert n_byte == 2
    # the char cursor overshoots record 1's payload (35 octets = 31
    # chars), landing past the terminator → record 2 never parses
    # cleanly: fewer records, and the first payload it DOES emit
    # differs from the true bytes
    assert n_char < n_byte
    first_char_payload = sdf.select(
        warc_records_sliced("sblob")[0]["payload"].alias("p")
    ).head().p
    assert first_char_payload.encode() != tcases["doc://b/3"]

    # multi-member gzip: one member per record (CommonCrawl layout)
    gz_parts = [gzip.compress(rec(u, p)) for u, p in cases.items()]
    gz = b"".join(gz_parts)
    gdf = spark.createDataFrame([(gz,)], "blob binary")
    grows = (gdf.select(
        F.explode(warc_records_sliced_binary("blob", gzip_members=True))
        .alias("r"))
        .select(warc_header_of(F.col("r.headers"), "WARC-Target-URI")
                .alias("uri"), F.col("r.payload").alias("p"))
        .collect())
    assert {r.uri: bytes(r.p) for r in grows} == cases

    # member 3 truncated to its bare 10-byte gzip header → inflation
    # stops after the two complete members; the cursor scan (and its
    # drop-partial-record guard) hands back exactly their records
    trunc = b"".join(gz_parts[:2]) + gz_parts[2][:10]
    tdf = spark.createDataFrame([(trunc,)], "blob binary")
    n_trunc = tdf.select(
        F.size(warc_records_sliced_binary("blob", gzip_members=True))
        .alias("n")).head().n
    assert n_trunc == 2


def test_warc_records_parse_semantics(spark):
    """The WARC splitter on a hand-built multi-record blob: record
    count and per-record header/payload recovery, headers-only
    records degrade to an empty payload, absent headers extract as
    empty string, and trailing record terminators never leak into
    payloads."""
    from pyspark_deduplication_spark.functions.text import (
        warc_header_of,
        warc_records_of,
    )
    from pyspark.sql import functions as F

    crlf = "\r\n"
    blob = (
        "WARC/1.0" + crlf + "WARC-Type: warcinfo" + crlf
        + "WARC-Date: 2026-01-01" + crlf + crlf
        + "software: synthetic" + crlf + crlf
        + "WARC/1.0" + crlf + "WARC-Type: request" + crlf
        + "WARC-Target-URI: doc://src0/7" + crlf + crlf
        + "GET /7" + crlf + crlf
        + "WARC/1.0" + crlf + "WARC-Type: response" + crlf
        + "WARC-Target-URI: doc://src0/7" + crlf
        + "Content-Length: 11" + crlf + crlf
        + "hello world" + crlf + crlf
        # headers-only record (no blank-line separator at all)
        + "WARC/1.0" + crlf + "WARC-Type: metadata"
    )
    df = spark.createDataFrame([(blob,)], "blob string")
    recs = df.select(
        F.posexplode(warc_records_of("blob")).alias("i", "r")
    ).select(
        "i",
        warc_header_of(F.col("r.headers"), "WARC-Type").alias("t"),
        warc_header_of(F.col("r.headers"), "WARC-Target-URI").alias("u"),
        F.col("r.payload").alias("p"),
    ).collect()
    rows = {r.i: r for r in recs}
    assert len(rows) == 4
    assert rows[0].t == "warcinfo" and rows[0].p == "software: synthetic"
    assert rows[0].u == ""                      # absent header -> empty
    assert rows[1].t == "request" and rows[1].p == "GET /7"
    assert rows[2].t == "response" and rows[2].p == "hello world"
    assert rows[2].u == "doc://src0/7"
    assert rows[3].t == "metadata" and rows[3].p == ""


def test_unicode_normalize_keeps_every_script(spark):
    """normalize_text_unicode pins: non-Latin letters survive (the
    ASCII kernel deletes them), Unicode spaces separate, punctuation
    and symbols strip, digits of any script stay."""
    from pyspark.sql import functions as F

    from pyspark_deduplication_spark.functions.text import (
        normalize_text,
        normalize_text_unicode,
        tokenize_unicode,
    )

    cases = [
        (0, "Héllo, Wörld!", "héllo wörld", ["héllo", "wörld"]),
        (1, "русский\xa0текст.", "русский текст",
         ["русский", "текст"]),
        (2, "中文文本，没有空格", "中文文本 没有空格",
         ["中文文本", "没有空格"]),
        (3, "mixed 123 αβγ—dash", "mixed 123 αβγ dash",
         ["mixed", "123", "αβγ", "dash"]),
    ]
    df = spark.createDataFrame([(i, t) for i, t, _, _ in cases],
                               "i long, t string")
    rows = {r.i: r for r in df.select(
        "i", normalize_text_unicode("t").alias("u"),
        normalize_text("t").alias("a"),
        tokenize_unicode("t").alias("toks")).collect()}
    for i, _, want_norm, want_toks in cases:
        assert rows[i].u == want_norm, (i, rows[i].u)
        assert rows[i].toks == want_toks, (i, rows[i].toks)
    # and the ASCII kernel really does lose the non-Latin scripts —
    # the reason the unicode twin exists
    assert rows[1].a == "" and rows[2].a == ""


def test_http_split_message_semantics(spark):
    """HTTP message framing (VERDICT r13 item 3) on hand-built
    payloads: status line / headers / body split at the first
    CRLF CRLF scanned on BYTES (a multi-byte body cannot shift the
    boundary), LF LF tolerated, header bytes decode latin-1
    losslessly, non-HTTP payloads degrade to (''/''/whole-payload),
    and the case-insensitive http_header_of reads real-world header
    spellings."""
    from pyspark.sql import functions as F

    from pyspark_deduplication_spark.functions.text import (
        http_header_of,
        http_split_message,
    )

    body_utf8 = "café — body with \r\n\r\n inside …".encode("utf-8")
    full = (b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n"
            b"X-Crawler: cc\r\n\r\n" + body_utf8)
    lflf = (b"HTTP/1.0 301 Moved\nlocation: http://x/\n\n"
            b"moved")
    # latin-1 header byte 0xE9 (é) — must decode losslessly, not raise
    lat = (b"HTTP/1.1 200 OK\r\nX-Note: caf\xe9\r\n\r\nok")
    bare = b"<html>no http head</html>"
    trunc = b"HTTP/1.1 200 OK\r\nContent-Type: text"  # no blank line
    cases = [(0, full), (1, lflf), (2, lat), (3, bare), (4, trunc),
             (5, None)]
    df = spark.createDataFrame(cases, "i long, p binary")
    rows = {r.i: r for r in df.select(
        "i", http_split_message("p").alias("m")).select(
        "i", "m.status_line", "m.headers", "m.body",
        http_header_of(F.col("m.headers"), "Content-Type")
        .alias("ct"),
        http_header_of(F.col("m.headers"), "Location").alias("loc"),
    ).collect()}
    assert rows[0].status_line == "HTTP/1.1 200 OK"
    assert bytes(rows[0].body) == body_utf8
    assert rows[0].ct == "text/html; charset=utf-8"
    assert rows[1].status_line == "HTTP/1.0 301 Moved"
    assert bytes(rows[1].body) == b"moved"
    assert rows[1].loc == "http://x/"  # case-insensitive match
    assert rows[2].headers == "X-Note: caf\xe9"
    assert bytes(rows[2].body) == b"ok"
    # non-HTTP and truncated-head payloads: whole payload as body
    for i, raw in [(3, bare), (4, trunc)]:
        assert rows[i].status_line == "" and rows[i].headers == ""
        assert bytes(rows[i].body) == raw
    assert rows[5].status_line is None and rows[5].body is None


def test_http_split_lf_head_crlf_in_body(spark):
    """ADVICE r14 medium pin: an LF-only-header response whose BODY
    contains a CRLF CRLF blank line inside the max_head_bytes window
    must split at the EARLIER LF LF head boundary — not at the body's
    blank line (which would append body bytes to the headers and
    truncate/shift the returned body). Also pins the tie: on a normal
    CRLF message the \\n\\n substring match at sep_crlf+1 must not
    steal the boundary."""
    from pyspark_deduplication_spark.functions.text import (
        http_split_message,
    )

    body = b"part one\r\n\r\npart two"
    lf_head = (b"HTTP/1.0 200 OK\nContent-Type: text/plain\n\n"
               + body)
    crlf_head = (b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
                 b"\r\n" + body)
    df = spark.createDataFrame(
        [(0, lf_head), (1, crlf_head)], "i long, p binary")
    rows = {r.i: r for r in df.select(
        "i", http_split_message("p").alias("m")).select(
        "i", "m.status_line", "m.headers", "m.body").collect()}
    for i in (0, 1):
        assert rows[i].status_line.startswith("HTTP/1.")
        assert rows[i].headers == "Content-Type: text/plain"
        assert bytes(rows[i].body) == body


def test_warc_date_tolerant_parsing(spark):
    """ADVICE r14 low pin: warc_date_of accepts ANY RFC-3339/WARC-1.1
    fractional-second precision (1-9 digits, truncated to Spark's
    microseconds) and a lowercase zone letter; malformed dates still
    yield NULL, never an error."""
    import datetime as dt

    from pyspark_deduplication_spark.functions.text import (
        warc_date_of,
    )

    def hdr(d):
        return f"WARC-Type: response\r\nWARC-Date: {d}"

    cases = [
        (0, hdr("2024-03-01T12:34:56Z")),
        (1, hdr("2024-03-01T12:34:56.5Z")),          # 1-digit frac
        (2, hdr("2024-03-01T12:34:56.123456789Z")),  # 9-digit frac
        (3, hdr("2024-03-01T12:34:56z")),            # lowercase z
        (4, hdr("2024-03-01T12:34:56.25z")),         # both at once
        (5, hdr("not-a-date")),
        (6, "WARC-Type: response"),                  # absent
    ]
    df = spark.createDataFrame(cases, "i long, h string")
    rows = {r.i: r.ts for r in df.select(
        "i", warc_date_of("h").alias("ts")).collect()}
    base = dt.datetime(2024, 3, 1, 12, 34, 56)
    assert rows[0] == base
    assert rows[1] == base.replace(microsecond=500000)
    assert rows[2] == base.replace(microsecond=123456)  # truncated
    assert rows[3] == base
    assert rows[4] == base.replace(microsecond=250000)
    assert rows[5] is None and rows[6] is None


def test_decode_web_text_charset_resolution(spark):
    """Charset-sniffing replace-decode (ADVICE r13 high + VERDICT r13
    item 4): BOM > Content-Type charset > <meta charset> > UTF-8
    default; windows-1252 transcodes (where UTF-8-replace provably
    garbles); WHATWG latin-1->cp1252 override; unknown labels fall
    back; pure binary garbage yields U+FFFDs, never an exception."""
    from pyspark.sql import functions as F

    from pyspark_deduplication_spark.functions.text import (
        decode_web_text,
        encode_text_bytes,
    )

    smart = "“smart” — €99 café"
    cp = smart.encode("windows-1252")
    assert cp.decode("utf-8", "replace") != smart  # would garble
    cases = [
        (0, b"\xef\xbb\xbfplain utf8 bom", None),
        (1, cp, "text/html; charset=windows-1252"),
        (2, b"<html><meta charset=windows-1252><body>" + cp, None),
        (3, ("<meta http-equiv=\"Content-Type\" content=\"text/html; "
             "charset=ISO-8859-1\">").encode() + cp, None),
        (4, cp, "text/html; charset=not-a-real-charset"),
        (5, b"\xff\x00\xfe binary junk", None),
        (6, "utf8 by default — café".encode(), "text/html"),
        (7, None, None),
        (8, "﻿utf16 le".encode("utf-16-le"), None),
    ]
    df = spark.createDataFrame(cases, "i long, p binary, ct string")
    rows = {r.i: r.t for r in df.select(
        "i", decode_web_text("p", F.col("ct")).alias("t")).collect()}
    assert rows[0] == "plain utf8 bom"         # BOM stripped
    assert rows[1] == smart                    # header charset
    # meta-sniffed decodes cover the WHOLE payload (markup included)
    assert rows[2].endswith(smart) and "�" not in rows[2]
    assert rows[3].endswith(smart) and "�" not in rows[3]  # WHATWG
    # unknown label → default utf-8-replace → garbled but no crash
    assert "�" in rows[4] and rows[4] != smart
    assert "�" in rows[5]                 # binary junk survives
    assert rows[6] == "utf8 by default — café"
    assert rows[7] is None
    assert rows[8] == "utf16 le"               # UTF-16LE BOM
    # single-arg spelling (no content_type column) sniffs meta too
    one = spark.createDataFrame([(cases[2][1],)], "p binary").select(
        decode_web_text("p").alias("t")).head().t
    assert one.endswith(smart) and "�" not in one
    # encode_text_bytes is the synthesis scaffold: round-trips cp1252
    # and degrades un-encodable codepoints to '?' instead of raising
    enc = spark.createDataFrame([(smart,), ("中文",)], "t string") \
        .select(encode_text_bytes("t", "windows-1252").alias("b")) \
        .collect()
    assert bytes(enc[0].b) == cp
    assert bytes(enc[1].b) == b"??"


def test_http_decode_body_codings(spark):
    """HTTP transfer/content codings (r14 follow-on to framing):
    chunked reassembly (multi-chunk, extension params, terminal
    chunk), gzip and both deflate flavors (zlib-wrapped and the
    raw-deflate servers historically sent), RFC 9112 order
    (chunked off FIRST, then content coding), and the degradation
    contract — truncated chunk keeps reassembled bytes, corrupt
    gzip degrades to raw bytes, unknown codings pass through,
    no-coding headers pass through. Never raises."""
    import gzip
    import zlib

    from pyspark.sql import functions as F

    from pyspark_deduplication_spark.functions.text import (
        http_decode_body,
    )

    page = ("café — the entity …" * 40).encode("utf-8")

    def chunked(data: bytes, size: int = 100,
                ext: bytes = b"") -> bytes:
        out = []
        for i in range(0, len(data), size):
            p = data[i:i + size]
            out.append(f"{len(p):x}".encode() + ext + b"\r\n"
                       + p + b"\r\n")
        return b"".join(out) + b"0\r\n\r\n"

    gz = gzip.compress(page, mtime=0)
    cases = [
        # (id, body, headers, expected)
        (0, chunked(page), "Transfer-Encoding: chunked", page),
        (1, chunked(gz), "transfer-encoding: Chunked\r\n"
         "Content-Encoding: gzip", page),           # order: TE first
        (2, gz, "Content-Encoding: x-gzip", page),
        (3, zlib.compress(page), "Content-Encoding: deflate", page),
        (4, zlib.compress(page)[2:-4],
         "Content-Encoding: deflate", page),        # raw deflate
        (5, chunked(page, ext=b";name=val"),
         "Transfer-Encoding: chunked", page),       # chunk extension
        (6, chunked(page)[:150],
         "Transfer-Encoding: chunked", page[:100]),  # truncated
        (7, b"\x1f\x8bcorrupt", "Content-Encoding: gzip",
         b"\x1f\x8bcorrupt"),                       # degrade to raw
        (8, page, "Content-Encoding: br", page),    # unknown coding
        (9, page, "", page),                        # no codings
        (10, None, "Transfer-Encoding: chunked", None),
    ]
    df = spark.createDataFrame(
        [(i, b, h) for i, b, h, _ in cases],
        "i long, body binary, h string")
    got = {r.i: (None if r.e is None else bytes(r.e))
           for r in df.select(
               "i", http_decode_body("body", F.col("h"))
               .alias("e")).collect()}
    for i, _, _, want in cases:
        assert got[i] == want, (i, got[i][:40] if got[i] else None)


def test_paragraph_dedup_rebuild_semantics(spark, tmp_path):
    """Hand corpus: doc 1 repeats doc 0's 16-token opening chunk;
    first occurrence (doc 0) survives, doc 1's rebuild drops it but
    keeps its own tail — and a doc whose ENTIRE content is a
    duplicate rebuilds to NULL md5."""
    from pyspark_deduplication_spark.queries import (
        paragraph_dedup_rebuild_docs,
    )

    shared = " ".join(f"tok{i}" for i in range(16))
    tail = "unique closing words here"
    docs = spark.createDataFrame(
        # doc_id % 3 == 1/2: no boilerplate planting interference
        [(1, f"{shared} {tail}"),
         (2, f"{shared} other ending entirely"),
         (5, shared)],
        "doc_id long, text string")
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in
           paragraph_dedup_rebuild_docs(spark, str(tmp_path)).collect()}
    assert out[1].n_chunks == 2 and out[1].n_kept == 2
    assert out[2].n_chunks == 2 and out[2].n_kept == 1
    assert out[5].n_chunks == 1 and out[5].n_kept == 0
    assert out[5].kept_text_md5 is None
    import hashlib
    assert out[2].kept_text_md5 == hashlib.md5(
        b"other ending entirely").hexdigest()
