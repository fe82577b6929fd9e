"""Data-quality constraint operator (operators/quality.py): every check
is an aggregate expression in one pass; referential checks broadcast the
dim key set. Verified against hand-built violation tables."""

from __future__ import annotations

from pyspark_deduplication_spark.operators.quality import (
    check_constraints,
    duplicate_key_count,
    null_count,
    orphan_count,
    out_of_range_count,
    violations,
)


def _dirty(spark):
    rows = [
        (1, 10, 5.0),
        (2, None, -3.0),     # null fk, negative value
        (2, 11, 250.0),      # duplicate key, value over hi
        (3, 99, 50.0),       # orphan fk
        (4, 10, None),       # null value — not out-of-range
    ]
    return spark.createDataFrame(rows, ["id", "fk", "val"])


def _dim(spark):
    return spark.createDataFrame([(10,), (11,)], ["pk"])


def test_single_pass_metrics(spark):
    m = check_constraints(_dirty(spark), [
        null_count("fk"),
        duplicate_key_count("id"),
        out_of_range_count("val", lo=0, hi=100),
    ]).collect()[0]
    assert m.n_rows == 5
    assert m.nulls_fk == 1
    assert m.dup_keys_id == 1       # one row beyond the first for id=2
    assert m.out_of_range_val == 2  # -3 and 250; NULL not counted


def test_metrics_is_one_job_one_row(spark):
    df = check_constraints(_dirty(spark), [null_count("fk")])
    assert df.count() == 1


def test_orphan_count_broadcast_anti_join(spark):
    got = orphan_count(_dirty(spark), "fk", _dim(spark), "pk").collect()[0]
    assert got.orphans_fk == 1      # fk=99; NULL fk excluded
    from pyspark_deduplication_spark.plans.inspect import explain_str
    plan = explain_str(orphan_count(_dirty(spark), "fk", _dim(spark), "pk"))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_violations_long_form(spark):
    m = check_constraints(_dirty(spark), [
        null_count("fk"), duplicate_key_count("id"),
    ])
    rep = {r.check: r.metric for r in violations(m).collect()}
    assert rep == {"nulls_fk": 1, "dup_keys_id": 1}


def test_clean_table_reports_zero(spark):
    clean = spark.createDataFrame([(1, 10, 5.0), (2, 11, 6.0)],
                                  ["id", "fk", "val"])
    m = check_constraints(clean, [
        null_count("fk"), duplicate_key_count("id"),
        out_of_range_count("val", lo=0, hi=100),
    ]).collect()[0]
    assert (m.nulls_fk, m.dup_keys_id, m.out_of_range_val) == (0, 0, 0)


def test_bloom_decontaminate_no_false_negatives(spark):
    """Bloom decontamination: every doc truly sharing a 5-gram with the
    held-out set is flagged (Bloom has no false negatives — the
    safety direction decontamination needs); clean docs mostly
    survive; flags agree with the exact semi-join on this fixture."""
    from pyspark.sql import functions as F

    from pyspark_deduplication_spark.functions.text import (
        tokenize,
        word_ngrams_of,
    )
    from pyspark_deduplication_spark.operators.quality import (
        bloom_decontaminate,
    )

    held_rows = [(900 + i,
                  f"benchmark question {i} asks about topic{i} in "
                  f"exactly five gram windows number {i}")
                 for i in range(10)]
    corpus_rows = [(i, f"ordinary web document {i} about subject{i} "
                       f"with plenty of unique filler tokens here{i}")
                   for i in range(40)]
    # plant contamination: docs 0-4 embed held-out doc (i)'s text
    for i in range(5):
        corpus_rows[i] = (i, corpus_rows[i][1] + " " + held_rows[i][1])
    held = spark.createDataFrame(held_rows, "doc_id long, text string")
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")

    out = {r.doc_id: r.contaminated for r in
           bloom_decontaminate(corpus, held).collect()}
    assert len(out) == 40
    # exact ground truth via the precise semi-join
    hg = held.select(F.explode(
        word_ngrams_of(tokenize(F.col("text")), 5)).alias("gram")).distinct()
    cg = corpus.select("doc_id", F.explode(
        word_ngrams_of(tokenize(F.col("text")), 5)).alias("gram"))
    truth = {r.doc_id for r in cg.join(hg, "gram", "left_semi")
             .select("doc_id").distinct().collect()}
    assert truth == set(range(5))
    # no false negatives: every truly contaminated doc flagged
    assert all(out[d] for d in truth)
    # FP rate sane at this sizing: at most a couple of clean docs flip
    fps = sum(1 for d, c in out.items() if c and d not in truth)
    assert fps <= 2, fps

    # the persisted-index path (build once, probe per batch) must be
    # BIT-IDENTICAL to the inline path: same word table, same flags
    from pyspark_deduplication_spark.operators.quality import (
        build_decontamination_index,
    )

    idx = build_decontamination_index(held)
    via_index = {r.doc_id: r.contaminated for r in
                 bloom_decontaminate(corpus, index=idx).collect()}
    assert via_index == out
    # geometry mismatch must refuse loudly, not silently miss leaks
    import pytest

    with pytest.raises(ValueError, match="num_bits"):
        bloom_decontaminate(corpus, index=idx, num_bits=1 << 22)
    # index unions losslessly: table from held ∪ held == table from held
    merged = (build_decontamination_index(held)
              .unionByName(idx)
              .groupBy("word_index")
              .agg(F.bit_or("word").alias("word")))
    a = {(r.word_index, r.word) for r in idx.collect()}
    assert {(r.word_index, r.word) for r in merged.collect()} == a


def test_exact_gram_index_matches_inline_semi_join(spark):
    """build_gram_index + decontaminate_exact (the oracle-replicable
    persisted-index twin) must reproduce the inline distinct-grams
    semi-join exactly, and arguments must not shuffle the batch side
    (index broadcasts)."""
    from pyspark.sql import functions as F

    from pyspark_deduplication_spark.operators.quality import (
        build_gram_index,
        decontaminate_exact,
    )
    from pyspark_deduplication_spark.plans.inspect import explain_str

    held_rows = [(900 + i, f"benchmark item {i} probes gram window "
                           f"sequence alpha beta gamma delta {i}")
                 for i in range(6)]
    corpus_rows = [(i, f"document {i} text corpus filler words going "
                       f"on and on uniquely {i}") for i in range(20)]
    for i in range(3):
        corpus_rows[i] = (i, corpus_rows[i][1] + " " + held_rows[i][1])
    held = spark.createDataFrame(held_rows, "doc_id long, text string")
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")

    idx = build_gram_index(held, "text", n=5)
    got = {r.doc_id: r.contaminated
           for r in decontaminate_exact(corpus, idx, "text", "doc_id", 5)
           .collect()}
    assert got == {i: (i < 3) for i in range(20)}
    plan = explain_str(decontaminate_exact(corpus, idx, "text", "doc_id", 5))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
