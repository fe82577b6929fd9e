"""Corpus-curation semantics: repetition scoring and decontamination."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_deduplication_spark.functions.text import (
    tokenize,
    word_ngrams_all_of,
    word_ngrams_of,
)


def test_word_ngrams_all_preserves_duplicates(spark):
    df = spark.createDataFrame([("a b a b a",)], ["text"])
    row = df.select(
        word_ngrams_all_of(tokenize(F.col("text")), 2).alias("all"),
        word_ngrams_of(tokenize(F.col("text")), 2).alias("dedup"),
    ).first()
    assert row.all == ["a b", "b a", "a b", "b a"]
    assert sorted(row.dedup) == ["a b", "b a"]


def test_repetition_scores_known_doc(spark, tmp_path):
    """'x y x y x y' → bigrams [xy, yx, xy, yx, xy]: top 'x y' 3/5,
    all five duplicated → dup frac 1.0. A no-repeat doc scores minimal."""
    from pyspark_deduplication_spark.queries import doc_repetition_scores

    docs = spark.createDataFrame(
        [(1, "x y x y x y", "en", "s", 11),
         (2, "a b c d e f", "en", "s", 11)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    path = str(tmp_path / "documents.parquet")
    docs.write.parquet(path)
    out = {r.doc_id: r for r in
           doc_repetition_scores(spark, str(tmp_path)).collect()}
    assert abs(out[1].top_bigram_frac - 3 / 5) < 1e-9
    assert out[1].dup_bigram_frac == 1.0
    assert abs(out[2].top_bigram_frac - 1 / 5) < 1e-9
    assert out[2].dup_bigram_frac == 0.0


def test_decontamination_flags_shared_5gram(spark, tmp_path):
    """A doc sharing a 5-gram with src0 is contaminated; others are not."""
    from pyspark_deduplication_spark.queries import decontaminate_against_src0

    bench_text = "one two three four five six"
    docs = spark.createDataFrame(
        [(1, bench_text, "en", "src0", 1),
         (2, "zzz one two three four five yyy", "en", "srcA", 1),  # shares
         (3, "totally different words here entirely now", "en", "srcA", 1),
         (4, "five four three two one reversed order", "en", "srcB", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.source: r for r in
           decontaminate_against_src0(spark, str(tmp_path)).collect()}
    assert out["srcA"].n_docs == 2 and out["srcA"].n_contaminated == 1
    assert out["srcB"].n_docs == 1 and out["srcB"].n_contaminated == 0


def test_decontamination_benchmark_side_broadcasts(spark, sf_dir):
    from pyspark_deduplication_spark.plans.inspect import explain_str
    from pyspark_deduplication_spark.queries import decontaminate_against_src0

    plan = explain_str(decontaminate_against_src0(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
