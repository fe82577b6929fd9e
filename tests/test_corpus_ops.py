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


def test_chunking_window_coverage_and_overlap(spark):
    from pyspark_deduplication_spark.operators.chunking import chunk_documents

    words = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    chunks = chunk_documents(df, "text", size=64, overlap=16).collect()
    # ceil((100-16)/48) = 2 windows: [0:64], [48:100]
    assert len(chunks) == 2
    assert chunks[0].chunk_n_tokens == 64
    assert chunks[1].chunk_n_tokens == 52
    t0, t1 = chunks[0].chunk_text.split(), chunks[1].chunk_text.split()
    assert t0[48:] == t1[:16]          # overlap region agrees
    assert t0[:1] == ["w0"] and t1[-1] == "w99"  # full coverage
    # every token appears in at least one chunk
    assert set(words.split()) == set(t0) | set(t1)


def test_chunking_short_doc_single_window(spark):
    from pyspark_deduplication_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    chunks = chunk_documents(df, "text", size=64, overlap=16).collect()
    assert len(chunks) == 1
    assert chunks[0].chunk_n_tokens == 3
    assert chunks[0].chunk_index == 0


def test_chunking_rejects_bad_overlap(spark):
    import pytest

    from pyspark_deduplication_spark.operators.chunking import chunk_documents

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, "text", size=8, overlap=8)


def test_chunking_is_map_only(spark, sf_dir):
    from pyspark_deduplication_spark.operators.chunking import chunk_documents
    from pyspark_deduplication_spark.plans.inspect import explain_str

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert "Exchange" not in explain_str(chunk_documents(docs))


def test_pack_sequences_offsets_and_straddles(spark):
    from pyspark_deduplication_spark.operators.chunking import pack_sequences
    from pyspark.sql import functions as F

    chunks = spark.createDataFrame(
        [(1, 0, 60), (1, 1, 60), (2, 0, 60), (2, 1, 30)],
        "doc_id long, chunk_index long, chunk_n_tokens long",
    )
    out = pack_sequences(chunks, context_len=100,
                         stream_expr=F.lit(0)).collect()
    rows = {(r.doc_id, r.chunk_index): r for r in out}
    # stream order: (1,0) start 0, (1,1) start 60, (2,0) start 120, (2,1) 180
    assert rows[(1, 0)].pack_id == 0 and rows[(1, 0)].pack_offset == 0
    assert rows[(1, 1)].pack_id == 0 and rows[(1, 1)].pack_offset == 60
    assert rows[(1, 1)].straddles          # 60+60 > 100 → cut at boundary
    assert rows[(2, 0)].pack_id == 1 and rows[(2, 0)].pack_offset == 20
    assert not rows[(2, 0)].straddles      # 20+60 = 80 ≤ 100 fits
    assert rows[(2, 1)].pack_id == 1 and rows[(2, 1)].pack_offset == 80
    assert rows[(2, 1)].straddles          # 80+30 > 100 → cut at boundary


def test_pack_sequences_stable_under_repartition(spark):
    from pyspark_deduplication_spark.operators.chunking import pack_sequences

    chunks = spark.createDataFrame(
        [(d, c, 7 + (d * 3 + c) % 11) for d in range(20) for c in range(4)],
        "doc_id long, chunk_index long, chunk_n_tokens long",
    )
    a = sorted(map(str, pack_sequences(chunks, context_len=64).collect()))
    b = sorted(map(str, pack_sequences(
        chunks.repartition(7), context_len=64).collect()))
    assert a == b


def test_winnow_guarantee_shared_substring_yields_shared_fp(spark):
    """The winnowing guarantee (Schleimer et al. §3): two texts sharing
    a substring of length ≥ k + window − 1 share ≥ 1 selected
    fingerprint. k=16, window=8 → any 23-char shared run must surface."""
    from pyspark_deduplication_spark.functions.text import (
        char_kgram_hashes_of,
        normalize_text,
        winnow_of,
    )

    shared = "the quick brown fox jumps over the lazy dog tonight"
    df = spark.createDataFrame(
        [(1, "intro one " + shared + " outro alpha"),
         (2, "different preamble " + shared + " and a different end"),
         (3, "completely unrelated content with nothing in common here")],
        ["doc_id", "text"],
    )
    fps = (
        df.select("doc_id", normalize_text(F.col("text")).alias("t"))
        .select("doc_id", char_kgram_hashes_of(F.col("t"), 16).alias("kg"))
        .select("doc_id", winnow_of(F.col("kg"), 8).alias("fps"))
    )
    rows = {r.doc_id: set(r.fps) for r in fps.collect()}
    assert rows[1] & rows[2], "shared substring must yield a shared fingerprint"
    assert not (rows[1] & rows[3]) and not (rows[2] & rows[3])


def test_winnow_fp_density_matches_theory(spark):
    """Winnowing keeps ~2/(w+1) of the hash stream; with w=8 the
    selected fraction should sit well under the raw k-gram count and
    above the 1/w lower bound."""
    from pyspark_deduplication_spark.functions.text import (
        char_kgram_hashes_of,
        normalize_text,
        winnow_of,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    row = (
        docs.select(normalize_text(F.col("text")).alias("t"))
        .select(char_kgram_hashes_of(F.col("t"), 16).alias("kg"))
        .select(F.size("kg").alias("n_kg"),
                F.size(winnow_of(F.col("kg"), 8)).alias("n_fp"))
        .agg(F.sum("n_kg").alias("kg"), F.sum("n_fp").alias("fp"))
        .first()
    )
    frac = row.fp / row.kg
    assert 1 / 8 <= frac <= 0.45, frac


def test_winnow_near_dup_query_has_no_cross_product(spark):
    from pyspark_deduplication_spark.plans.inspect import has_cartesian_or_bnl
    from pyspark_deduplication_spark.queries import winnow_near_dup_docs

    assert not has_cartesian_or_bnl(
        winnow_near_dup_docs(spark, "/root/testdata/sf0.001"))


def test_pii_counts_and_redaction_semantics(spark):
    """Each pattern hits its own kind; redaction order keeps the
    specific kinds (SSN, IP) from being eaten by the looser phone
    pattern; PII-free text is untouched."""
    from pyspark_deduplication_spark.functions.text import pii_counts, redact_pii

    df = spark.createDataFrame(
        [("mail a.user+tag@sub.example.org now",),
         ("ssn 123-45-6789 and ip 10.0.255.1 and tel +44 (20) 7946-0958",),
         ("no personal data here at all",)],
        ["text"],
    )
    out = df.select(
        *[c.alias(k) for k, c in pii_counts(F.col("text")).items()],
        redact_pii(F.col("text")).alias("red"),
    ).collect()
    mail, mixed, clean = out
    assert (mail.n_email, mail.n_ssn, mail.n_ipv4) == (1, 0, 0)
    assert mail.red == "mail [EMAIL] now"
    assert (mixed.n_ssn, mixed.n_ipv4, mixed.n_phone) >= (1, 1, 1)
    assert "[SSN]" in mixed.red and "[IPV4]" in mixed.red and "[PHONE]" in mixed.red
    assert "123-45-6789" not in mixed.red and "10.0.255.1" not in mixed.red
    assert clean.red == "no personal data here at all"
    assert (clean.n_email, clean.n_phone, clean.n_ipv4, clean.n_ssn) == (0, 0, 0, 0)


def test_redact_pii_is_idempotent(spark):
    """Redacting already-redacted text changes nothing — placeholders
    must not themselves match any pattern."""
    from pyspark_deduplication_spark.functions.text import redact_pii

    df = spark.createDataFrame(
        [("a@b.co or 123-45-6789 or 10.1.2.3 or +1 555 010 9999",)], ["text"])
    once = df.select(redact_pii(F.col("text")).alias("r1"))
    twice = once.select("r1", redact_pii(F.col("r1")).alias("r2")).first()
    assert twice.r1 == twice.r2


def test_strip_boilerplate_chunks_removes_frequent_and_preserves_order(spark):
    from pyspark.sql import functions as F

    from pyspark_deduplication_spark.operators.chunking import (
        strip_boilerplate_chunks,
    )

    boiler = " ".join(f"b{i}" for i in range(4))       # one 4-token chunk
    u = lambda d, i: " ".join(f"d{d}u{i}t{j}" for j in range(4))
    mk = lambda d, parts: (d, " ".join(parts))
    df = spark.createDataFrame(
        [mk(1, [boiler, u(1, 0), u(1, 1)]),
         mk(2, [u(2, 0), boiler, u(2, 1)]),
         mk(3, [u(3, 0), u(3, 1), boiler])],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in strip_boilerplate_chunks(
        df, "text", "doc_id", size=4, max_occurrences=2).collect()}
    # the boilerplate chunk occurs 3 times (> 2) -> stripped everywhere
    for d in (1, 2, 3):
        assert out[d].n_chunks_dropped == 1
        assert out[d].n_chunks_kept == 2
        assert "b0" not in out[d].clean_text
    # unique chunks survive, original order preserved
    assert out[2].clean_text == u(2, 0) + " " + u(2, 1)
    # at max_occurrences=3 nothing is frequent enough -> nothing dropped
    out3 = {r.doc_id: r for r in strip_boilerplate_chunks(
        df, "text", "doc_id", size=4, max_occurrences=3).collect()}
    assert all(r.n_chunks_dropped == 0 for r in out3.values())


def test_pretokenize_bpe_units(spark):
    """GPT-2-style pre-tokenizer (dialect-restricted): contraction
    suffixes split off, letter/digit/punctuation runs separate, leading
    space rides the following unit."""
    from pyspark.sql import functions as F

    from pyspark_deduplication_spark.functions.text import (
        pretoken_count,
        pretokenize,
    )

    df = spark.createDataFrame(
        [(1, "we'll pay $42.50 now!"), (2, None), (3, "")],
        ["id", "text"])
    out = {r.id: r for r in df.select(
        "id", pretokenize("text").alias("units"),
        pretoken_count("text").alias("n")).collect()}
    assert out[1].units == [
        "we", "'ll", " pay", " $", "42", ".", "50", " now", "!"]
    assert out[1].n == 9
    assert out[2].n == 0   # NULL text
    assert out[3].n == 0   # empty text


def test_compression_ratio_orders_text_regimes(spark):
    """The zlib-ratio contract: repetitive template < natural prose <
    random junk, nulls/empties map to 1.0 — pinned by ORDER, not by
    exact deflate bytes (zlib-version artifact)."""
    import random
    import string

    from pyspark.sql import functions as F

    from pyspark_deduplication_spark.functions.text import (
        compression_ratio,
    )

    rng = random.Random(7)
    template = "click here to subscribe now! " * 40
    prose = ("the engine aggregates documents into near duplicate "
             "clusters while keeping one representative per component "
             "and records every decision for the audit trail downstream "
             "of the mixture planner that allocates token budgets ") * 4
    junk = "".join(rng.choice(string.ascii_letters + string.digits)
                   for _ in range(1000))
    df = spark.createDataFrame(
        [(1, template), (2, prose), (3, junk), (4, ""), (5, None)],
        "doc_id long, text string")
    got = {r.doc_id: r.ratio for r in df.select(
        "doc_id", compression_ratio(F.col("text")).alias("ratio")).collect()}
    assert got[1] < got[2] < got[3], got
    # extreme-band membership at the query's 0.45 / 0.75 thresholds
    # (base62 noise deflates to ~0.78, heavy repetition to ~0.04)
    assert got[1] < 0.45 and got[3] > 0.75, got
    assert got[4] == 1.0 and got[5] == 1.0


def test_incremental_span_removal_ground_truth(spark):
    """Incremental ExactSubstr: a batch span occurring in the standing
    corpus is removed from the batch (corpus untouched by contract), a
    span shared by two batch docs is removed from both, novel text
    survives verbatim, and the persisted-index / hashed-gram paths
    equal the inline raw-gram path."""
    from pyspark_deduplication_spark.operators.chunking import (
        build_span_index,
        incremental_remove_duplicate_spans,
    )

    S = " ".join(f"s{i}" for i in range(8))       # corpus span
    T = " ".join(f"t{i}" for i in range(8))       # batch-shared span
    corpus = spark.createDataFrame(
        [(0, f"{S} c0 c1 c2 c3 c4 c5 c6 c7")],
        "doc_id long, text string")
    novel1 = " ".join(f"a{i}" for i in range(8))
    novel2 = " ".join(f"b{i}" for i in range(8))
    novel3 = " ".join(f"d{i}" for i in range(8))
    novel4 = " ".join(f"e{i}" for i in range(8))
    batch = spark.createDataFrame(
        [(101, f"{novel1} {S}"),          # corpus hit: S removed
         (102, f"{T} {novel2}"),          # batch-shared: T removed
         (103, f"{T} {novel3}"),
         (104, novel4)],                  # novel: untouched
        "doc_id long, text string")

    out = {r.doc_id: r for r in incremental_remove_duplicate_spans(
        batch, corpus, span=8).collect()}
    assert out[101].clean_text == novel1 and out[101].n_kept == 8
    assert out[102].clean_text == novel2
    assert out[103].clean_text == novel3
    assert out[104].clean_text == novel4 and out[104].n_kept == 8

    idx = build_span_index(corpus, span=8)
    via_idx = {r.doc_id: r for r in incremental_remove_duplicate_spans(
        batch, span=8, span_index=idx).collect()}
    hashed = {r.doc_id: r for r in incremental_remove_duplicate_spans(
        batch, corpus, span=8, hash_grams=True).collect()}
    for d in (101, 102, 103, 104):
        assert via_idx[d].clean_text == out[d].clean_text
        assert hashed[d].clean_text == out[d].clean_text

    import pytest as _pytest
    with _pytest.raises(ValueError, match="requires span_index"):
        incremental_remove_duplicate_spans(batch, span=8)
