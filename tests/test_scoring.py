"""Feature-hashed linear scoring: expression path vs weight-table path."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_deduplication_spark.functions.scoring import (
    N_BUCKETS,
    bucket_weight,
    hashed_linear_score,
    score_with_weight_table,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "spark shuffles data between executors during wide stages"),
    (2, "aaa bbb ccc aaa bbb aaa"),
    (3, ""),
]


def test_weight_table_path_matches_expression_path(spark):
    """Inference against a materialized (bucket, weight) table — the
    trained-model path — must reproduce the in-expression demo weights
    exactly: same buckets, same exact-in-binary sums."""
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    buckets = spark.createDataFrame(
        [(format(i, "02x"),) for i in range(N_BUCKETS)], "bucket string"
    ).select("bucket", bucket_weight(F.col("bucket")).alias("weight"))

    via_expr = {r.doc_id: (r.n_toks, r.score)
                for r in hashed_linear_score(df).collect()}
    via_table = {r.doc_id: (r.n_toks, r.score)
                 for r in score_with_weight_table(df, buckets).collect()}
    assert via_expr == via_table
    # blank doc contributes no tokens → absent from both
    assert 3 not in via_expr


def test_scores_are_partition_order_invariant(spark):
    """Weights are exact multiples of 1/16, so the double sum is
    order-independent — repartitioning cannot move a score."""
    df = spark.createDataFrame(DOCS * 10, "doc_id long, text string")
    a = {(r.doc_id, r.score) for r in
         hashed_linear_score(df.repartition(1)).collect()}
    b = {(r.doc_id, r.score) for r in
         hashed_linear_score(df.repartition(17)).collect()}
    assert a == b


def test_band_thresholds(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    for r in hashed_linear_score(df).collect():
        want = "high" if r.score >= 1.0 else ("mid" if r.score >= -1.0
                                              else "low")
        assert r.band == want


def test_trained_model_separates_planted_vocabularies(spark):
    """The distributed closed-form trainer (diagonal ridge over hashed
    token counts) must learn weights that SEPARATE two planted
    vocabularies: positive docs draw from vocab A, negative from vocab
    B; every held-out positive doc must outscore every negative one."""
    from pyspark_deduplication_spark.functions.scoring import (
        train_hashed_linear,
    )

    vocab_a = [f"good{i}" for i in range(12)]
    vocab_b = [f"junk{i}" for i in range(12)]
    rows = []
    did = 0
    for rep in range(10):  # train docs, 3 tokens each, rotating vocab
        for off in range(4):
            toks_a = [vocab_a[(rep + off + j) % 12] for j in range(3)]
            toks_b = [vocab_b[(rep + off + j) % 12] for j in range(3)]
            rows.append((did, " ".join(toks_a), 1))
            rows.append((did + 1, " ".join(toks_b), 0))
            did += 2
    train = spark.createDataFrame(rows, "doc_id long, text string, label int")
    weights = train_hashed_linear(train, "label")

    held = spark.createDataFrame(
        [(900, " ".join(vocab_a[:5]), 1), (901, " ".join(vocab_a[5:10]), 1),
         (902, " ".join(vocab_b[:5]), 0), (903, " ".join(vocab_b[5:10]), 0)],
        "doc_id long, text string, label int")
    got = {r.doc_id: r.score for r in
           score_with_weight_table(held, weights).collect()}
    assert min(got[900], got[901]) > max(got[902], got[903]), got


def test_trained_weights_live_on_exact_grid(spark):
    """Trained weights floor-quantize onto the 2^-20 grid (exactly
    representable), the property that makes inference sums
    order-independent — pinned by checking weight·2^20 is integral and
    scores are invariant under repartitioning."""
    from pyspark_deduplication_spark.functions.scoring import (
        train_hashed_linear,
    )

    df = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{(i * 3) % 11} common word{i % 5}", i % 2)
         for i in range(40)],
        "doc_id long, text string, label int")
    w = train_hashed_linear(df, "label")
    for r in w.collect():
        scaled = r.weight * (1 << 20)
        assert scaled == int(scaled), r
    s1 = {r.doc_id: r.score for r in score_with_weight_table(df, w).collect()}
    s2 = {r.doc_id: r.score
          for r in score_with_weight_table(df.repartition(13), w).collect()}
    assert s1 == s2


def test_sgd_trainer_separates_and_is_repartition_invariant(spark):
    """The iterative logistic trainer (model-state loop): learns to
    separate planted vocabularies, strictly reduces logistic loss vs
    the zero model, and the learned weights are identical under
    corpus repartitioning (9dp-rounded gradient sums)."""
    import math

    from pyspark_deduplication_spark.functions.scoring import (
        train_hashed_linear_sgd,
    )

    vocab_a = [f"good{i}" for i in range(8)]
    vocab_b = [f"junk{i}" for i in range(8)]
    rows, did = [], 0
    for rep in range(12):
        toks_a = [vocab_a[(rep + j) % 8] for j in range(4)]
        toks_b = [vocab_b[(rep + j) % 8] for j in range(4)]
        rows.append((did, " ".join(toks_a), 1))
        rows.append((did + 1, " ".join(toks_b), 0))
        did += 2
    train = spark.createDataFrame(rows, "doc_id long, text string, label int")

    w1 = train_hashed_linear_sgd(train, "label", rounds=6)
    scores = {r.doc_id: r.score for r in
              score_with_weight_table(train, w1).collect()}
    pos = [scores[d] for d, _, y in rows if y == 1]
    neg = [scores[d] for d, _, y in rows if y == 0]
    assert min(pos) > max(neg), (min(pos), max(neg))
    # loss strictly below the zero-model baseline ln(2)
    loss = sum(
        math.log(1 + math.exp(-s)) if y == 1 else math.log(1 + math.exp(s))
        for (d, _, y), s in ((r, scores[r[0]]) for r in rows)
    ) / len(rows)
    assert loss < math.log(2) * 0.5, loss
    # repartition invariance of the learned model
    w2 = train_hashed_linear_sgd(train.repartition(13), "label", rounds=6)
    assert sorted(map(tuple, w1.collect())) == sorted(map(tuple, w2.collect()))


def test_gram_trainer_beats_diagonal_on_collinear_vocab(spark):
    """Full-Gram ridge resolves correlated buckets the diagonal form
    double-counts: with a token that co-occurs with the true signal in
    positives AND appears alone in negatives, the full solve fits the
    labels with strictly lower squared loss than the diagonal
    approximation — and still separates the planted classes."""
    from pyspark_deduplication_spark.functions.scoring import (
        train_hashed_linear,
        train_hashed_linear_gram,
    )

    rows, did = [], 0
    # positives: signal + confound together; negatives: confound alone
    for rep in range(20):
        rows.append((did, f"signal{rep % 4} confound{rep % 4}", 1))
        rows.append((did + 1, f"confound{rep % 4} filler{rep % 6}", 0))
        did += 2
    train = spark.createDataFrame(rows, "doc_id long, text string, label int")

    def sq_loss(weights):
        scores = {r.doc_id: r.score for r in
                  score_with_weight_table(train, weights).collect()}
        return sum((scores[d] - y) ** 2 for d, _, y in rows)

    l_diag = sq_loss(train_hashed_linear(train, "label"))
    l_gram = sq_loss(train_hashed_linear_gram(train, "label"))
    assert l_gram < l_diag, (l_gram, l_diag)

    w = train_hashed_linear_gram(train, "label")
    scores = {r.doc_id: r.score for r in
              score_with_weight_table(train, w).collect()}
    pos = [scores[d] for d, _, y in rows if y == 1]
    neg = [scores[d] for d, _, y in rows if y == 0]
    assert min(pos) > max(neg), (min(pos), max(neg))


def test_token_nb_learns_planted_languages(spark):
    """train_token_nb/nb_predict: a 3-language planted-vocabulary
    corpus classifies held-out docs perfectly, weights and penalties
    live on the exact 2^-20 grid (order-independent inference), and
    predictions are invariant under repartitioning."""
    from pyspark.sql import functions as F

    from pyspark_deduplication_spark.functions.scoring import (
        nb_predict,
        train_token_nb,
    )

    vocab = {"aa": ["alpha", "apex", "arc"], "bb": ["beta", "bolt", "bay"],
             "cc": ["cusp", "cove", "cap"]}
    common = "spark table row join"
    rows = []
    did = 0
    for rep in range(12):
        for lang, ws in sorted(vocab.items()):
            toks = [ws[(rep + j) % 3] for j in range(2)]
            rows.append((did, common + " " + " ".join(toks), lang))
            did += 1
    train = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    weights, penalties = train_token_nb(train, "lang")
    for r in weights.collect():
        assert r.weight * (1 << 20) == int(r.weight * (1 << 20)), r
    for r in penalties.collect():
        assert r.penalty * (1 << 20) == int(r.penalty * (1 << 20)), r

    held = spark.createDataFrame(
        [(900, common + " alpha arc", "aa"),
         (901, common + " bolt beta", "bb"),
         (902, common + " cove cusp cap", "cc"),
         (903, common + " apex", "aa")],
        "doc_id long, text string, lang string")
    got = {r.doc_id: r.nb_pred
           for r in nb_predict(held, weights, penalties).collect()}
    assert got == {900: "aa", 901: "bb", 902: "cc", 903: "aa"}, got
    got2 = {r.doc_id: r.nb_pred
            for r in nb_predict(held.repartition(7), weights,
                                penalties).collect()}
    assert got2 == got


def test_token_nb_tie_breaks_lexicographically_last(spark):
    """A doc with zero discriminative evidence and equal class
    penalties must resolve deterministically to the lexicographically
    LAST label (the detect_language struct-max convention)."""
    from pyspark_deduplication_spark.functions.scoring import (
        nb_predict,
        train_token_nb,
    )

    # perfectly symmetric training: both labels see the same counts
    train = spark.createDataFrame(
        [(0, "zig zag", "aa"), (1, "zig zag", "bb")],
        "doc_id long, text string, lang string")
    weights, penalties = train_token_nb(train, "lang")
    held = spark.createDataFrame([(9, "zig")], "doc_id long, text string")
    got = nb_predict(held, weights, penalties).head()
    assert got.nb_pred == "bb", got


def test_trained_language_id_beats_heuristic(spark):
    """The graded accuracy report at sf0.001: the trained NB must beat
    the marker heuristic on held-out docs overall AND reach a real
    accuracy floor — the VERDICT r11 item 5 'done' bar."""
    from pyspark_deduplication_spark.queries import CATALOG

    for entry, floor in [("trained_language_id_report", 0.8),
                         ("trained_language_id_char3_report", 0.6)]:
        rows = CATALOG[entry].fn(spark, "/root/testdata/sf0.001").collect()
        n = sum(r.n_eval for r in rows)
        trained = sum(r.trained_correct for r in rows)
        heur = sum(r.heuristic_correct for r in rows)
        assert n > 0
        assert trained > heur, (entry, trained, heur)
        assert trained / n >= floor, (entry, trained, n)


def test_token_nb_char3_features_learn_without_word_list(spark):
    """features='char3' (the fastText-style production language-ID
    signal): boundary trigrams alone separate planted languages —
    held-out docs classify correctly even for WORDS NEVER SEEN in
    training, which token features cannot do."""
    from pyspark_deduplication_spark.functions.scoring import (
        nb_predict,
        train_token_nb,
    )

    # two "languages" with disjoint character inventories
    a_words = ["alfa", "arka", "fala", "klara", "karla", "lakk"]
    b_words = ["zond", "dozy", "synod", "nyzod", "zodsy", "dyzon"]
    rows = []
    did = 0
    for rep in range(10):
        rows.append((did, " ".join(a_words[(rep + j) % 6]
                                   for j in range(3)), "aa"))
        rows.append((did + 1, " ".join(b_words[(rep + j) % 6]
                                       for j in range(3)), "bb"))
        did += 2
    train = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    weights, penalties = train_token_nb(train, "lang", features="char3")
    # held-out docs are UNSEEN words built from each language's
    # character inventory — token-level features have no signal here
    held = spark.createDataFrame(
        [(900, "arfal kalla", "aa"), (901, "zynd dosyz", "bb"),
         (902, "falk arla", "aa"), (903, "nozdy zysod", "bb")],
        "doc_id long, text string, lang string")
    got = {r.doc_id: r.nb_pred
           for r in nb_predict(held, weights, penalties,
                               features="char3").collect()}
    assert got == {900: "aa", 901: "bb", 902: "aa", 903: "bb"}, got


def test_token_nb_char3u_classifies_nonlatin_scripts(spark):
    """features='char3u': real multilingual text — CJK (no spaces at
    all) vs Cyrillic — classifies on char trigrams over the
    Unicode-aware normalization; the ASCII 'char3' mode deletes both
    scripts before features form, so its model has NOTHING (the gap
    char3u closes)."""
    from pyspark_deduplication_spark.functions.scoring import (
        nb_predict,
        train_token_nb,
    )

    zh = ["数据清洗管道处理大规模文本",
          "重复数据删除是训练语料的关键步骤",
          "向量索引支持近似最近邻搜索"]
    ru = ["очистка данных в большом масштабе",
          "удаление дубликатов из корпуса",
          "векторный индекс для поиска соседей"]
    rows = []
    for i in range(3):
        rows.append((2 * i, zh[i], "zh"))
        rows.append((2 * i + 1, ru[i], "ru"))
    train = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    held = spark.createDataFrame(
        [(90, "大规模语料的清洗步骤", "zh"),
         (91, "поиск дубликатов в данных", "ru")],
        "doc_id long, text string, lang string")

    w_u, p_u = train_token_nb(train, "lang", features="char3u")
    got = {r.doc_id: r.nb_pred
           for r in nb_predict(held, w_u, p_u, features="char3u").collect()}
    assert got == {90: "zh", 91: "ru"}, got
    # the ASCII mode strips both scripts -> zero feature rows at train
    w_a, _ = train_token_nb(train, "lang", features="char3")
    assert w_a.count() == 0
