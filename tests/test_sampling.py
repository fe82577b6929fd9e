"""Deterministic hash sampling (operators/sampling.py).

The point of hash sampling over Spark's Bernoulli ``sample``: membership
is a pure function of (key, seed), so it survives repartitioning, reruns,
and incremental appends — required for reproducible corpus curation.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from pyspark_deduplication_spark.operators.sampling import (
    hash_sample,
    stratified_hash_sample,
    _hex_threshold,
)


def _expected_keep(key: str, fraction: float, seed: str = "42") -> bool:
    if fraction >= 1.0:
        return True
    hexpair = hashlib.md5((key + seed).encode()).hexdigest()[:2]
    return hexpair < _hex_threshold(fraction)


def test_hex_threshold_boundaries():
    assert _hex_threshold(0.0) == "00"
    assert _hex_threshold(0.5) == "80"
    assert _hex_threshold(1.0) == "g"  # sorts after every hex pair
    assert "ff" < _hex_threshold(1.0)
    assert _hex_threshold(0.25) == "40"


def test_hash_sample_matches_python_md5(spark):
    df = spark.createDataFrame([(str(i),) for i in range(500)], ["k"])
    kept = {r.k for r in hash_sample(df, "k", 0.5).collect()}
    expected = {str(i) for i in range(500) if _expected_keep(str(i), 0.5)}
    assert kept == expected


def test_hash_sample_stable_under_repartition(spark):
    df = spark.createDataFrame([(str(i),) for i in range(300)], ["k"])
    a = {r.k for r in hash_sample(df, "k", 0.3).collect()}
    b = {r.k for r in hash_sample(df.repartition(7), "k", 0.3).collect()}
    assert a == b


def test_hash_sample_stable_under_append(spark):
    """An existing row's membership never changes when new rows arrive."""
    base = spark.createDataFrame([(str(i),) for i in range(200)], ["k"])
    extended = spark.createDataFrame([(str(i),) for i in range(400)], ["k"])
    kept_base = {r.k for r in hash_sample(base, "k", 0.4).collect()}
    kept_ext = {r.k for r in hash_sample(extended, "k", 0.4).collect()}
    assert kept_base == {k for k in kept_ext if int(k) < 200}


def test_hash_sample_fraction_accuracy(spark):
    n = 4000
    df = spark.createDataFrame([(str(i),) for i in range(n)], ["k"])
    for frac in (0.1, 0.5, 0.9):
        got = hash_sample(df, "k", frac).count()
        assert abs(got / n - frac) < 0.05, (frac, got)


def test_hash_sample_full_fraction_is_identity(spark):
    df = spark.createDataFrame([(str(i),) for i in range(50)], ["k"])
    assert hash_sample(df, "k", 1.0).count() == 50


def test_stratified_fractions(spark):
    rows = [("en", str(i)) for i in range(1000)] + [
        ("de", str(i)) for i in range(1000, 1200)
    ]
    df = spark.createDataFrame(rows, ["lang", "k"])
    out = stratified_hash_sample(df, "lang", "k", {"en": 0.5})
    counts = {r.lang: r.n for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts["de"] == 200  # default fraction 1.0 keeps everything
    assert abs(counts["en"] / 1000 - 0.5) < 0.06


def test_stratified_default_fraction(spark):
    rows = [("en", str(i)) for i in range(400)] + [
        ("de", str(i)) for i in range(400)
    ]
    df = spark.createDataFrame(rows, ["lang", "k"])
    out = stratified_hash_sample(df, "lang", "k", {"en": 1.0},
                                 default_fraction=0.0)
    counts = {r.lang: r.n for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts.get("en", 0) == 400
    assert "de" not in counts


def test_stratified_matches_per_stratum_hash_sample(spark):
    """Stratified = per-stratum hash_sample with the same key/seed, so
    downsampled strata stay consistent with standalone samples."""
    rows = [("en", str(i)) for i in range(300)]
    df = spark.createDataFrame(rows, ["lang", "k"])
    strat = {r.k for r in
             stratified_hash_sample(df, "lang", "k", {"en": 0.3}).collect()}
    plain = {r.k for r in hash_sample(df, "k", 0.3).collect()}
    assert strat == plain


def test_hash_sample_fractions_nest_monotonically(spark):
    """Threshold sampling nests: raising the fraction only ADDS rows —
    sample(0.2) ⊆ sample(0.5) ⊆ sample(0.8). Bernoulli sampling has no
    such property; it's what makes hash samples auditable (a smaller
    audit sample is always a subset of the production sample)."""
    df = spark.createDataFrame([(str(i),) for i in range(800)], ["k"])
    s2 = {r.k for r in hash_sample(df, "k", 0.2).collect()}
    s5 = {r.k for r in hash_sample(df, "k", 0.5).collect()}
    s8 = {r.k for r in hash_sample(df, "k", 0.8).collect()}
    assert s2 <= s5 <= s8
    assert len(s2) < len(s5) < len(s8)


def test_hash_split_partitions_every_row_exactly_once(spark):
    from pyspark_deduplication_spark.operators.sampling import hash_split

    df = spark.createDataFrame([(str(i),) for i in range(400)], ["k"])
    out = hash_split(df, "k", {"train": 0.8, "val": 0.1, "test": 0.1})
    rows = out.collect()
    assert len(rows) == 400
    assert {r.split for r in rows} == {"train", "val", "test"}
    # every row gets exactly one split, stable across repartition
    again = {r.k: r.split
             for r in hash_split(df.repartition(7), "k",
                                 {"train": 0.8, "val": 0.1, "test": 0.1})
             .collect()}
    assert {r.k: r.split for r in rows} == again


def test_hash_split_matches_python_md5(spark):
    from pyspark_deduplication_spark.operators.sampling import hash_split

    df = spark.createDataFrame([(str(i),) for i in range(300)], ["k"])
    got = {r.k: r.split
           for r in hash_split(df, "k", {"a": 0.5, "b": 0.5}).collect()}
    for i in range(300):
        hexpair = hashlib.md5((str(i) + "42").encode()).hexdigest()[:2]
        assert got[str(i)] == ("a" if hexpair < _hex_threshold(0.5) else "b")


def test_hash_split_nests_with_hash_sample(spark):
    """The train split under the same seed IS the 0.8 hash sample —
    splits and samples compose without re-hashing."""
    from pyspark_deduplication_spark.operators.sampling import hash_split

    df = spark.createDataFrame([(str(i),) for i in range(300)], ["k"])
    train = {r.k for r in hash_split(df, "k", {"t": 0.8, "rest": 0.2})
             .filter(F.col("split") == "t").collect()}
    sample = {r.k for r in hash_sample(df, "k", 0.8).collect()}
    assert train == sample


def test_cap_per_group_keeps_first_n_by_order(spark):
    from pyspark_deduplication_spark.operators.sampling import cap_per_group

    rows = [(g, i) for g in ("x", "y") for i in range(10)]
    df = spark.createDataFrame(rows, ["g", "i"])
    out = cap_per_group(df, "g", "i", cap=3)
    kept = sorted((r.g, r.i) for r in out.filter("__kept").collect())
    assert kept == [("x", 0), ("x", 1), ("x", 2),
                    ("y", 0), ("y", 1), ("y", 2)]
    assert out.filter("NOT __kept").count() == 14


def test_execute_token_budget_tight_prefix_and_monotone(spark):
    """Mixture-plan execution: per-group kept tokens fit the budget and
    are TIGHT (the next doc in hash order would overflow), zero-token
    rows are free, and raising a budget only APPENDS rows."""
    from pyspark.sql import functions as F

    from pyspark_deduplication_spark.operators.sampling import (
        execute_token_budget,
    )

    rows = [(i, f"g{i % 3}", (i * 7) % 23 + 1) for i in range(60)]
    rows.append((100, "g0", 0))  # zero-token row: costs nothing
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    budgets = spark.createDataFrame(
        [("g0", 90), ("g1", 55), ("g2", 0)],
        "source string, planned_tokens long")

    kept = execute_token_budget(df, budgets).collect()
    by_group: dict = {}
    for r in kept:
        by_group.setdefault(r.source, []).append(r)
    # budget respected, inclusive cum sums consistent
    budget_of = {"g0": 90, "g1": 55, "g2": 0}
    for g, rs in by_group.items():
        total = sum(r.n_tok for r in rs)
        assert total <= budget_of[g], (g, total)
        assert max(r.cum_tokens if hasattr(r, "cum_tokens")
                   else r.__getitem__("__cum_tokens") for r in rs) == total
    # g2 budget 0: only zero-token rows could survive (none in g2)
    assert "g2" not in by_group
    # tightness: rerun with budget+max_tok; strictly more rows kept for
    # groups that were budget-bound (g0 got the free zero-token row too)
    bigger = spark.createDataFrame(
        [("g0", 90 + 23), ("g1", 55 + 23), ("g2", 0)],
        "source string, planned_tokens long")
    kept2 = {(r.doc_id) for r in execute_token_budget(df, bigger).collect()}
    kept1 = {(r.doc_id) for r in kept}
    assert kept1 < kept2  # monotone: strict superset
    # determinism across partitionings
    kept3 = {r.doc_id for r in
             execute_token_budget(df.repartition(11), budgets).collect()}
    assert kept1 == kept3


def test_execute_token_budget_prefilter_preserves_selection(spark):
    """The 100 TB skew pre-filter cuts on the SAME hash-order key the
    window sorts by, so the surviving superset contains the exact kept
    prefix: prefiltered output == exact output on a skewed fixture
    (one mega-group, budget ≪ inventory), and the pre-filter really
    shrinks the windowed input."""
    from pyspark.sql import functions as F

    from pyspark_deduplication_spark.operators.sampling import (
        execute_token_budget,
    )

    rows = [(i, "mega", (i * 13) % 29 + 1) for i in range(2000)]
    rows += [(10_000 + i, "tiny", 5) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    budgets = spark.createDataFrame(
        [("mega", 300), ("tiny", 1000)],
        "source string, planned_tokens long")

    exact = sorted(r.doc_id for r in execute_token_budget(df, budgets)
                   .collect())
    pref = sorted(r.doc_id for r in execute_token_budget(
        df, budgets, prefilter_factor=2.0).collect())
    assert exact == pref
    # the under-budget tiny group has frac ≥ 1 → untouched, all kept
    assert sum(1 for d in pref if d >= 10_000) == 10
    # the pre-filter genuinely shrinks the windowed input: replicate
    # its hash-prefix cut — ~2×300/30k ≈ 2% of the mega group survives
    thr = format(int(2.0 * 300 / sum((i * 13) % 29 + 1
                                     for i in range(2000)) * 65536) + 1,
                 "04x")
    surviving = df.filter(
        (F.col("source") == "mega")
        & (F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("mix"))),
            1, 4) < thr)).count()
    assert surviving < 120, surviving        # ≪ the 2,000-row group
    # every exact-kept mega row sits inside that surviving prefix
    assert all(d >= 10_000 or d in
               {r.doc_id for r in df.filter(
                   F.substring(F.md5(F.concat(F.col("doc_id").cast("string"),
                                              F.lit("mix"))), 1, 4) < thr)
                .collect()}
               for d in exact)


def test_execute_token_budget_prefilter_near_full_fraction(spark):
    """Regression (review finding): frac just under 1.0 ceils to 65536,
    whose 5-hex-digit spelling lpad(…, 4) would truncate to '1000' and
    silently drop ~94% of the group — the ceiled keep-all escape must
    fire instead, leaving prefiltered == exact."""
    from pyspark_deduplication_spark.operators.sampling import (
        execute_token_budget,
    )

    # inventory 1000 tokens; factor 2 × budget 499 → frac = 0.998 < 1.0
    rows = [(i, "g", 10) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    budgets = spark.createDataFrame(
        [("g", 499)], "source string, planned_tokens long")
    exact = sorted(r.doc_id for r in execute_token_budget(df, budgets)
                   .collect())
    pref = sorted(r.doc_id for r in execute_token_budget(
        df, budgets, prefilter_factor=2.0).collect())
    assert exact == pref and len(exact) == 49


def test_execute_token_budget_prefilter_zero_budget_and_null_corners(spark):
    """Superset-of-exact corners (ADVICE r6): a zero-budget group must
    still keep its zero-token rows under the pre-filter (frac=0 gives
    thr '0000', which would drop everything), and an all-NULL token
    column (NULL group inventory) must fall back to keep-all instead of
    dropping the group."""
    from pyspark_deduplication_spark.operators.sampling import (
        execute_token_budget,
    )

    rows = [(1, "zb", 0), (2, "zb", 7), (3, "zb", 0)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    budgets = spark.createDataFrame(
        [("zb", 0)], "source string, planned_tokens long")
    exact = sorted(r.doc_id for r in execute_token_budget(df, budgets)
                   .collect())
    pref = sorted(r.doc_id for r in execute_token_budget(
        df, budgets, prefilter_factor=2.0).collect())
    assert exact == pref == [1, 3]

    # prefix-property counterexample (review r7): a zero-token row
    # hashing AFTER a budget-busting row must stay dropped — a per-row
    # zero-token escape would admit it with a shrunken running sum.
    # md5 hash order for seed 'mix' is doc1, doc3, doc2; doc3 busts the
    # zero budget, so exact keeps only doc1 — and so must the prefilter
    # (the group-level budget<=0 escape keeps ALL rows through the
    # window, which then sums exactly what the exact path sums).
    rows2 = [(1, "pz", 0), (2, "pz", 0), (3, "pz", 7)]
    df2 = spark.createDataFrame(
        rows2, "doc_id long, source string, n_tok long")
    b2 = spark.createDataFrame(
        [("pz", 0)], "source string, planned_tokens long")
    exact2 = sorted(r.doc_id for r in execute_token_budget(df2, b2)
                    .collect())
    pref2 = sorted(r.doc_id for r in execute_token_budget(
        df2, b2, prefilter_factor=2.0).collect())
    assert exact2 == pref2 == [1]

    null_rows = [(1, "ng", None), (2, "ng", None)]
    dfn = spark.createDataFrame(
        null_rows, "doc_id long, source string, n_tok long")
    bn = spark.createDataFrame(
        [("ng", 100)], "source string, planned_tokens long")
    exact_n = sorted(r.doc_id for r in execute_token_budget(dfn, bn)
                     .collect())
    pref_n = sorted(r.doc_id for r in execute_token_budget(
        dfn, bn, prefilter_factor=2.0).collect())
    assert exact_n == pref_n


def test_leakage_safe_split_groups_never_straddle(spark):
    """Dup-group-aware split: every member of a fingerprint group lands
    in ONE split (keyed by the group's min id), singleton groups match
    the naive row split exactly, and the assignment is stable under
    corpus growth (existing rows keep their split when rows append)."""
    from pyspark.sql import functions as F

    from pyspark_deduplication_spark.operators.sampling import (
        hash_split,
        leakage_safe_split,
    )

    fractions = {"train": 0.8, "val": 0.1, "test": 0.1}
    rows = [(i, f"unique document number {i}") for i in range(40)]
    rows += [(100 + i, "identical duplicated body text") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = leakage_safe_split(
        df, F.md5(F.col("text")), "doc_id", fractions).collect()

    by_id = {r.doc_id: r for r in out}
    dup_splits = {by_id[100 + i].split for i in range(6)}
    assert len(dup_splits) == 1  # the whole group moves together
    assert all(by_id[100 + i].group_key == 100 for i in range(6))

    naive = {r.doc_id: r.split for r in hash_split(
        df, "doc_id", fractions).collect()}
    for i in range(40):  # singletons: group split == row split
        assert by_id[i].split == naive[i]

    # growth stability: appending new docs — including fresh dups of
    # existing ones (higher ids, so group mins don't move) — must not
    # change any existing row's split
    grown = spark.createDataFrame(
        rows + [(500 + i, f"unique document number {i}") for i in range(3)],
        "doc_id long, text string")
    regrown = {r.doc_id: r.split for r in leakage_safe_split(
        grown, F.md5(F.col("text")), "doc_id", fractions).collect()}
    assert all(regrown[r.doc_id] == r.split for r in out)
    for i in range(3):  # and the new dups inherit their group's split
        assert regrown[500 + i] == by_id[i].split


def test_reservoir_per_group_merge_property(spark):
    """The reservoir update rule: bottomk(A ∪ B) == bottomk(bottomk(A)
    ∪ B) — any arrival-order chunking converges to the same sample,
    which is what lets the streaming ingest keep no per-row state."""
    from pyspark_deduplication_spark.operators.sampling import (
        reservoir_per_group,
    )

    df = spark.createDataFrame([(i % 5, i) for i in range(200)],
                               "grp int, id long")
    a, b = df.filter("id < 120"), df.filter("id >= 120")
    full = sorted((r.grp, r.id)
                  for r in reservoir_per_group(df, "grp", "id", 7).collect())
    merged = sorted(
        (r.grp, r.id)
        for r in reservoir_per_group(
            reservoir_per_group(a, "grp", "id", 7).unionByName(b),
            "grp", "id", 7).collect())
    assert full == merged
    # three-way chunking converges too
    c1, c2, c3 = (df.filter("id % 3 = " + str(m)) for m in range(3))
    step = reservoir_per_group(c1, "grp", "id", 7)
    step = reservoir_per_group(step.unionByName(c2), "grp", "id", 7)
    step = reservoir_per_group(step.unionByName(c3), "grp", "id", 7)
    assert full == sorted((r.grp, r.id) for r in step.collect())


def test_reservoir_per_group_bounded_and_deterministic(spark):
    from pyspark_deduplication_spark.operators.sampling import (
        reservoir_per_group,
    )

    rows = [(0, i) for i in range(40)] + [(1, i) for i in range(100, 103)]
    df = spark.createDataFrame(rows, "grp int, id long")
    out = reservoir_per_group(df, "grp", "id", 5)
    got = sorted((r.grp, r.id) for r in out.collect())
    sizes = {}
    for g, _ in got:
        sizes[g] = sizes.get(g, 0) + 1
    assert sizes[0] == 5                      # capped at k
    assert sizes[1] == 3                      # under-k group kept whole
    # partitioning-independent (the window orders on (hash, key))
    again = sorted((r.grp, r.id)
                   for r in reservoir_per_group(
                       df.repartition(7), "grp", "id", 5).collect())
    assert got == again
    # replayed (duplicate) rows cannot occupy two slots
    doubled = reservoir_per_group(df.unionByName(df), "grp", "id", 5)
    assert got == sorted((r.grp, r.id) for r in doubled.collect())
