"""Approximate aggregates: engine-specific sketches (HLL, KLL) cannot be
oracle-matched across engines; their accuracy contracts are pinned here."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_approx_count_distinct_within_tolerance(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    row = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx"),
        F.countDistinct("l_orderkey").alias("exact"),
    ).first()
    # rsd=0.01 → 3 sigma ≈ 3%
    assert abs(row.approx - row.exact) / row.exact < 0.03


def test_percentile_approx_brackets_exact(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    row = orders.agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx"),
        F.expr("percentile(o_totalprice, 0.5)").alias("exact"),
    ).first()
    # high-accuracy KLL at this size must be within 2% of the exact median
    assert abs(row.approx - row.exact) / row.exact < 0.02


def test_approx_count_distinct_deterministic(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    a = li.agg(F.approx_count_distinct("l_partkey").alias("x")).first().x
    b = li.agg(F.approx_count_distinct("l_partkey").alias("x")).first().x
    assert a == b  # HLL merge is commutative — same data, same estimate


def test_hll_rollup_and_union_accuracy(spark, sf_dir):
    """Per-source HLL sketches estimate within tolerance, and unioning
    the persisted sketches to a global estimate agrees with sketching
    the whole corpus directly — the merge property that lets sketch
    tables answer coarser rollups without re-scanning raw data."""
    from pyspark.sql import functions as F

    from pyspark_deduplication_spark.operators.profiling import (
        hll_rollup,
        hll_union_rollup,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_src = hll_rollup(docs, ["source"], "text", lg_k=12)
    exact = {r.source: r.x for r in docs.groupBy("source")
             .agg(F.count_distinct("text").alias("x")).collect()}
    for r in per_src.collect():
        assert abs(r.approx_distinct - exact[r.source]) <= 0.05 * exact[r.source]

    global_exact = docs.select("text").distinct().count()
    unioned = hll_union_rollup(per_src, []).collect()[0].approx_distinct
    assert abs(unioned - global_exact) <= 0.05 * global_exact
    # determinism: same data, same sketch params -> identical estimate
    again = hll_union_rollup(
        hll_rollup(docs, ["source"], "text", lg_k=12), []
    ).collect()[0].approx_distinct
    assert again == unioned


def test_cms_never_undercounts_and_merges_exactly(spark):
    """Count-Min contracts: estimates ≥ true counts for every key; on a
    skewed corpus with width ≫ distinct keys the heavy key is exact;
    and cms_merge(cms(A), cms(B)) equals cms(A ∪ B) cell-for-cell."""
    from pyspark_deduplication_spark.operators.profiling import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    rows = ([("heavy",)] * 500
            + [(f"k{i % 37}",) for i in range(300)]
            + [(None,)] * 7)
    df = spark.createDataFrame(rows, "key string")
    sketch = cms_build(df, "key", width=256, depth=4)
    truth = {r.key: r.cnt for r in
             df.groupBy("key").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    probes = df.select("key").distinct()
    est = {r.key: r.est_count for r in
           cms_estimate(sketch, probes, "key", width=256, depth=4).collect()}
    for k, n in truth.items():
        assert est[k] >= n, (k, est[k], n)
    assert est["heavy"] == 500        # width ≫ keys: heavy key exact
    assert est[None] == 7             # NULLs hash the sentinel

    a, b = df.limit(400), df.subtract(df.limit(400))
    # randomSplit is seeded-random; a deterministic split keeps it simple
    a = df.filter(F.xxhash64("key") % 2 == 0)
    b = df.filter(F.xxhash64("key") % 2 != 0)
    merged = cms_merge(cms_build(a, "key", 256, 4),
                       cms_build(b, "key", 256, 4))
    direct = {(r.row, r.col): r.cnt for r in sketch.collect()}
    via_merge = {(r.row, r.col): r.cnt for r in merged.collect()}
    assert direct == via_merge


def test_quantile_sketch_merge_equals_build_on_union(spark):
    """The KMV merge property on the quantile sketch:
    merge(build(A), build(B)) must equal build(A ∪ B) ROW-FOR-ROW
    (bottom-k by deterministic md5 tag — an element of the combined
    bottom-k is in the bottom-k of any subset containing it), and the
    estimates must agree exactly. Also pins partitioning independence
    (repartition(13) cannot change a hash-ordered selection)."""
    from pyspark_deduplication_spark.operators.profiling import (
        quantile_sketch_build,
        quantile_sketch_estimate,
        quantile_sketch_merge,
    )

    rows = [(f"g{i % 3}", i, float((i * 37) % 101)) for i in range(600)]
    df = spark.createDataFrame(rows, "source string, id long, v double")
    a = df.filter(F.col("id") % 2 == 0)
    b = df.filter(F.col("id") % 2 == 1)

    whole = quantile_sketch_build(df, "source", "id", "v", k=32)
    merged = quantile_sketch_merge(
        quantile_sketch_build(a, "source", "id", "v", k=32),
        quantile_sketch_build(b, "source", "id", "v", k=32),
        group_col="source", k=32)
    key = lambda r: (r["source"], r["h"], r["v"])  # noqa: E731
    assert sorted(map(key, whole.collect())) \
        == sorted(map(key, merged.collect()))

    repart = quantile_sketch_build(
        df.repartition(13), "source", "id", "v", k=32)
    assert sorted(map(key, whole.collect())) \
        == sorted(map(key, repart.collect()))

    est_w = quantile_sketch_estimate(whole, [0.5, 0.9], "source").collect()
    est_m = quantile_sketch_estimate(merged, [0.5, 0.9], "source").collect()
    assert [tuple(r) for r in est_w] == [tuple(r) for r in est_m]


def test_quantile_sketch_rank_error_bound(spark):
    """Accuracy contract: a size-k KMV sample's empirical q-quantile
    has true rank within q ± ~3·√(q(1−q)/k). At k=256 over n=5000 the
    3σ band is ±0.094; pin ±0.1 on the DETERMINISTIC md5 sample (no
    flakiness — the bound is measured, not assumed). Also pins the
    rank-1 corner: any q ≤ 1/n estimates the group minimum."""
    from pyspark_deduplication_spark.operators.profiling import (
        quantile_sketch_build,
        quantile_sketch_estimate,
    )

    n, k = 5000, 256
    df = spark.createDataFrame(
        [("g", i, float((i * 7919) % n)) for i in range(n)],
        "source string, id long, v double")
    sketch = quantile_sketch_build(df, "source", "id", "v", k=k)
    assert sketch.count() == k
    for q in (0.1, 0.5, 0.9, 0.99):
        est = quantile_sketch_estimate(sketch, [q], "source") \
            .first()["est_value"]
        true_rank = df.filter(F.col("v") <= est).count() / n
        assert abs(true_rank - q) <= 0.1, (q, est, true_rank)

    tiny = quantile_sketch_estimate(sketch, [0.0001], "source").first()
    sample_min = sketch.agg(F.min("v")).first()[0]
    assert tiny["est_value"] == sample_min
