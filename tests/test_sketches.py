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
