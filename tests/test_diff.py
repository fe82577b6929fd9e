"""snapshot_diff semantics — added/removed/changed with null safety."""

from __future__ import annotations

from pyspark_deduplication_spark.operators.diff import snapshot_diff


def _d(spark, rows):
    return spark.createDataFrame(rows, "k long, a string, b long")


def test_diff_classifies_all_change_types(spark):
    old = _d(spark, [(1, "x", 10), (2, "y", 20), (3, "z", 30)])
    new = _d(spark, [(2, "y", 20), (3, "Z", 30), (4, "w", 40)])
    out = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()}
    assert out == {1: "removed", 3: "changed", 4: "added"}  # 2 unchanged


def test_diff_null_transitions(spark):
    old = _d(spark, [(1, None, 10), (2, None, 20), (3, "v", 30)])
    new = _d(spark, [(1, None, 10), (2, "now", 20), (3, None, 30)])
    out = {r.k: r.change_type for r in snapshot_diff(old, new, ["k"]).collect()}
    # null == null is UNCHANGED (null-safe equality), null→value is changed
    assert out == {2: "changed", 3: "changed"}


def test_diff_compare_cols_subset(spark):
    old = _d(spark, [(1, "x", 10)])
    new = _d(spark, [(1, "x", 99)])
    full = snapshot_diff(old, new, ["k"]).collect()
    only_a = snapshot_diff(old, new, ["k"], compare_cols=["a"]).collect()
    assert [r.change_type for r in full] == ["changed"]
    assert only_a == []  # b excluded from comparison → unchanged


def test_diff_identical_snapshots_empty(spark):
    old = _d(spark, [(1, "x", 10), (2, None, 20)])
    assert snapshot_diff(old, old, ["k"]).count() == 0


def test_profile_numeric_counts_nulls_and_distincts(spark):
    from pyspark_deduplication_spark.operators.profiling import profile_numeric

    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 5.0), (None, 7.0)], "k long, v double")
    out = {r.column_name: r for r in profile_numeric(df, ["k", "v"]).collect()}
    assert out["k"].n_nulls == 1 and out["k"].n_distinct == 3
    assert out["v"].n_nulls == 1 and out["v"].n_distinct == 2
    assert out["v"].min_value == 5.0 and out["v"].max_value == 7.0
    # approx mode still produces the same shape
    ap = {r.column_name: r for r in
          profile_numeric(df, ["k"], approx_distinct=True).collect()}
    assert ap["k"].n_distinct >= 1
