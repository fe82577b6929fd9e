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
