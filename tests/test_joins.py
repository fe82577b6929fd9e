"""As-of and range joins: semantics on hand-built fixtures."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_deduplication_spark.operators.joins import asof_join, range_join


def _ts(spark, rows, schema):
    return spark.createDataFrame(rows, schema).withColumn(
        "ts", F.to_timestamp("ts"))


def test_asof_picks_latest_at_or_before(spark):
    left = _ts(spark, [
        (1, 100, "2024-01-01 10:00:00"),
        (2, 100, "2024-01-01 12:00:00"),
        (3, 100, "2024-01-01 09:00:00"),   # before any right row
        (4, 200, "2024-01-01 10:30:00"),   # other key
    ], "id long, user_id long, ts string")
    right = _ts(spark, [
        (100, "2024-01-01 09:30:00", 1.0),
        (100, "2024-01-01 11:00:00", 2.0),
        (200, "2024-01-01 10:30:00", 9.0),  # exactly simultaneous
    ], "user_id long, ts string, rv double")

    out = {r.id: r.rv for r in
           asof_join(left, right, on="ts", by=["user_id"],
                     right_cols=["rv"], suffix="").collect()}
    assert out[1] == 1.0     # 09:30 row
    assert out[2] == 2.0     # 11:00 supersedes 09:30
    assert out[3] is None    # nothing at or before 09:00
    assert out[4] == 9.0     # <= semantics: simultaneous row visible


def test_asof_left_rows_all_preserved(spark):
    left = _ts(spark, [(i, 1, f"2024-01-01 0{i}:00:00") for i in range(1, 6)],
               "id long, user_id long, ts string")
    right = _ts(spark, [(1, "2024-01-01 03:00:00", 7.0)],
                "user_id long, ts string, rv double")
    out = asof_join(left, right, on="ts", by=["user_id"],
                    right_cols=["rv"], suffix="")
    assert out.count() == 5
    got = {r.id: r.rv for r in out.collect()}
    assert got == {1: None, 2: None, 3: 7.0, 4: 7.0, 5: 7.0}


def test_asof_no_shuffle_blowup(spark):
    """The as-of plan must be window-based — no join node pairing the two
    sides row-by-row."""
    from pyspark_deduplication_spark.plans.inspect import explain_str

    left = _ts(spark, [(1, 1, "2024-01-01 10:00:00")],
               "id long, user_id long, ts string")
    right = _ts(spark, [(1, "2024-01-01 09:00:00", 1.0)],
                "user_id long, ts string, rv double")
    plan = explain_str(asof_join(left, right, on="ts", by=["user_id"],
                                 right_cols=["rv"]))
    assert "Join" not in plan  # union + window, not a join
    assert "Window" in plan


def test_range_join_interval_assignment(spark):
    fact = spark.createDataFrame([(1, 5.0), (2, 10.0), (3, 99.9), (4, -1.0)],
                                 "id long, v double")
    dim = spark.createDataFrame(
        [("low", 0.0, 10.0), ("high", 10.0, 100.0)],
        "band string, lo double, hi double")
    out = {r.id: r.band for r in range_join(fact, dim, "v").collect()}
    assert out == {1: "low", 2: "high", 3: "high"}  # 4 drops (no interval)
    # boundary: v=10 lands in [10,100), not [0,10)


def test_range_join_broadcast(spark):
    from pyspark_deduplication_spark.plans.inspect import explain_str

    fact = spark.range(10).withColumn("v", F.col("id").cast("double"))
    dim = spark.createDataFrame([("b", 0.0, 5.0)],
                                "band string, lo double, hi double")
    assert "Broadcast" in explain_str(range_join(fact, dim, "v"))


def test_asof_forward_direction(spark):
    import datetime as dt

    from pyspark_deduplication_spark.operators.joins import asof_join

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t(10)), (1, t(30)), (2, t(5))], "k long, ts timestamp")
    right = spark.createDataFrame(
        [(1, t(15), "a"), (1, t(25), "b"), (2, t(5), "c")],
        "k long, ts timestamp, v string")
    out = {(r.k, r.ts.minute): r.v_right for r in
           asof_join(left, right, by=["k"], direction="forward").collect()}
    assert out[(1, 10)] == "a"    # next right at-or-after 00:10 is 00:15
    assert out[(1, 30)] is None   # nothing after 00:30
    assert out[(2, 5)] == "c"     # simultaneous right row visible (>=)


def test_asof_tolerance_null_fills(spark):
    import datetime as dt

    from pyspark_deduplication_spark.operators.joins import asof_join

    t = lambda m: dt.datetime(2024, 1, 1, 0, m)  # noqa: E731
    left = spark.createDataFrame([(1, t(30)), (1, t(59))],
                                 "k long, ts timestamp")
    right = spark.createDataFrame([(1, t(0), "x")],
                                  "k long, ts timestamp, v string")
    out = {r.ts.minute: r.v_right for r in
           asof_join(left, right, by=["k"],
                     tolerance="45 MINUTE").collect()}
    assert out[30] == "x"     # 30 min back — within tolerance
    assert out[59] is None    # 59 min back — beyond tolerance, null-filled
    # row count preserved (tolerance never drops left rows)
    assert len(out) == 2
