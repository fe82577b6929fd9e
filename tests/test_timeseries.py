"""Gap-fill / resample operator semantics."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from pyspark_deduplication_spark.operators.timeseries import (
    gapfill,
    resample_buckets,
)


def _ts(h: int, m: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, h, m)


def test_gapfill_materializes_missing_buckets_and_ffills(spark):
    ev = spark.createDataFrame(
        [(1, _ts(0, 10), 10.0), (1, _ts(0, 50), 20.0), (1, _ts(3, 5), 30.0),
         (2, _ts(5, 0), 99.0)],
        "user_id long, ts timestamp, value double",
    )
    b = resample_buckets(ev, "user_id", "ts", "1 hour", aggs=[
        F.count(F.lit(1)).alias("n_events"),
        F.max("value").alias("last_val"),
    ])
    out = gapfill(b, "user_id", "1 hour",
                  fill_zero=["n_events"], ffill=["last_val"])
    rows = {(r.user_id, r.bucket.hour): r for r in out.collect()}
    # user 1 spans hours 0..3 → 4 buckets incl. empty hours 1 and 2
    assert {(u, h) for u, h in rows} == {(1, 0), (1, 1), (1, 2), (1, 3), (2, 5)}
    assert rows[(1, 0)].n_events == 2
    assert rows[(1, 1)].n_events == 0 and rows[(1, 2)].n_events == 0
    # forward-fill carries hour 0's value across the gap
    assert rows[(1, 1)].last_val == 20.0
    assert rows[(1, 2)].last_val == 20.0
    assert rows[(1, 3)].last_val == 30.0
    # single-bucket key: no gaps invented
    assert rows[(2, 5)].n_events == 1


def test_gapfill_without_ffill_leaves_gap_nulls(spark):
    ev = spark.createDataFrame(
        [(1, _ts(0), 1.0), (1, _ts(2), 2.0)],
        "user_id long, ts timestamp, value double",
    )
    b = resample_buckets(ev, "user_id", "ts", "1 hour",
                         aggs=[F.max("value").alias("v")])
    out = gapfill(b, "user_id", "1 hour")
    gap = [r for r in out.collect() if r.bucket.hour == 1][0]
    assert gap.v is None
