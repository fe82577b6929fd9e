"""Time-series resampling: bucket, gap-fill, forward-fill.

The hypertable-style operator batch engines usually lack: aggregate a
ragged event stream into fixed buckets per key, materialize the EMPTY
buckets between a key's first and last observation, and carry the last
observed value across gaps.

Scale notes (100 TB): the dense grid is generated distributively with
``sequence`` + ``explode`` — per-key row counts proportional to that
key's time span, never a driver loop or a global calendar cross join.
The whole pipeline shuffles once on the key (the groupBy); the grid
join and the forward-fill window reuse that partitioning. Keys with
multi-year spans at fine steps inflate output rows, not shuffle width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample_buckets(
    df: DataFrame, key_col: str, ts_col: str, step: str = "1 hour",
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Per-key fixed-width bucket aggregation. ``step`` is a Spark
    interval literal; buckets align to the epoch (window start)."""
    bucket = F.window(F.col(ts_col), step).start.alias("bucket")
    aggs = aggs or [F.count(F.lit(1)).alias("n_events")]
    return df.groupBy(F.col(key_col), bucket).agg(*aggs)


def gapfill(
    bucketed: DataFrame, key_col: str, step: str = "1 hour",
    bucket_col: str = "bucket", fill_zero: list[str] = (),
    ffill: list[str] = (),
) -> DataFrame:
    """Densify per-key bucket series: emit every step between each key's
    first and last bucket. ``fill_zero`` columns get 0 in gap rows;
    ``ffill`` columns carry the last non-null value forward (ordered by
    bucket — deterministic because buckets are unique per key)."""
    grid = (
        bucketed.groupBy(key_col)
        .agg(F.min(bucket_col).alias("__lo"), F.max(bucket_col).alias("__hi"))
        .select(
            key_col,
            F.explode(F.sequence(
                F.col("__lo"), F.col("__hi"),
                F.expr(f"interval {step}"))).alias(bucket_col),
        )
    )
    out = grid.join(bucketed, [key_col, bucket_col], "left")
    for c in fill_zero:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    if ffill:
        w = (Window.partitionBy(key_col).orderBy(bucket_col)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        for c in ffill:
            out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out
