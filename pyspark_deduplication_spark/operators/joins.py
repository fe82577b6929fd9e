"""Temporal join operators Spark lacks natively: as-of and range joins.

Neither appears in the reference (it has only theta self-joins, SURVEY
§2.4) but both are table stakes for time-series / training-data pipelines,
and both are expressible as compositions of built-in ops — no UDF, no
custom strategy.

- ``asof_join``: for each left row, the latest right row with
  ``right.ts <= left.ts`` (optionally per key, optionally within a
  tolerance). Implemented with the union-marker trick: tag both sides,
  union, sort within key by (ts, side), propagate the last right row
  forward with a window — ONE shuffle on the key, no N×M pairing, no
  per-group Python. This is the standard scalable formulation; the
  alternative ``pd.merge_asof`` via applyInPandas ships all rows through
  Arrow and is strictly worse here.
- ``range_join``: equi-join a fact to interval buckets (lo <= v < hi).
  With a small dim, broadcast + range predicate is optimal (the nested
  loop runs against an in-memory dim); for large dims, bucketize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For every left row, attach the most recent right row at-or-before
    its ``on`` timestamp (per ``by`` keys). Right columns come back
    suffixed; left rows with no prior right row get nulls.

    Ties on the timestamp: the right row sorts BEFORE the left probe at
    the same instant (side marker 0 < 1), so an exactly-simultaneous
    right row IS visible to the left row — `<=` semantics, matching
    ``pd.merge_asof`` and DuckDB ``ASOF JOIN``'s >= default.
    """
    by = by or []
    right_cols = right_cols or [
        c for c in right.columns if c != on and c not in by
    ]

    lt = left.withColumn("__side", F.lit(1))
    rt = right.select(
        *by, F.col(on),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    ).withColumn("__side", F.lit(0))

    # align schemas for the union
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in rt.columns:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None).cast(dict(rt.dtypes)[c]))
    unioned = lt.select(*rt.columns).union(rt.select(*rt.columns))

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col(on).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *[c for c in unioned.columns if c != "__side"],
        F.col("__side").alias("__side"),
        *[
            F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(w)
            .alias(f"__filled_{c}")
            for c in right_cols
        ],
    )
    out = filled.filter(F.col("__side") == 1).select(
        *[c for c in left.columns],
        *[F.col(f"__filled_{c}").alias(f"{c}{suffix}") for c in right_cols],
    )
    return out


def range_join(
    fact: DataFrame,
    dim: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "inner",
) -> DataFrame:
    """Join fact rows to the dim interval containing ``value_col``
    (lo <= v < hi). The dim is broadcast — the fact side streams through
    without a shuffle; Spark evaluates the range predicate against the
    in-memory dim (BroadcastNestedLoopJoin, the right physical choice for
    a small interval table)."""
    cond = (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    return fact.join(F.broadcast(dim), cond, how)
