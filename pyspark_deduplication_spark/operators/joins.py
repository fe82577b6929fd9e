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
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """For every left row, attach the nearest right row at-or-before
    (``direction='backward'``, default) or at-or-after (``'forward'``)
    its ``on`` timestamp, per ``by`` keys — ``pd.merge_asof`` semantics.
    Right columns come back suffixed; left rows with no match get nulls.
    ``tolerance`` (a Spark interval string like ``'1 hour'``) null-fills
    matches farther than the bound instead of dropping the left row.

    Ties on the timestamp: the side marker orders the simultaneous right
    row so it IS visible to the left probe in either direction — `<=` /
    `>=` semantics, matching ``pd.merge_asof`` and DuckDB ``ASOF JOIN``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    by = by or []
    right_cols = right_cols or [
        c for c in right.columns if c != on and c not in by
    ]
    # the right row's own timestamp must propagate when a tolerance needs
    # checking; emit it to the caller only if they asked for it
    fill_cols = list(right_cols)
    if tolerance is not None and on not in fill_cols:
        fill_cols.append(on)

    lt = left.withColumn("__side", F.lit(1))
    rt = right.select(
        *by, F.col(on),
        *[F.col(c).alias(f"{c}{suffix}") for c in fill_cols],
    ).withColumn("__side", F.lit(0))

    # align schemas for the union
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in rt.columns:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None).cast(dict(rt.dtypes)[c]))
    unioned = lt.select(*rt.columns).union(rt.select(*rt.columns))

    if direction == "backward":
        # right (0) sorts before left (1) at the same instant
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        pick = F.last
    else:
        # left (1) sorts before right (0) at the same instant, and the
        # frame looks ahead
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("__side").desc())
            .rowsBetween(0, Window.unboundedFollowing)
        )
        pick = F.first
    filled = unioned.select(
        *[c for c in unioned.columns if c != "__side"],
        F.col("__side").alias("__side"),
        *[
            pick(F.col(f"{c}{suffix}"), ignorenulls=True).over(w)
            .alias(f"__filled_{c}")
            for c in fill_cols
        ],
    )
    matched = filled.filter(F.col("__side") == 1)
    if tolerance is not None:
        bound = F.expr(f"INTERVAL {tolerance}")
        match_on = F.col(f"__filled_{on}")
        within = (
            match_on >= F.col(on) - bound if direction == "backward"
            else match_on <= F.col(on) + bound
        )
        matched = matched.select(
            *[c for c in matched.columns if not c.startswith("__filled_")],
            *[F.when(within, F.col(f"__filled_{c}"))
              .otherwise(F.lit(None)).alias(f"__filled_{c}")
              for c in fill_cols],
        )
    return matched.select(
        *[c for c in left.columns],
        *[F.col(f"__filled_{c}").alias(f"{c}{suffix}") for c in right_cols],
    )


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
