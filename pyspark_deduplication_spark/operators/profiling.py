"""Single-pass column profiling — the data-quality summary step.

One aggregation job computes null count, exact distinct count, and
min/max for every requested column, then ``stack`` pivots the one-row
result into a row per column. Multiple exact ``COUNT(DISTINCT)`` in one
aggregate make Catalyst plan an Expand (one duplicated stream per
distinct column) — the deliberate trade for a one-pass exact profile;
swap in ``approx_count_distinct`` for the 100 TB profile where ±2 % is
acceptable and the Expand disappears.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_numeric(
    df: DataFrame, cols: list[str], approx_distinct: bool = False
) -> DataFrame:
    """Profile numeric columns: one output row per column with
    ``column_name, n_nulls, n_distinct, min_value, max_value`` (min/max
    as double)."""
    aggs = []
    for c in cols:
        col = F.col(c)
        distinct = (F.approx_count_distinct(c) if approx_distinct
                    else F.count_distinct(col))
        aggs += [
            F.sum(F.when(col.isNull(), 1).otherwise(0)).alias(f"__{c}_nulls"),
            distinct.alias(f"__{c}_distinct"),
            F.min(col).cast("double").alias(f"__{c}_min"),
            F.max(col).cast("double").alias(f"__{c}_max"),
        ]
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', `__{c}_nulls`, `__{c}_distinct`, `__{c}_min`, `__{c}_max`"
        for c in cols
    )
    return one.select(F.expr(
        f"stack({len(cols)}, {stack}) AS "
        "(column_name, n_nulls, n_distinct, min_value, max_value)"
    ))
