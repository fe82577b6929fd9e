"""Data-quality constraint checking (Deequ-style, single-pass).

A constraint set compiles to ONE aggregation job over the table —
every check is an aggregate expression, so adding checks adds columns,
not passes. Referential checks join against the (aggregated, broadcast)
key set of the referenced dimension. The result is a one-row metrics
frame; ``violations`` turns it into a long (check, metric) report.

At 100 TB this is the shape you want: quality metrics ride the same
scan the pipeline already pays for, and the only shuffle is the final
single-row aggregate (plus one broadcast per referential check).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def null_count(col: str) -> Column:
    """Number of NULL values in ``col``."""
    return F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).cast(
        "long").alias(f"nulls_{col}")


def duplicate_key_count(*cols: str) -> Column:
    """Rows beyond the first per key — 0 means the key is unique.
    Exact distinct over the key columns; at extreme cardinality swap in
    ``approx_count_distinct`` for a cheaper, probabilistic check."""
    name = "_".join(cols)
    return (F.count(F.lit(1)) - F.countDistinct(*[F.col(c) for c in cols])) \
        .cast("long").alias(f"dup_keys_{name}")


def out_of_range_count(col: str, lo=None, hi=None) -> Column:
    """Non-NULL values outside [lo, hi]."""
    cond = F.lit(False)
    if lo is not None:
        cond = cond | (F.col(col) < lo)
    if hi is not None:
        cond = cond | (F.col(col) > hi)
    return F.sum(F.when(F.col(col).isNotNull() & cond, 1).otherwise(0)) \
        .cast("long").alias(f"out_of_range_{col}")


def check_constraints(df: DataFrame, checks: list[Column]) -> DataFrame:
    """Run every aggregate check in ONE pass; returns a 1-row frame with
    ``n_rows`` plus one column per check."""
    return df.agg(F.count(F.lit(1)).cast("long").alias("n_rows"), *checks)


def orphan_count(
    fact: DataFrame, fk: str, dim: DataFrame, pk: str
) -> DataFrame:
    """Foreign-key orphans: non-NULL ``fact.fk`` values with no match in
    ``dim.pk``. The dim side reduces to its distinct key set before the
    join (broadcast when small); returns a 1-row frame."""
    keys = dim.select(F.col(pk).alias("__k")).distinct()
    return (
        fact.filter(F.col(fk).isNotNull())
        .join(F.broadcast(keys), F.col(fk) == F.col("__k"), "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias(f"orphans_{fk}"))
    )


def violations(metrics: DataFrame) -> DataFrame:
    """Long-form report: one (check, metric) row per non-informational
    column of a ``check_constraints`` result, for alerting sinks."""
    cols = [c for c in metrics.columns if c != "n_rows"]
    pairs = F.array(*[
        F.struct(F.lit(c).alias("check"), F.col(c).cast("long").alias("metric"))
        for c in cols
    ])
    return (
        metrics.select(F.explode(pairs).alias("v"))
        .select("v.check", "v.metric")
    )
