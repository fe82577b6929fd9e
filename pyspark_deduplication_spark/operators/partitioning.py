"""Partitioning strategies for shuffle elimination and skew mitigation.

None of these exist in the reference (single-node, coalesce(1) writes);
they are the knobs that decide whether a 100 TB join finishes:

- ``write_bucketed`` / bucketed co-located joins: both sides pre-hashed
  into the same bucket layout at write time → later equi-joins on the
  bucket key need NO exchange at all (verified by plan test).
- ``salted_join``: explicit hot-key mitigation when AQE's runtime skew
  splitting isn't available (e.g. the skew is in a broadcast-ineligible
  aggregation upstream). The big side's key is salted into ``salt``
  sub-keys; the small side is exploded ``salt``× so every sub-key finds
  its match. Results are identical to the unsalted join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed (optionally sorted) catalog table. Joins and
    aggregations on ``bucket_cols`` against tables with the same layout
    skip their shuffle; sorting additionally enables exchange-free
    sort-merge joins."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-layout bucketed tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with hot-key salting: big side gets a random-but-
    deterministic salt (hash of all its columns mod ``salt``), the small
    side is replicated ``salt``× so every (key, salt) partition pairs up.
    The hot key's rows now spread over ``salt`` reducers instead of one.
    """
    big_salted = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt)),
    )
    small_exploded = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_salted.join(small_exploded, [on, "__salt"], how)
    return out.drop("__salt")
