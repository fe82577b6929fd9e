"""Bucketed co-located joins (no exchange) and salted skew joins."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from pyspark_deduplication_spark.operators.partitioning import (
    bucketed_join,
    salted_join,
    write_bucketed,
)
from pyspark_deduplication_spark.plans.inspect import explain_str


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    write_bucketed(li.select("l_orderkey", "l_quantity"), "li_b",
                   ["l_orderkey"], 4, sort_cols=["l_orderkey"])
    write_bucketed(orders.select(F.col("o_orderkey").alias("l_orderkey"),
                                 "o_totalprice"),
                   "ord_b", ["l_orderkey"], 4, sort_cols=["l_orderkey"])
    joined = bucketed_join(spark, "li_b", "ord_b", ["l_orderkey"])
    plan = explain_str(joined)
    # co-located layout: the join runs without any shuffle exchange
    assert not re.search(r"^\(\d+\) Exchange", plan, re.M), plan
    # and the result matches the plain join
    plain = li.select("l_orderkey", "l_quantity").join(
        orders.select(F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"),
        ["l_orderkey"])
    assert joined.count() == plain.count()


def test_salted_join_matches_unsalted(spark):
    # heavily skewed big side: 90% of rows share one key
    big = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id"))
        .alias("k"), F.col("id").alias("payload"))
    small = spark.createDataFrame(
        [(1, "hot"), (5, "cold"), (17, "cold")], "k long, label string")
    plain = salted_join(big, small, "k", salt=8)
    expected = big.join(small, "k")
    assert plain.count() == expected.count()
    a = sorted((r.k, r.payload, r.label) for r in plain.collect())
    b = sorted((r.k, r.payload, r.label) for r in expected.collect())
    assert a == b


def test_salted_join_spreads_hot_key(spark):
    big = spark.range(0, 1000).select(F.lit(1).alias("k"),
                                      F.col("id").alias("payload"))
    small = spark.createDataFrame([(1, "x")], "k long, label string")
    salted = salted_join(big, small, "k", salt=8)
    # the pre-drop plan distributes on (k, __salt): verify the salt column
    # takes >1 value for the single hot key
    n_salts = (
        big.withColumn("__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                                        F.lit(8)))
        .select("__salt").distinct().count()
    )
    assert n_salts > 1
    assert salted.count() == 1000
