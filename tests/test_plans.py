"""Plan-shape assertions: pushdown, broadcast, no accidental cross
products — 'the plan you'd want, not the first one that passed'."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_deduplication_spark.plans.inspect import (
    explain_str,
    has_cartesian_or_bnl,
    pushed_filters,
    wholestage_codegen_spans,
)


def test_filter_pushes_to_parquet_scan(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.filter(F.col("l_suppkey") <= 3).select("l_orderkey", "l_quantity")
    filters = pushed_filters(q)
    assert any("l_suppkey" in f for f in filters), filters


def test_column_pruning_reaches_scan(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    q = li.select("l_orderkey").distinct()
    plan = explain_str(q)
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "l_quantity" not in read_schema[0]
    assert "l_orderkey" in read_schema[0]


def test_q5_joins_are_broadcast(spark):
    from pyspark_deduplication_spark.queries import q5_nation_revenue

    plan = explain_str(q5_nation_revenue(spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in plan
    # the fact table must not be exchanged for the joins themselves:
    # allow only the final aggregation exchange + broadcast exchanges
    assert "SortMergeJoin" not in plan


def test_blocked_similarity_join_is_hash_join(spark, sf_dir):
    from pyspark.sql import functions as F

    from pyspark_deduplication_spark.operators.linkage import blocked_similarity_join

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    names = part.groupBy("p_name").agg(F.min("p_partkey").alias("id"))
    pairs = blocked_similarity_join(
        names.select("id", F.col("p_name").alias("txt")),
        id_col="id", text_col="txt",
    )
    assert not has_cartesian_or_bnl(pairs)


def test_faithful_join_is_flagged_cartesian(spark):
    """The parity-mode UDF join SHOULD show up as a nested-loop — the test
    documents that this is the O(n²) path the blocked join replaces."""
    from pyspark_deduplication_spark.operators.linkage import similarity_join_faithful

    df = spark.createDataFrame([(1, "a", "x"), (2, "b", "y")],
                               "id long, name string, iban string")
    assert has_cartesian_or_bnl(similarity_join_faithful(df))


def test_q1_single_shuffle_wide_codegen(spark):
    from pyspark_deduplication_spark.queries import q1_pricing_summary

    import re

    df = q1_pricing_summary(spark, "/root/testdata/sf0.001")
    plan = explain_str(df)
    # exactly one exchange node (the group-by), map-side partial aggregation
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1
    assert "partial_sum" in plan
    # under AQE the codegen annotation only appears in the finalized plan
    # of an executed query — collect() finalizes THIS df's queryExecution
    df.collect()
    assert wholestage_codegen_spans(df) >= 1 or "WholeStageCodegen" in explain_str(df)


def test_minhash_signatures_no_shuffle(spark, sf_dir):
    from pyspark_deduplication_spark.operators.dedup import minhash_signatures

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = explain_str(minhash_signatures(docs))
    assert "Exchange" not in plan  # signature stage must be map-only
