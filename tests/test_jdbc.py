"""JDBC sink integration tests (SURVEY §2 K3/K4).

The container has no external database, but Spark bundles the embedded
Derby engine (its Hive-metastore dependency) whose JDBC driver works
in-process — in local mode the executors share the driver JVM, so
Derby's single-JVM embedded restriction holds and ``write_jdbc``
executes a REAL jdbc write path (batching, executor-side inserts),
not just plan construction. Reference parity: ``DAG/ETL.py:79-106``
(row-wise MySQL insert) and ``DAG/sample.py:71-87`` (truncate+load).
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from pyspark_deduplication_spark.sources.writers import write_jdbc

_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


@pytest.fixture()
def derby_url(tmp_path):
    db = tmp_path / "derbydb"
    yield f"jdbc:derby:{db};create=true"
    shutil.rmtree(db, ignore_errors=True)


def _read_back(spark, url, table):
    return (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", _DRIVER)
        .load()
    )


def test_jdbc_append_roundtrip(spark, derby_url):
    df = spark.range(250).select(
        "id", (F.col("id") % 7).cast("double").alias("v"))
    write_jdbc(df, derby_url, "t_append", mode="append",
               properties={"driver": _DRIVER})
    back = _read_back(spark, derby_url, "t_append")
    assert back.count() == 250
    assert back.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]
    # append again — K3 semantics: rows accumulate
    write_jdbc(df, derby_url, "t_append", mode="append",
               properties={"driver": _DRIVER})
    assert _read_back(spark, derby_url, "t_append").count() == 500


def test_jdbc_overwrite_truncate(spark, derby_url):
    df1 = spark.range(100).select("id")
    write_jdbc(df1, derby_url, "t_trunc", mode="append",
               properties={"driver": _DRIVER})
    df2 = spark.range(40).select("id")
    # K4 semantics: truncate + load replaces contents, keeps the table
    write_jdbc(df2, derby_url, "t_trunc", mode="overwrite", truncate=True,
               properties={"driver": _DRIVER})
    assert _read_back(spark, derby_url, "t_trunc").count() == 40
