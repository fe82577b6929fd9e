"""ETL pipeline parity (SURVEY.md §2.11, reference ``DAG/ETL.py`` /
``DAG/sample.py``).

The reference wraps extract → transform → load in Airflow PythonOperators,
passing file paths through XCom and a temp view across task processes (a
documented defect: the view dies with the session, ``DAG/ETL.py:29-35``).
Our engine exposes the same three stages as plain functions over one
SparkSession — directly usable as Airflow callables, but passing
DataFrames/paths explicitly so the pipeline also runs without an
orchestrator. Parquet replaces CSV as the inter-stage format (typed,
splittable, prunable); CSV stays available at the edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pyspark_deduplication_spark.operators.dedup import dedup_exact, with_surrogate_id
from pyspark_deduplication_spark.sources.readers import read_csv
from pyspark_deduplication_spark.sources.writers import write_csv, write_jdbc, write_parquet


def extract(
    spark: SparkSession,
    input_path: str,
    view_name: str = "extracted_data",
    infer_schema: bool = True,
) -> DataFrame:
    """≙ ``DAG/ETL.py:21-29``: scan CSV, register a temp view for the SQL
    surface. Returns the DataFrame so callers need not rely on session
    state (the reference's cross-process defect)."""
    df = read_csv(spark, input_path, infer_schema=infer_schema)
    df.createOrReplaceTempView(view_name)
    return df


def transform(
    spark: SparkSession,
    df: DataFrame | None = None,
    view_name: str = "extracted_data",
    dedup_keys: list[str] | None = None,
    output_path: str | None = None,
    id_col: str = "ID",
) -> tuple[DataFrame, str | None]:
    """≙ ``DAG/ETL.py:32-61``: SQL passthrough → dedup on keys → surrogate
    id → optional materialization. Returns (frame, path) — the path plays
    the XCom role when stages run as separate orchestrator tasks."""
    if df is None:
        df = spark.sql(f"SELECT * FROM {view_name}")
    deduped = dedup_exact(df, dedup_keys)
    keyed = with_surrogate_id(deduped, id_col)
    if output_path:
        write_parquet(keyed, output_path)
        return keyed, output_path
    return keyed, None


def load(
    spark: SparkSession,
    transformed_path: str | None = None,
    df: DataFrame | None = None,
    jdbc_url: str | None = None,
    table: str = "tbltest",
    overwrite: bool = False,
    csv_path: str | None = None,
) -> None:
    """≙ ``DAG/ETL.py:64-106`` (append) / ``DAG/sample.py:50-87``
    (truncate + bulk load): executor-parallel JDBC write — never a
    driver-side row loop. With no JDBC url, lands CSV (the reference's
    other sink)."""
    if df is None:
        if transformed_path is None:
            raise ValueError("need df or transformed_path")
        df = spark.read.parquet(transformed_path)
    if jdbc_url:
        if overwrite:
            write_jdbc(df, jdbc_url, table, mode="overwrite", truncate=True)
        else:
            write_jdbc(df, jdbc_url, table, mode="append")
    elif csv_path:
        write_csv(df, csv_path, single_file=True)
    else:
        raise ValueError("need jdbc_url or csv_path")


def run_pipeline(
    spark: SparkSession,
    input_path: str,
    output_csv: str,
    dedup_keys: list[str] | None = None,
) -> DataFrame:
    """The whole ETL in one session — extract → transform → load."""
    df = extract(spark, input_path)
    transformed, _ = transform(spark, df=df, dedup_keys=dedup_keys)
    load(spark, df=transformed, csv_path=output_csv)
    return transformed
