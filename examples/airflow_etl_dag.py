"""Example Airflow DAG wrapping the engine's ETL stages
(``pipelines.py:23-96``) — reference parity for ``DAG/ETL.py:110-128``,
which wires extract → transform → load as PythonOperators passing a
file path through XCom.

Design differences from the reference, on purpose:

- Each task builds (or reuses) its OWN SparkSession via
  ``session.get_spark()`` and passes a **parquet path** — not a temp
  view — to the next task. The reference registers a temp view in
  ``extract`` and reads it in ``transform`` (``DAG/ETL.py:29-35``),
  which only works when Airflow happens to run both tasks in one
  process; a view dies with its session. Paths survive any executor.
- Retries/scheduling stay in the operator kwargs (the orchestrator's
  concern — SURVEY §2.11 O3); the engine callables are retry-agnostic
  and idempotent (overwrite-mode writes).

This module is importable WITHOUT Airflow installed: the engine
callables are always defined, and the DAG object is only built when
``airflow`` is importable (so a scheduler picks it up unchanged, while
the repo's pytest pins the task logic itself).
"""

from __future__ import annotations

import os
import tempfile

from pyspark_deduplication_spark.pipelines import extract, load, transform
from pyspark_deduplication_spark.session import get_spark

DATA_DIR = os.environ.get("ETL_DATA_DIR", tempfile.gettempdir())
INPUT_CSV = os.environ.get("ETL_INPUT_CSV",
                           os.path.join(DATA_DIR, "incoming", "*.csv"))
STAGED_PARQUET = os.path.join(DATA_DIR, "staged_parquet")
TRANSFORMED_PARQUET = os.path.join(DATA_DIR, "transformed_parquet")
OUTPUT_CSV = os.path.join(DATA_DIR, "final_output.csv")
DEDUP_KEYS = ["fname", "lname", "address"]


def extract_task(input_path: str = INPUT_CSV,
                 staged_path: str = STAGED_PARQUET) -> str:
    """≙ ``DAG/ETL.py`` task 1: scan CSV, stage as parquet. Returns the
    staged path — the XCom value the next task consumes."""
    spark = get_spark()
    df = extract(spark, input_path)
    df.write.mode("overwrite").parquet(staged_path)
    return staged_path


def transform_task(staged_path: str = STAGED_PARQUET,
                   out_path: str = TRANSFORMED_PARQUET) -> str:
    """≙ task 2: dedup on keys + surrogate id, materialized to parquet.
    Returns the transformed path (XCom)."""
    spark = get_spark()
    df = spark.read.parquet(staged_path)
    _, path = transform(spark, df=df, dedup_keys=DEDUP_KEYS,
                        output_path=out_path)
    return path


def load_task(transformed_path: str = TRANSFORMED_PARQUET,
              jdbc_url: str | None = os.environ.get("ETL_JDBC_URL"),
              csv_path: str = OUTPUT_CSV) -> None:
    """≙ task 3: executor-parallel JDBC append when ``ETL_JDBC_URL`` is
    set (``DAG/sample.py``'s truncate+load maps to ``overwrite=True``),
    else a single-file CSV landing."""
    spark = get_spark()
    if jdbc_url:
        load(spark, transformed_path=transformed_path, jdbc_url=jdbc_url)
    else:
        load(spark, transformed_path=transformed_path, csv_path=csv_path)


try:  # pragma: no cover - exercised only under a real scheduler
    from datetime import datetime, timedelta

    from airflow import DAG
    from airflow.operators.python import PythonOperator
except ImportError:  # Airflow absent (this container): callables only
    DAG = None
else:
    with DAG(
        dag_id="pyspark_dedup_etl",
        description="CSV → dedup + surrogate ids → JDBC/CSV",
        start_date=datetime(2026, 1, 1),
        schedule="@daily",
        catchup=False,
        default_args={"retries": 2,
                      "retry_delay": timedelta(minutes=5)},
    ) as dag:
        t_extract = PythonOperator(
            task_id="extract", python_callable=extract_task)
        t_transform = PythonOperator(
            task_id="transform", python_callable=transform_task,
            op_args=["{{ ti.xcom_pull(task_ids='extract') }}"])
        t_load = PythonOperator(
            task_id="load", python_callable=load_task,
            op_args=["{{ ti.xcom_pull(task_ids='transform') }}"])
        t_extract >> t_transform >> t_load
