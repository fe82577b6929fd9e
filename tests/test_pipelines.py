"""ETL pipeline parity: extract → transform → load end-to-end."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from pyspark_deduplication_spark.pipelines import extract, load, run_pipeline, transform
from pyspark_deduplication_spark.sources.writers import write_csv


def _input_csv(spark, tmp_path) -> str:
    rows = [(1, "acme", "DE1"), (2, "acme", "DE1"), (3, "zeta", "FR2")]
    df = spark.createDataFrame(rows, "ID int, Name string, IBAN string")
    path = str(tmp_path / "src")
    write_csv(df, path)
    return path


def test_extract_registers_view(spark, tmp_path):
    path = _input_csv(spark, tmp_path)
    df = extract(spark, path)
    assert spark.table("extracted_data").count() == df.count() == 3
    # inferSchema on: ID came back integral, not string
    assert dict(df.dtypes)["ID"] in ("int", "bigint")


def test_transform_dedup_case_insensitive_keys(spark, tmp_path):
    path = _input_csv(spark, tmp_path)
    extract(spark, path)
    # reference dedups on ['Name','IBAN'] against lowercase headers —
    # case-insensitive resolution must hold (SURVEY §1.3)
    out, _ = transform(spark, dedup_keys=["name", "iban"], id_col="id")
    rows = out.collect()
    assert len(rows) == 2
    assert len({r.id for r in rows}) == 2  # surrogate ids unique


def test_full_pipeline_to_csv(spark, tmp_path):
    path = _input_csv(spark, tmp_path)
    out_csv = str(tmp_path / "out")
    result = run_pipeline(spark, path, out_csv, dedup_keys=["Name", "IBAN"])
    assert result.count() == 2
    assert len(glob.glob(f"{out_csv}/part-*")) == 1  # single-file sink


def test_transform_materializes_parquet_handoff(spark, tmp_path):
    path = _input_csv(spark, tmp_path)
    df = extract(spark, path)
    out_dir = str(tmp_path / "stage")
    _, handoff = transform(spark, df=df, dedup_keys=["Name"],
                           output_path=out_dir)
    assert handoff == out_dir
    assert spark.read.parquet(handoff).count() == 2
    load(spark, transformed_path=handoff, csv_path=str(tmp_path / "final"))
    assert glob.glob(f"{tmp_path}/final/part-*")
