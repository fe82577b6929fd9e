from pyspark_deduplication_spark.sources.readers import (  # noqa: F401
    load_tables,
    read_csv,
    read_csv_dir,
    read_json,
    read_parquet,
    read_table,
    validate_columns,
)
from pyspark_deduplication_spark.sources.writers import (  # noqa: F401
    compact_small_files,
    consolidate_epochs,
    write_csv,
    write_jdbc,
    write_parquet,
)
