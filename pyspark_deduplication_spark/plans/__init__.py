from pyspark_deduplication_spark.plans.inspect import (  # noqa: F401
    explain_str,
    has_broadcast_join,
    has_cartesian_or_bnl,
    pushed_filters,
    wholestage_codegen_spans,
)
