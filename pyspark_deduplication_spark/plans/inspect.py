"""Physical-plan inspection helpers.

The project contract says "iterate until it's the plan you'd want, not
just the first one that passed". These helpers make plan properties
assertable in tests: is the filter pushed to the parquet scan, did the
small side broadcast, did a similarity join accidentally go Cartesian,
how wide are the codegen spans.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every parquet scan in the plan."""
    text = explain_str(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoop" in explain_str(df)


def has_cartesian_or_bnl(df: DataFrame) -> bool:
    """True if the plan contains an unkeyed join (CartesianProduct or
    BroadcastNestedLoopJoin) — expected for faithful-parity fuzzy joins
    and broadcast-cross KNN, a red flag anywhere else."""
    text = explain_str(df)
    return "CartesianProduct" in text or "BroadcastNestedLoopJoin" in text


def exchange_inputs(df: DataFrame) -> list[str]:
    """The Input column list of every Exchange node (formatted explain
    prints each node twice — tree and detail; this reads the detail
    block). Lets tests assert that wide columns (embeddings, shingle
    arrays) never ride a shuffle they don't need to."""
    text = explain_str(df)
    return re.findall(
        r"^\(\d+\) Exchange\s*\nInput \[\d+\]: \[([^\]]*)\]", text, re.M
    )


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees (fewer, wider spans = more of
    the plan fused into generated JVM code). Spark 4's simple/formatted
    explain no longer prints codegen stars; the ``codegen`` mode reports
    'Found N WholeStageCodegen subtrees.'"""
    text = explain_str(df, "codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", text)
    return int(m.group(1)) if m else 0
