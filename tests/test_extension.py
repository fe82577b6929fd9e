"""Catalyst extension (SURVEY §4): the faithful UDF-theta similarity
join must plan as a blocked equi-join under the injected rule, keep the
UDF as the final verifier, honor the runtime kill-switch, and exhibit
exactly the documented prefix-blocking recall contract.

The extension must be on the driver classpath when the JVM starts, so
these checks run in a subprocess with its own SparkSession instead of
the shared test session.
"""

from __future__ import annotations

import json
import subprocess
import sys

import pytest

from pyspark_deduplication_spark.plans.extension import (
    ENABLED_KEY,
    extension_available,
)

_SCRIPT = r"""
import json, sys
sys.path.insert(0, ".")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark_deduplication_spark.plans.extension import (
    ENABLED_KEY, similarity_rewrite_confs)
from pyspark_deduplication_spark.functions.similarity import (
    ratcliff_similarity)

b = (SparkSession.builder.master("local[4]")
     .config("spark.sql.shuffle.partitions", "4")
     .config("spark.ui.enabled", "false"))
for k, v in similarity_rewrite_confs().items():
    b = b.config(k, v)
spark = b.getOrCreate()

rows = [(1, "alice smith"), (2, "alice smyth"),   # share prefix 'alic'
        (3, "bob jones"), (4, "bob jonez"),       # share prefix 'bob '
        (5, "xavier smith"), (6, "zavier smith"), # near-dup, prefixes differ
        (7, "carol unrelated")]
df = spark.createDataFrame(rows, "id long, name string")

def faithful():
    a, bb = df.alias("a"), df.alias("b")
    return a.join(bb, (F.col("a.id") < F.col("b.id"))
                  & (ratcliff_similarity(F.col("a.name"),
                                         F.col("b.name")) >= 80.0)) \
            .select(F.col("a.id").alias("ia"), F.col("b.id").alias("ib"))

out = faithful()
plan = out._jdf.queryExecution().executedPlan().toString()
pairs = sorted((r.ia, r.ib) for r in out.collect())

spark.conf.set(ENABLED_KEY, "false")
off = faithful()
plan_off = off._jdf.queryExecution().executedPlan().toString()
pairs_off = sorted((r.ia, r.ib) for r in off.collect())

print(json.dumps({
    "blocked": any(s in plan for s in
                   ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")),
    "cartesian": ("CartesianProduct" in plan
                  or "BroadcastNestedLoopJoin" in plan),
    "udf_verifies": "ArrowEvalPython" in plan,
    "pairs": pairs,
    "cartesian_off": ("CartesianProduct" in plan_off
                      or "BroadcastNestedLoopJoin" in plan_off),
    "pairs_off": pairs_off,
}))
spark.stop()
"""


@pytest.mark.skipif(not extension_available(),
                    reason="run tools/build_extension.sh first")
def test_similarity_rewrite_extension():
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT], capture_output=True, text=True,
        cwd=".", timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])

    # planned as a blocked equi-join, UDF still the final verifier
    assert result["blocked"], result
    assert not result["cartesian"], result
    assert result["udf_verifies"], result

    # recall contract: prefix-sharing near-dups found; the cross-prefix
    # pair (5,6) is the documented blocking loss
    assert result["pairs"] == [[1, 2], [3, 4]], result

    # runtime kill-switch restores the faithful Cartesian, which then
    # also finds the cross-prefix pair
    assert result["cartesian_off"], result
    assert result["pairs_off"] == [[1, 2], [3, 4], [5, 6]], result
