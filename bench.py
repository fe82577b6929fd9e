"""Benchmark runner: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock of one timed pass over the headline set
(each query executed to completion via a count-collecting action, results
not shipped to the driver). Use BENCH_QUERIES=name1,name2 to subset and
BENCH_RUNS=n for median-of-n (default 1 — the driver wants speed).

BENCH_WARM=1 (default) runs one UNTIMED pass over the whole headline set
first: BASELINE.md's per-query rows are warm BENCH_RUNS=3 medians, so a
cold-JIT first query (codegen + window/trainer paths compiling on its
clock) reads as a 2-3× regression that isn't one — VERDICT r6's only >2×
row was exactly this measurement artifact. BENCH_WARM=0 restores the
single-q1 warm for quick iteration.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("BENCH_RUNS", "1"))

    from pyspark_deduplication_spark.queries import CATALOG
    from pyspark_deduplication_spark.session import get_spark

    spark = get_spark("bench")

    names = [n for n, q in CATALOG.items() if q.bench]
    subset = os.environ.get("BENCH_QUERIES")
    if subset:
        names = [n for n in subset.split(",") if n in CATALOG]

    # Warm pass: JVM JIT, whole-stage-codegen compilation, parquet footer
    # caches. Default = one untimed run of EVERY headline query, matching
    # the warm-median conditions BASELINE.md's rows were recorded under;
    # BENCH_WARM=0 falls back to warming only q1 (fast iteration).
    warm_names = (
        names if os.environ.get("BENCH_WARM", "1") != "0"
        else ["q1_pricing_summary"]
    )
    for name in warm_names:
        try:
            CATALOG[name].fn(spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
        except Exception:
            pass

    def _clean() -> None:
        # Spark's ContextCleaner reclaims unreferenced checkpoint /
        # broadcast / shuffle blocks only when the JVM garbage-collects
        # — with a real driver heap (8g since r9) GC can go quiet for
        # the whole set, so blocks from 20 earlier queries congest the
        # late rows (doc_dup_span_fraction read 2-3x its solo-warm
        # median purely from position). One explicit GC between
        # queries, OUTSIDE the timed window, starts every row from the
        # cleaned state its baseline was recorded under.
        import gc

        gc.collect()  # drop py4j refs first so the JVM GC can reap them
        spark.sparkContext._jvm.System.gc()

    per_query: dict[str, float] = {}
    for name in names:
        q = CATALOG[name]
        samples = []
        for _ in range(runs):
            _clean()
            t0 = time.perf_counter()
            # noop sink executes the full plan without driver collection
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        per_query[name] = round(statistics.median(samples), 3)

    total = round(sum(per_query.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_queries_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
