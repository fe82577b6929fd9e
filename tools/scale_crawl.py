"""sf1 scaling row for the INCREMENTAL crawl path (VERDICT r14 item
8): synthesize two disjoint crawls from a fixture's documents table
(even doc_ids → crawl 1, odd → crawl 2), ingest crawl 1 to seed the
persisted corpus, then TIME ``ingest_crawl_incremental`` of crawl 2 —
the steady-state cost a monthly CommonCrawl consumer pays. Run at the
base and the replicated fixture and report the exponent
(ln(t_scaled/t_base)/ln(factor)); sub-linear/linear means the
incremental cost tracks the NEW crawl, not the corpus history.

Usage:
    python tools/scale_crawl.py BASE_DIR SCALED_DIR FACTOR
    SCALE_RUNS=n   best-of-n timing per fixture (default 2)

Crawl synthesis mirrors ``crawl_recipe_ingest_docs``' distributed
writer: per-source ``.warc.gz`` segments, one gzip member per record,
full HTTP messages, the proven extraction chrome.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = "/tmp/scale_crawl"


def _stage_crawls(spark, sf_dir: str, tag: str) -> tuple[str, str]:
    """Write crawl1 (even doc_ids) and crawl2 (odd) for a fixture."""
    import shutil

    from pyspark.sql import functions as F

    from pyspark_deduplication_spark.queries import (
        _crawl_page,
        _http_msg,
        _t,
        _warc_response_bytes,
        _write_blob,
    )

    dirs = (f"{WORK}/{tag}/crawl1", f"{WORK}/{tag}/crawl2")
    for d in dirs:
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)
    docs = _t(spark, sf_dir, "documents")
    uri = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".ex.com/d"), F.col("doc_id").cast("string"))
    msg = _http_msg(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html; "
              "charset=utf-8"),
        F.encode(_crawl_page(F.col("text")), "UTF-8"))
    rec = _warc_response_bytes(uri, msg)
    for half, base in ((0, dirs[0]), (1, dirs[1])):
        per_src = (
            docs.filter(F.col("doc_id") % 2 == half)
            .select("source",
                    F.struct("doc_id", rec.alias("r")).alias("s"))
            .groupBy("source")
            .agg(F.transform(F.array_sort(F.collect_list("s")),
                             lambda x: x["r"]).alias("recs"))
        )

        def _write(rows, base=base):
            import gzip

            for r in rows:
                data = b"".join(gzip.compress(bytes(x))
                                for x in r["recs"])
                _write_blob(base, f"{r['source']}.warc.gz", data)

        per_src.foreachPartition(_write)
    return dirs


def main() -> None:
    import shutil

    if len(sys.argv) < 4:
        sys.exit("usage: scale_crawl.py BASE_DIR SCALED_DIR FACTOR")
    base_dir, scaled_dir, factor = (
        sys.argv[1], sys.argv[2], int(sys.argv[3]))
    runs = int(os.environ.get("SCALE_RUNS", "2"))

    from pyspark_deduplication_spark.crawl import (
        ingest_crawl_incremental,
    )
    from pyspark_deduplication_spark.session import get_spark

    spark = get_spark("scale_crawl")
    times = {}
    for tag, d in (("base", base_dir), ("scaled", scaled_dir)):
        c1, c2 = _stage_crawls(spark, d, tag)
        best = float("inf")
        for _ in range(runs):
            corpus = f"{WORK}/{tag}/corpus"
            for suffix in ("", "_sigs", "_centroids", "_index"):
                shutil.rmtree(corpus + suffix, ignore_errors=True)
            # seed epoch 0 (untimed — the one-shot cost is the
            # recipe's own scale row); TIME the incremental epoch
            ingest_crawl_incremental(spark, c1, corpus)
            t0 = time.time()
            out = ingest_crawl_incremental(spark, c2, corpus)
            out.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        times[tag] = best
        print(json.dumps({"fixture": tag, "sec": round(best, 2)}),
              flush=True)
    exp = (math.log(times["scaled"] / times["base"])
           / math.log(factor))
    print(json.dumps({
        "query": "ingest_crawl_incremental",
        "base_sec": round(times["base"], 2),
        "scaled_sec": round(times["scaled"], 2),
        "ratio": round(times["scaled"] / times["base"], 2),
        "exponent": round(exp, 2),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
