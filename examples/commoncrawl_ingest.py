"""End-to-end CommonCrawl ingestion example.

The recipe itself was promoted to a first-class, catalog-graded
package API in r15 — ``pyspark_deduplication_spark.crawl`` (see that
module's docstring for the full stage order: WARC read → digest dedup
→ HTTP framing → redirect harvesting → body/charset decode → noindex
drop → main-content extraction → canonical identity → keep-best
near-dup survivorship). This example keeps the original import path
working and shows the one-call usage:

    from commoncrawl_ingest import ingest_crawl_dir
    corpus = ingest_crawl_dir(spark, "/data/CC-MAIN-2024-10/warc",
                              redirect_hops=2, warn_on_loss=True)
    corpus.write.parquet("/data/curated")

``warn_on_loss=True`` audits every segment through
``read_warc_dir_report`` (corrupt/truncated gzip members, malformed
records, unparsed tails) and logs each unclean file — the
no-silent-caps contract for real crawls.
"""

from __future__ import annotations

from pyspark_deduplication_spark.crawl import (  # noqa: F401
    ingest_crawl_dir,
    redirect_edges,
    resolve_identity,
)
