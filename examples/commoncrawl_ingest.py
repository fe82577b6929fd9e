"""End-to-end CommonCrawl ingestion recipe — the r14 web-ingest
surface composed the way a production run wires it. Point
``ingest_crawl_dir`` at a directory of real ``.warc.gz`` segments and
it returns a curated, deduplicated article corpus DataFrame:

1.  ``read_warc_dir`` — binaryFile source, one task per segment,
    auto gzip sniff (mixes ``.warc`` and ``.warc.gz``);
2.  keep ``WARC-Type: response`` records only (WET/WAT sidecars and
    request/metadata records drop here — see ``wet_text_ingest_docs``
    for the conversion-record path);
3.  EXACT dedup on ``WARC-Payload-Digest`` BEFORE any payload work —
    the cheapest pass there is (header-projection shuffle, payload
    bytes untouched);
4.  ``http_split_message`` — the payload is a full HTTP message;
    split status/headers/body on bytes; keep 200s;
5.  ``http_decode_body`` — chunked reassembly, then
    Content-Encoding gunzip/inflate (RFC 9112 order);
6.  ``decode_web_text`` — charset from Content-Type, else
    ``<meta charset>`` sniff, else UTF-8; always replace-decode,
    never a crash;
7.  ``has_noindex`` — the polite-crawl robots drop;
8.  ``extract_main_content`` — link-density boilerplate removal;
9.  crawl identity: ``canonicalize_url(strip_tracking=True)`` of the
    target URI (utm/fbclid re-crawls collapse), xxhash64 to a LONG id;
10. quality scoring + near-dup dedup (MinHash-LSH through connected
    components) with keep-best-quality survivorship.

Every stage is map-only except the three keyed exchanges a 100 TB run
genuinely needs (digest dedup, canonical-URL collapse, near-dup
banding). The streaming twin of this recipe is
``streaming/ops.py::streaming_web_ingest(binary_blobs=True,
gzip_members=True, http_messages=True, canonical_ids=True)``.

Runs at fixture scale in the test suite (a pytest writes real
``.warc.gz`` files and drives this exact function); at crawl scale
only the input path changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T  # noqa: F401  (schema hooks)

from pyspark_deduplication_spark.functions.text import (
    HTTP_OK_RE,
    decode_web_text,
    extract_main_content,
    has_noindex,
    http_decode_body,
    http_header_of,
    http_split_message,
    quality_features,
    warc_header_of,
)
from pyspark_deduplication_spark.functions.urls import canonicalize_url
from pyspark_deduplication_spark.sources.readers import read_warc_dir


def ingest_crawl_dir(
    spark: SparkSession,
    crawl_dir: str,
    glob: str = "*.warc*",
    jaccard_threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    min_quality: float | None = None,
) -> DataFrame:
    """Directory of WARC segments → curated article corpus
    (``doc_id, uri, text, quality``); see module docstring for the
    stage order. ``min_quality`` optionally drops low-quality docs
    AFTER survivorship (the keep-best winner is the one scored)."""
    records = read_warc_dir(spark, crawl_dir, glob=glob)

    responses = (
        records
        .select(
            warc_header_of(F.col("headers"), "WARC-Type")
            .alias("__type"),
            warc_header_of(F.col("headers"), "WARC-Target-URI")
            .alias("uri"),
            warc_header_of(F.col("headers"), "WARC-Payload-Digest")
            .alias("__digest"),
            "payload")
        .filter(F.col("__type") == "response")
        .filter(F.col("uri") != "")
    )

    # exact dedup on the digest header, payload bytes untouched; a
    # record without a digest is its own group (row_number over uri
    # keeps replays deterministic)
    from pyspark.sql import Window

    digest_key = F.when(F.col("__digest") != "", F.col("__digest")) \
        .otherwise(F.concat(F.lit("nodigest:"), F.col("uri")))
    unique = (
        responses.withColumn("__dk", digest_key)
        .withColumn("__rk", F.row_number().over(
            Window.partitionBy("__dk").orderBy("uri")))
        .filter(F.col("__rk") == 1)
        .drop("__dk", "__rk", "__digest")
    )

    framed = unique.select(
        "uri", http_split_message(F.col("payload")).alias("m"))
    ok = framed.filter(
        (F.col("m.status_line") == "")  # non-HTTP payload: keep as-is
        # shared 2xx policy (ADVICE r14 low): same constant as the
        # streaming twin's require_http_ok gate, so both spellings
        # keep identical record sets
        | F.col("m.status_line").rlike(HTTP_OK_RE))
    page = decode_web_text(
        http_decode_body(F.col("m.body"), F.col("m.headers")),
        http_header_of(F.col("m.headers"), "Content-Type"))

    docs = (
        ok.select("uri", page.alias("__page"))
        .filter(~has_noindex(F.col("__page")))
        .select(
            F.xxhash64(F.coalesce(
                canonicalize_url(F.col("uri"), strip_tracking=True),
                F.col("uri"))).alias("doc_id"),
            "uri",
            extract_main_content(F.col("__page")).alias("text"))
        # canonical-URL collapse: campaign-link twins of one page
        .withColumn("__rk", F.row_number().over(
            Window.partitionBy("doc_id").orderBy("uri")))
        .filter(F.col("__rk") == 1).drop("__rk")
        .withColumn("quality",
                    quality_features(F.col("text"))["quality_score"])
    )

    # near-dup survivorship: banded MinHash candidates (the 100 TB
    # spelling — skew-capped, never all-pairs) → connected components
    # → keep the best-quality member per cluster (RefinedWeb/FineWeb
    # convention; ties break to min doc_id for determinism)
    from pyspark_deduplication_spark.operators.dedup import (
        minhash_candidate_pairs,
    )
    from pyspark_deduplication_spark.operators.linkage import (
        transitive_clusters,
    )

    pairs = (minhash_candidate_pairs(
        docs, "text", "doc_id", num_hashes=num_hashes, bands=bands,
        max_bucket_size=4096)
        .filter(F.col("jaccard_sim") >= jaccard_threshold)
        .select("id_a", "id_b"))
    clustered = transitive_clusters(
        docs.select("doc_id"), pairs, "doc_id")
    w = Window.partitionBy("component")
    curated = (
        docs.join(clustered, "doc_id")
        .withColumn("__rn", F.row_number().over(
            w.orderBy(F.col("quality").desc(), F.col("doc_id").asc())))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "uri", "text", "quality")
    )
    if min_quality is not None:
        curated = curated.filter(F.col("quality") >= min_quality)
    return curated
