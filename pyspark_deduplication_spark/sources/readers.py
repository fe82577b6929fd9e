"""Sources — CSV / Parquet / JSON / directory-glob / catalog readers.

Covers SURVEY.md §2.1 (S1-S7):
- S1/S2/S3: CSV scans with header, optional declared schema or inference
  (reference ``soulutionOne.py:28``, ``solutionThree.py:8``, ``DAG/ETL.py:26``).
- S4: multi-file directory ingestion — the reference loops ``os.listdir``
  per file (``DAG/ingest_csv_file.py:16-21``); we hand the glob to Spark so
  listing, splitting and scheduling are one distributed job.
- S7: session-catalog table source (``DAG/ETL.py:35``).
- Required-column contract validation (``soulutionOne.py:34-38``) raised as
  a typed error instead of ``sys.exit(1)``.

At scale: always prefer a declared ``StructType`` for text formats
(inference = an extra full pass over 100 TB); Parquet carries its own
schema and supports predicate pushdown + column pruning natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class MissingColumnsError(ValueError):
    """Raised when a table is missing required columns (reference
    ``soulutionOne.py:34-38`` exits 1; we raise so callers can handle)."""

    def __init__(self, missing: list[str], present: list[str]):
        self.missing = missing
        self.present = present
        super().__init__(
            f"missing required columns {missing}; present: {present}"
        )


def validate_columns(df: DataFrame, required: list[str]) -> DataFrame:
    """Required-column contract check, case-insensitive like Spark's
    default resolution (SURVEY §1.3: the reference depends on
    ``spark.sql.caseSensitive=false``)."""
    present_lower = {c.lower() for c in df.columns}
    missing = [c for c in required if c.lower() not in present_lower]
    if missing:
        raise MissingColumnsError(missing, df.columns)
    return df


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    infer_schema: bool = False,
    required_columns: list[str] | None = None,
) -> DataFrame:
    """CSV scan (S1/S2/S3). With neither ``schema`` nor ``infer_schema``
    every column is StringType — the reference's default mode."""
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    elif infer_schema:
        reader = reader.option("inferSchema", "true")
    df = reader.csv(path)
    if required_columns:
        validate_columns(df, required_columns)
    return df


def read_csv_dir(
    spark: SparkSession,
    directory: str,
    schema: T.StructType | None = None,
    header: bool = True,
    infer_schema: bool = False,
) -> DataFrame:
    """Directory ingestion (S4) as ONE distributed scan over a glob —
    replaces the reference's driver-side per-file loop
    (``DAG/ingest_csv_file.py:16-21``)."""
    return read_csv(
        spark,
        f"{directory.rstrip('/')}/*.csv",
        schema=schema,
        header=header,
        infer_schema=infer_schema,
    )


def read_parquet(spark: SparkSession, path: str,
                 required_columns: list[str] | None = None) -> DataFrame:
    df = spark.read.parquet(path)
    if required_columns:
        validate_columns(df, required_columns)
    return df


def read_json(spark: SparkSession, path: str,
              schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_jsonl_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> tuple[DataFrame, DataFrame]:
    """JSONL ingestion with corrupt-record quarantine — the ingestion
    front door of a web-scale text pipeline, where some fraction of
    every crawl shard is malformed and a single bad line must never
    kill a 100 TB job (FAILFAST) or silently vanish (DROPMALFORMED).

    PERMISSIVE mode routes unparseable lines into ``_corrupt_record``;
    the return is ``(clean, quarantined)`` — clean rows with the target
    schema, quarantined raw lines for audit/replay. Both frames share
    one scan; the split is two filters Catalyst pushes to it, so at
    scale this costs a single pass. The schema is explicit and
    REQUIRED: schema inference reads the whole input once just to guess
    (doubling I/O), and one drifting shard would silently change the
    pipeline's types.
    """
    corrupt_col = "_corrupt_record"
    full = T.StructType(
        schema.fields + [T.StructField(corrupt_col, T.StringType())]
    )
    raw = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )
    # Spark requires caching/materializing before referencing the
    # corrupt column alone (SPARK-21610: a query selecting only
    # _corrupt_record is disallowed on the lazy scan).
    raw = raw.cache()
    clean = raw.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    quarantined = raw.filter(F.col(corrupt_col).isNotNull()).select(
        F.col(corrupt_col).alias("raw_line")
    )
    return clean, quarantined


def read_orc(spark: SparkSession, path: str,
             required_columns: list[str] | None = None) -> DataFrame:
    df = spark.read.orc(path)
    if required_columns:
        validate_columns(df, required_columns)
    return df


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """Session-catalog lookup (S7, reference ``DAG/ETL.py:35``)."""
    return spark.table(name)


def load_tables(spark: SparkSession, sf_dir: str,
                names: list[str] | None = None) -> dict[str, DataFrame]:
    """Load the benchmark star schema from a scale-factor directory and
    register each table as a temp view (SQL surface, SURVEY §2.10)."""
    names = names or [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    out: dict[str, DataFrame] = {}
    for name in names:
        df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def read_warc_dir(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc*",
    gzip_members: bool | str = "auto",
    max_header_bytes: int = 4096,
    recursive: bool = False,
) -> DataFrame:
    """Read a directory of on-disk WARC files — the CommonCrawl
    entry point (VERDICT r13 item 2: "the first thing a real user
    does is point the engine at a directory of actual ``.warc.gz``
    files"). Returns one row per WARC RECORD:

    ``warc_file string, headers string, payload binary``

    Built on Spark's ``binaryFile`` source (one whole file per row —
    distributed listing, locality-aware scheduling, ``pathGlobFilter``
    pushdown) feeding ``warc_records_sliced_binary``, the octet-exact
    Arrow cursor scan; ``gzip_members='auto'`` (default) sniffs the
    per-file gzip magic so one listing can mix ``.warc`` and
    ``.warc.gz``. The whole plan is scan → project → explode:
    map-only, zero shuffle, one task per file.

    At 100 TB: CommonCrawl ships ~1 GiB ``.warc.gz`` segments, and a
    gzip stream only inflates sequentially — one-task-per-file IS the
    parallelism grain (a 1000-executor cluster saturates on any
    crawl's tens of thousands of segments). ``binaryFile`` holds one
    file's bytes in memory per task; size executor memory for the
    largest segment, not for the corpus. Downstream repartition by
    record (post-explode) when per-record work dominates per-file
    inflation.
    """
    from pyspark_deduplication_spark.functions.text import (
        warc_records_sliced_binary,
    )

    reader = (spark.read.format("binaryFile")
              .option("pathGlobFilter", glob))
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    files = reader.load(path)
    rec = F.explode(warc_records_sliced_binary(
        F.col("content"), max_header_bytes=max_header_bytes,
        gzip_members=gzip_members)).alias("r")
    return (files.select(F.col("path").alias("warc_file"), rec)
            .select("warc_file", F.col("r.headers").alias("headers"),
                    F.col("r.payload").alias("payload")))


def read_wet_dir(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc.wet*",
    gzip_members: bool | str = "auto",
    recursive: bool = False,
) -> DataFrame:
    """Read a directory of WET files — CommonCrawl's
    pre-extracted-text sidecar (``*.warc.wet.gz``): ``read_warc_dir``
    narrowed to ``WARC-Type: conversion`` records with the payload
    decoded to text (charset-sniffing replace decode — WET is
    UTF-8-by-spec but real files carry strays). One row per document:

    ``warc_file string, uri string, crawl_ts timestamp, text string``

    The type filter runs BEFORE decode, so warcinfo/metadata records
    cost a header regex, never a payload decode. Same plan shape as
    ``read_warc_dir``: scan → project → explode → filter → project,
    map-only, zero shuffle, one task per file."""
    from pyspark_deduplication_spark.functions.text import (
        decode_web_text,
        warc_date_of,
        warc_header_of,
    )

    recs = read_warc_dir(spark, path, glob=glob,
                         gzip_members=gzip_members,
                         recursive=recursive)
    return (
        recs
        .filter(warc_header_of(F.col("headers"), "WARC-Type")
                == "conversion")
        .select(
            "warc_file",
            warc_header_of(F.col("headers"), "WARC-Target-URI")
            .alias("uri"),
            warc_date_of(F.col("headers")).alias("crawl_ts"),
            decode_web_text(F.col("payload")).alias("text"))
    )


def read_warc_dir_report(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc*",
    gzip_members: bool | str = "auto",
    max_header_bytes: int = 4096,
    recursive: bool = False,
) -> DataFrame:
    """Per-FILE loss accounting for a WARC directory — the sidecar
    report the no-silent-caps rule requires (VERDICT r14 item 3): a
    real crawl has corrupt segments, and ``read_warc_dir`` degrading
    gracefully must not mean the loss vanishes. One row per file:

    ``warc_file, n_records, corrupt_gzip_members,
    truncated_gzip_members, malformed_records, truncated_records,
    unparsed_octets, clean``

    ``clean = 1`` iff every loss counter is zero. Built on the same
    binaryFile scan and shared inflate/scan helpers as
    ``read_warc_dir`` (``warc_records_accounted_binary``), so the
    counts are exact for the records that reader yields. Map-only,
    zero shuffle, one task per file — run it alongside (or instead
    of a second pass over) the main read when auditing a crawl."""
    from pyspark_deduplication_spark.functions.text import (
        warc_records_accounted_binary,
    )

    reader = (spark.read.format("binaryFile")
              .option("pathGlobFilter", glob))
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    files = reader.load(path)
    acct = warc_records_accounted_binary(
        F.col("content"), max_header_bytes=max_header_bytes,
        gzip_members=gzip_members).alias("a")
    losses = ["corrupt_gzip_members", "truncated_gzip_members",
              "malformed_records", "truncated_records"]
    out = files.select(F.col("path").alias("warc_file"), acct).select(
        "warc_file",
        F.size("a.records").cast("long").alias("n_records"),
        *[F.col(f"a.{c}").alias(c) for c in losses],
        F.col("a.unparsed_octets").alias("unparsed_octets"),
    )
    no_loss = (F.col("unparsed_octets") == 0)
    for c in losses:
        no_loss = no_loss & (F.col(c) == 0)
    return out.withColumn("clean", no_loss.cast("int"))


def read_warc_cdx(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc*",
    max_header_bytes: int = 4096,
    recursive: bool = False,
) -> DataFrame:
    """Build a capture index (CDX) over a directory of WARC files —
    the random-access sidecar every archive consumer generates once
    so later fetches read ONE record's bytes instead of scanning
    segments: one row per capture with its byte extent in the
    on-disk file.

    ``warc_file string, file_size long, surt string, uri string,
    crawl_ts timestamp, digest string, offset long, length long``

    ``surt`` is the domain-reversed sort key (``surt_key``) so
    captures cluster domain-first; ``digest`` is hex md5 of the
    payload (CommonCrawl's CDX uses SHA1-base32 — documented
    deviation, same role: content identity without a fetch);
    ``offset``/``length`` follow ``warc_cdx_records_binary``'s layout
    contract — the compressed gzip member's extent for ``.warc.gz``
    (fetch = read, gunzip, scan), the record's own span for bare
    ``.warc``. ``file_size`` (from ``binaryFile``) lets a consumer
    assert tail coverage (last offset+length == file_size on a clean
    one-record-per-member archive).

    Same plan as ``read_warc_dir``: binaryFile scan with
    ``pathGlobFilter`` pushdown → project → explode; map-only, zero
    shuffle, one task per file. Sorting/partitioning the finished
    index by ``surt`` is the caller's write-side choice."""
    from pyspark_deduplication_spark.functions.text import (
        warc_cdx_records_binary,
        warc_date_of,
        warc_header_of,
    )
    from pyspark_deduplication_spark.functions.urls import surt_key

    reader = (spark.read.format("binaryFile")
              .option("pathGlobFilter", glob))
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    files = reader.load(path)
    rec = F.explode(warc_cdx_records_binary(
        F.col("content"), max_header_bytes=max_header_bytes)).alias("r")
    caps = files.select(F.col("path").alias("warc_file"),
                        F.col("length").alias("file_size"), rec)
    uri = warc_header_of(F.col("r.headers"), "WARC-Target-URI")
    return caps.select(
        "warc_file", "file_size",
        surt_key(uri).alias("surt"),
        uri.alias("uri"),
        warc_date_of(F.col("r.headers")).alias("crawl_ts"),
        F.col("r.digest").alias("digest"),
        F.col("r.offset").alias("offset"),
        F.col("r.length").alias("length"))


def read_wat_dir(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc.wat*",
    gzip_members: bool | str = "auto",
    recursive: bool = False,
) -> DataFrame:
    """Read a directory of WAT files — CommonCrawl's per-page METADATA
    sidecar (``*.warc.wat.gz``), completing the WARC/WET/WAT container
    family (VERDICT r14 item 4): ``read_warc_dir`` narrowed to
    ``WARC-Type: metadata`` records whose payload is the WAT JSON
    envelope. One row per page:

    ``warc_file string, uri string, crawl_ts timestamp, title string,
    outlinks array<string>,
    links array<struct<url:string,text:string>>,
    http_headers map<string,string>``

    ``title`` is ``Envelope.Payload-Metadata.HTTP-Response-Metadata.
    HTML-Metadata.Head.Title``; ``outlinks`` the ``url`` field of each
    ``HTML-Metadata.Links`` element (link graphs, PageRank-style
    quality priors, frontier seeding); ``http_headers`` the captured
    response headers (server/content-type analytics without touching
    the heavyweight WARC body). Unparseable or non-conforming JSON
    yields NULLs for the envelope columns — never an error
    (``from_json`` PERMISSIVE semantics). The type filter runs BEFORE
    the JSON parse, so response/warcinfo records cost a header regex
    only. Same plan as ``read_warc_dir``: scan → project → explode →
    filter → project, map-only, zero shuffle, one task per file."""
    from pyspark.sql import types as T

    from pyspark_deduplication_spark.functions.text import (
        decode_web_text,
        warc_date_of,
        warc_header_of,
    )

    link_t = T.StructType([
        T.StructField("path", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("text", T.StringType()),
    ])
    env_t = T.StructType([T.StructField("Envelope", T.StructType([
        T.StructField("Payload-Metadata", T.StructType([
            T.StructField("HTTP-Response-Metadata", T.StructType([
                T.StructField("Headers",
                              T.MapType(T.StringType(), T.StringType())),
                T.StructField("HTML-Metadata", T.StructType([
                    T.StructField("Head", T.StructType([
                        T.StructField("Title", T.StringType()),
                    ])),
                    T.StructField("Links", T.ArrayType(link_t)),
                ])),
            ])),
        ])),
    ]))])

    recs = read_warc_dir(spark, path, glob=glob,
                         gzip_members=gzip_members,
                         recursive=recursive)
    env = F.from_json(decode_web_text(F.col("payload")), env_t)
    return (
        recs
        .filter(warc_header_of(F.col("headers"), "WARC-Type")
                == "metadata")
        .select(
            "warc_file",
            warc_header_of(F.col("headers"), "WARC-Target-URI")
            .alias("uri"),
            warc_date_of(F.col("headers")).alias("crawl_ts"),
            env.alias("__env"))
        .select(
            "warc_file", "uri", "crawl_ts",
            F.col("__env")["Envelope"]["Payload-Metadata"][
                "HTTP-Response-Metadata"]["HTML-Metadata"]["Head"][
                "Title"].alias("title"),
            F.transform(
                F.col("__env")["Envelope"]["Payload-Metadata"][
                    "HTTP-Response-Metadata"]["HTML-Metadata"]["Links"],
                lambda x: x["url"]).alias("outlinks"),
            F.transform(
                F.col("__env")["Envelope"]["Payload-Metadata"][
                    "HTTP-Response-Metadata"]["HTML-Metadata"]["Links"],
                lambda x: F.struct(x["url"].alias("url"),
                                   x["text"].alias("text")))
            .alias("links"),
            F.col("__env")["Envelope"]["Payload-Metadata"][
                "HTTP-Response-Metadata"]["Headers"]
            .alias("http_headers"))
    )
