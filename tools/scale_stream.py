"""sf1 streaming-ingest scaling checkpoint (VERDICT r9 item 3): drive
``streaming_fused_ingest`` END-TO-END — file-source micro-batches →
three-signal probe → epoch-partitioned artifacts — over the base and
``factor``×-scaled fixtures, and report wall-clock plus the scaling
exponent ``ln(t_scaled/t_base)/ln(factor)``.

The semantic leg's ``n_cells`` knob grows with the factor at the scaled
fixture (the ``@scaled`` convention of ``tools/scale_check.py`` —
constant expected cell size, i.e. how a 100 TB deployment configures
it), and shuffle partitions track input bytes via
``session.shuffle_partitions_for_bytes``.

After each timed run the MinHash signature index is DELETED and one
extra batch ingested — the heal-before-trust contract
(``streaming/ops.py::_sig_indexed_dedup_ingest`` family) must rebuild
index coverage for every standing corpus epoch, exercising
epoch-coverage healing at 10× the only sizes pytest drives. The script
asserts indexed epochs == corpus epochs afterward.

Modes (env):
    KEEP_BEST=1   — quality-aware survivorship (insert/drop/replace)
    WEB_INGEST=1  — the streaming web capstone end-to-end (VERDICT r12
                    item 5): documents synthesize into per-source WARC
                    blobs (the web_ingest_pipeline_docs page template),
                    and ``streaming_web_ingest`` runs Content-Length
                    parse → main-content extraction → quality scoring →
                    quality-aware fused ingest per micro-batch. The
                    heal assertion applies unchanged (identity is
                    xxhash64 of the target URI).
    WARC_FILES=1  — WEB_INGEST, but the stream consumes REAL on-disk
                    ``.warc.gz`` FILES (VERDICT r13 item 2): the prep
                    writes one multi-member gzip file per (source,
                    batch) — the CommonCrawl layout — and the query
                    reads them through the ``binaryFile`` streaming
                    source (maxFilesPerTrigger = #sources, so one
                    trigger still ingests one batch-worth), inflating
                    and octet-slicing inside the micro-batch. The
                    heal extra-batch is a copied ``.warc.gz`` file.
    HTTP_MESSAGES=1 — (WARC_FILES only) each record's payload is a
                    FULL HTTP message (status + headers + body) and
                    the stream frames it off per micro-batch
                    (``streaming_web_ingest(http_messages=True)``) —
                    the genuine CommonCrawl byte path end-to-end.

After the heal run, ``compact_corpus_epochs(keep_last=2)`` executes in
every mode and the row reports partition counts before/after plus a
row-count identity check — the bounded-file-count evidence for
long-lived streams (VERDICT r12 advisory 2).

Usage:
    python tools/scale_stream.py [BASE_DIR] [SCALED_DIR] [FACTOR] [N_BATCHES]
    SPARK_GRAFT_DRIVER_MEM=48g recommended for the sf1 leg.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORK = "/tmp/scale_stream"


def _prep_sources(spark, sf_dir: str, tag: str, n_batches: int,
                  with_quality: bool = False) -> str:
    """Join documents+embeddings and split into n_batches parquet files
    (one micro-batch each under maxFilesPerTrigger=1). ``with_quality``
    adds a deterministic per-doc quality score (KEEP_BEST=1 mode) —
    replicated near-dups then carry DIFFERENT qualities, so later
    batches genuinely trigger the replace path's epoch rewrites."""
    from pyspark.sql import functions as F

    src = f"{WORK}/{tag}/src"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), "embedding")
    both = docs.join(emb, "doc_id")
    if with_quality:
        both = both.withColumn(
            "quality", (F.col("doc_id") % 97).cast("double") / 96.0)
    for i in range(n_batches):
        (both.filter(F.col("doc_id") % n_batches == i)
         .coalesce(1).write.mode("overwrite").parquet(f"{src}/f{i}"))
    return src


def _staged_warc_records(spark, sf_dir: str, n_batches: int,
                         http_messages: bool = False):
    """Shared WARC-record synthesis for the blob and file modes:
    one ``(source, b, s:struct<doc_id, r:string>)`` row per document —
    the ``web_ingest_pipeline_docs`` page template (nav/footer chrome
    around the escaped article) packed into a response record with a
    real Content-Length."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source", "text")
    crlf, blank = "\r\n", "\r\n\r\n"
    esc = F.col("text")
    for raw, ent in [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")]:
        esc = F.replace(esc, F.lit(raw), F.lit(ent))
    page = F.concat(
        F.lit("<html><head><title>t</title></head><body>"
              "<div class=\"nav\"><a href=\"/\">HomePage</a> | "
              "<a href=\"/a\">AboutUs</a> | "
              "<a href=\"/c\">ContactUs</a></div>"
              "<p id=\"main\">"),
        esc,
        F.lit("</p><div class=\"footer\"><a href=\"/t\">Terms</a> | "
              "<a href=\"/p\">Privacy</a> | copyright 2024"
              "</div></body></html>"))
    if http_messages:
        # the real CommonCrawl record shape: the payload is a FULL
        # HTTP message; streaming_web_ingest(http_messages=True)
        # frames it off before extraction
        payload = F.concat(
            F.lit("HTTP/1.1 200 OK" + crlf
                  + "Content-Type: text/html; charset=utf-8" + crlf
                  + "X-Crawl-Source: "),
            F.col("source"), F.lit(blank), page)
    else:
        payload = page
    rec = F.concat(
        F.lit("WARC/1.0" + crlf + "WARC-Type: response" + crlf
              + "WARC-Target-URI: page://"),
        F.col("source"), F.lit("/"), F.col("doc_id").cast("string"),
        F.lit(crlf + "Content-Length: "),
        # octets, not characters (ADVICE r14 low): WARC_FILES mode
        # UTF-8-encodes these records to .warc.gz and re-parses them
        # with the OCTET-cursor binary kernel; equal for the ASCII
        # fixture, correct by construction for any non-ASCII text
        F.octet_length(payload).cast("string"),
        F.lit(blank), payload, F.lit(blank))
    return docs.select(
        "source", (F.col("doc_id") % n_batches).alias("b"),
        F.struct("doc_id", rec.alias("r")).alias("s"))


def _prep_blob_sources(spark, sf_dir: str, tag: str,
                       n_batches: int) -> str:
    """Parquet-wrapped WARC blobs, one blob row per (source, batch),
    split into n_batches parquet files (one micro-batch each)."""
    from pyspark.sql import functions as F

    src = f"{WORK}/{tag}/src"
    staged = _staged_warc_records(spark, sf_dir, n_batches)
    for i in range(n_batches):
        (staged.filter(F.col("b") == i)
         .groupBy("source")
         .agg(F.concat_ws("", F.transform(
             F.array_sort(F.collect_list("s")), lambda x: x["r"]))
             .alias("blob"))
         .coalesce(1).write.mode("overwrite").parquet(f"{src}/f{i}"))
    return src


def _prep_warc_files(spark, sf_dir: str, tag: str, n_batches: int,
                     http_messages: bool = False) -> tuple[str, int]:
    """REAL on-disk ``.warc.gz`` files (VERDICT r13 item 2): one
    multi-member gzip file per (source, batch) — member per record,
    the CommonCrawl layout — written DISTRIBUTED via foreachPartition
    (each task gzips and writes its own files; nothing collects to
    the driver). Returns (src_dir, n_sources)."""
    from pyspark.sql import functions as F

    src = f"{WORK}/{tag}/src"
    staged = _staged_warc_records(spark, sf_dir, n_batches,
                                  http_messages=http_messages)
    n_sources = staged.select("source").distinct().count()
    for i in range(n_batches):
        batch_dir = f"{src}/f{i}"
        os.makedirs(batch_dir, exist_ok=True)
        per_src = (staged.filter(F.col("b") == i)
                   .groupBy("source")
                   .agg(F.transform(F.array_sort(F.collect_list("s")),
                                    lambda x: x["r"]).alias("recs")))

        def _write(rows, batch_dir=batch_dir):
            import gzip as _gzip
            import os as _os
            for r in rows:
                data = b"".join(_gzip.compress(rec.encode("utf-8"))
                                for rec in r["recs"])
                tmp = _os.path.join(batch_dir, f".{r['source']}.tmp")
                with open(tmp, "wb") as fh:
                    fh.write(data)
                _os.replace(tmp, _os.path.join(
                    batch_dir, f"{r['source']}.warc.gz"))

        per_src.foreachPartition(_write)
    return src, n_sources


def _run_web_ingest(spark, src: str, tag: str, n_cells: int,
                    timeout_sec: int = 3600,
                    ckpt: str | None = None,
                    files_per_trigger: int | None = None,
                    http_messages: bool = False) -> str:
    from pyspark.sql import functions as F

    from pyspark_deduplication_spark.streaming.ops import (
        streaming_web_ingest,
    )

    corpus_dir = f"{WORK}/{tag}/corpus"
    if ckpt is None:
        ckpt = f"{WORK}/{tag}/ckpt_{int(time.time()*1e6)}"
    if files_per_trigger is not None:
        # WARC_FILES mode: the binaryFile streaming source hands each
        # on-disk .warc.gz to the octet/gzip kernel; one trigger
        # ingests one batch-dir worth of files
        # binaryFile's schema is fixed but the STREAMING source still
        # demands it be declared explicitly
        bin_schema = ("path string, modificationTime timestamp, "
                      "length long, content binary")
        stream = (spark.readStream.format("binaryFile")
                  .schema(bin_schema)
                  .option("pathGlobFilter", "*.warc.gz")
                  .option("maxFilesPerTrigger", str(files_per_trigger))
                  .load(f"{src}/*"))
        q = streaming_web_ingest(
            stream.select(F.col("content").alias("blob")),
            corpus_dir, ckpt, n_cells=n_cells,
            binary_blobs=True, gzip_members=True,
            http_messages=http_messages)
    else:
        schema = spark.read.parquet(f"{src}/f0").schema
        stream = (spark.readStream.format("parquet").schema(schema)
                  .option("maxFilesPerTrigger", "1").load(f"{src}/*"))
        q = streaming_web_ingest(stream, corpus_dir, ckpt,
                                 n_cells=n_cells)
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise RuntimeError(f"{tag}: web ingest did not finish in "
                           f"{timeout_sec}s")
    return corpus_dir


def _run_ingest(spark, src: str, tag: str, n_cells: int,
                timeout_sec: int = 3600, ckpt: str | None = None,
                quality_col: str | None = None) -> str:
    from pyspark_deduplication_spark.streaming.ops import (
        streaming_fused_ingest,
    )

    schema = spark.read.parquet(f"{src}/f0").schema
    stream = (spark.readStream.format("parquet").schema(schema)
              .option("maxFilesPerTrigger", "1").load(f"{src}/*"))
    corpus_dir = f"{WORK}/{tag}/corpus"
    if ckpt is None:
        ckpt = f"{WORK}/{tag}/ckpt_{int(time.time()*1e6)}"
    q = streaming_fused_ingest(
        stream, corpus_dir, ckpt,
        jaccard_threshold=0.7, cosine_threshold=0.95,
        n_cells=n_cells, weighted_threshold=0.5,
        quality_col=quality_col)
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise RuntimeError(f"{tag}: ingest did not finish in {timeout_sec}s")
    return corpus_dir


def main() -> None:
    base_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    scaled_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfscale/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    n_batches = int(sys.argv[4]) if len(sys.argv) > 4 else 5

    from pyspark_deduplication_spark.session import (
        dir_input_bytes,
        get_spark,
        shuffle_partitions_for_bytes,
    )
    from pyspark_deduplication_spark.streaming.ops import (
        _epoch_partitions,
        compact_corpus_epochs,
    )

    spark = get_spark("scale_stream")
    shutil.rmtree(WORK, ignore_errors=True)
    # KEEP_BEST=1: drive the quality-aware survivorship spelling —
    # insert/drop/replace with epoch rewrites — instead of drop-only.
    # WEB_INGEST=1: the streaming web capstone (WARC parse → extract →
    # score → keep-best ingest); quality-aware by construction.
    warc_files = os.environ.get("WARC_FILES", "") == "1"
    # HTTP_MESSAGES=1 (WARC_FILES only — framing needs binary
    # payloads): each record's payload is a full HTTP message and the
    # stream frames it off per micro-batch
    http_msgs = (os.environ.get("HTTP_MESSAGES", "") == "1"
                 and warc_files)
    web = os.environ.get("WEB_INGEST", "") == "1" or warc_files
    keep_best = os.environ.get("KEEP_BEST", "") == "1" and not web
    quality_col = "quality" if keep_best else None

    rows = []
    for tag, d, cells in (("base", base_dir, 16),
                          ("scaled", scaled_dir, 16 * factor)):
        parts = shuffle_partitions_for_bytes(
            sum(dir_input_bytes(os.path.join(d, t))
                for t in ("documents.parquet", "embeddings.parquet")),
            target_partition_bytes=8 << 20, expansion=100.0)
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        n_sources = None
        if warc_files:
            src, n_sources = _prep_warc_files(
                spark, d, tag, n_batches, http_messages=http_msgs)
        elif web:
            src = _prep_blob_sources(spark, d, tag, n_batches)
        else:
            src = _prep_sources(spark, d, tag, n_batches,
                                with_quality=keep_best)

        def _run(ckpt):
            if web:
                return _run_web_ingest(spark, src, tag, cells,
                                       ckpt=ckpt,
                                       files_per_trigger=n_sources,
                                       http_messages=http_msgs)
            return _run_ingest(spark, src, tag, cells, ckpt=ckpt,
                               quality_col=quality_col)

        ckpt = f"{WORK}/{tag}/ckpt_{int(time.time()*1e6)}"
        t0 = time.perf_counter()
        corpus_dir = _run(ckpt)
        elapsed = time.perf_counter() - t0

        n_corpus = spark.read.parquet(corpus_dir).count()
        corpus_epochs = _epoch_partitions(spark, corpus_dir)

        # heal exercise (untimed): kill the MinHash signature index,
        # then ingest ONE more batch — heal-before-trust must backfill
        # every corpus epoch before the probe trusts the index. The
        # heal run REUSES the original checkpoint dir so the file
        # source sees only f_extra as new (ADVICE r10: a fresh
        # checkpoint reprocessed all n_batches+1 files, roughly
        # doubling the untimed work).
        shutil.rmtree(corpus_dir + "_sigs")
        if warc_files:
            import glob as _glob
            first = sorted(_glob.glob(f"{src}/f0/*.warc.gz"))[0]
            os.makedirs(f"{src}/f_extra", exist_ok=True)
            shutil.copy(first, f"{src}/f_extra/extra.warc.gz")
        else:
            extra = spark.read.parquet(f"{src}/f0").limit(50)
            extra.coalesce(1).write.mode("overwrite") \
                .parquet(f"{src}/f_extra")
        _run(ckpt)
        healed = _epoch_partitions(spark, corpus_dir + "_sigs")
        assert corpus_epochs <= healed, (
            f"{tag}: heal left index epochs {sorted(healed)} behind "
            f"pre-heal corpus epochs {sorted(corpus_epochs)}")

        # compaction (untimed): fold all but the newest 2 epochs into
        # one partition — content must be row-for-row preserved and
        # the partition count bounded (VERDICT r12 advisory 2)
        eps_before = len(_epoch_partitions(spark, corpus_dir))
        n_before = spark.read.parquet(corpus_dir).count()
        compact_corpus_epochs(spark, corpus_dir, keep_last=2)
        eps_after = len(_epoch_partitions(spark, corpus_dir))
        n_after = spark.read.parquet(corpus_dir).count()
        assert n_after == n_before, (
            f"{tag}: compaction changed row count "
            f"{n_before} -> {n_after}")
        assert eps_after <= 3, f"{tag}: {eps_after} epochs post-compact"

        rows.append({"fixture": tag, "dir": d, "n_cells": cells,
                     "shuffle_partitions": parts,
                     "n_batches": n_batches,
                     "corpus_rows": n_corpus,
                     "wall_sec": round(elapsed, 2),
                     "heal_epochs_ok": True,
                     "epochs_before_compact": eps_before,
                     "epochs_after_compact": eps_after,
                     "compact_rows_ok": True})
        print(json.dumps(rows[-1]), flush=True)

    t_base, t_scaled = rows[0]["wall_sec"], rows[1]["wall_sec"]
    print(json.dumps({
        "metric": ("streaming_warc_files_ingest_sf1_scaling"
                   if warc_files else
                   "streaming_web_ingest_sf1_scaling" if web else
                   "streaming_keep_best_ingest_sf1_scaling"
                   if keep_best else
                   "streaming_fused_ingest_sf1_scaling"),
        "factor": factor,
        "t_base_sec": t_base,
        "t_scaled_sec": t_scaled,
        "ratio": round(t_scaled / t_base, 2),
        "exponent": round(math.log(t_scaled / t_base) / math.log(factor), 2),
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
