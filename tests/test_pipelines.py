"""ETL pipeline parity: extract → transform → load end-to-end."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from pyspark_deduplication_spark.pipelines import extract, load, run_pipeline, transform
from pyspark_deduplication_spark.sources.writers import write_csv


def _input_csv(spark, tmp_path) -> str:
    rows = [(1, "acme", "DE1"), (2, "acme", "DE1"), (3, "zeta", "FR2")]
    df = spark.createDataFrame(rows, "ID int, Name string, IBAN string")
    path = str(tmp_path / "src")
    write_csv(df, path)
    return path


def test_extract_registers_view(spark, tmp_path):
    path = _input_csv(spark, tmp_path)
    df = extract(spark, path)
    assert spark.table("extracted_data").count() == df.count() == 3
    # inferSchema on: ID came back integral, not string
    assert dict(df.dtypes)["ID"] in ("int", "bigint")


def test_transform_dedup_case_insensitive_keys(spark, tmp_path):
    path = _input_csv(spark, tmp_path)
    extract(spark, path)
    # reference dedups on ['Name','IBAN'] against lowercase headers —
    # case-insensitive resolution must hold (SURVEY §1.3)
    out, _ = transform(spark, dedup_keys=["name", "iban"], id_col="id")
    rows = out.collect()
    assert len(rows) == 2
    assert len({r.id for r in rows}) == 2  # surrogate ids unique


def test_full_pipeline_to_csv(spark, tmp_path):
    path = _input_csv(spark, tmp_path)
    out_csv = str(tmp_path / "out")
    result = run_pipeline(spark, path, out_csv, dedup_keys=["Name", "IBAN"])
    assert result.count() == 2
    assert len(glob.glob(f"{out_csv}/part-*")) == 1  # single-file sink


def test_transform_materializes_parquet_handoff(spark, tmp_path):
    path = _input_csv(spark, tmp_path)
    df = extract(spark, path)
    out_dir = str(tmp_path / "stage")
    _, handoff = transform(spark, df=df, dedup_keys=["Name"],
                           output_path=out_dir)
    assert handoff == out_dir
    assert spark.read.parquet(handoff).count() == 2
    load(spark, transformed_path=handoff, csv_path=str(tmp_path / "final"))
    assert glob.glob(f"{tmp_path}/final/part-*")


def test_example_airflow_dag_importable_and_tasks_run(spark, tmp_path,
                                                      monkeypatch):
    """The example DAG module (examples/airflow_etl_dag.py ≙
    DAG/ETL.py:110-128) imports without Airflow installed, and its
    three task callables run the full extract → transform → load chain
    passing parquet paths the way XCom would."""
    import importlib
    import sys

    sys.path.insert(0, "examples")
    try:
        dagmod = importlib.import_module("airflow_etl_dag")
    finally:
        sys.path.remove("examples")
    # The task callables call get_spark() with PRODUCTION defaults;
    # builder.getOrCreate() on the already-running test session applies
    # any runtime-settable SQL confs it was given — notably a
    # core-count shuffle width — onto the SHARED session, leaking a
    # 32-wide conf into every later test (it flipped the
    # width-dependent deficient-scan spread pin in test_plans).
    # Snapshot and restore.
    prev_width = spark.conf.get("spark.sql.shuffle.partitions")
    # no scheduler in this container: the DAG object is gated off but
    # the callables are always defined
    assert dagmod.DAG is None
    rows = [(1, "jo", "doe", "1 elm st"), (2, "jo", "doe", "1 elm st"),
            (3, "al", "poe", "9 oak av")]
    df = spark.createDataFrame(
        rows, "ID int, fname string, lname string, address string")
    src = str(tmp_path / "incoming")
    write_csv(df, src)

    try:
        staged = dagmod.extract_task(src, str(tmp_path / "staged"))
        transformed = dagmod.transform_task(staged, str(tmp_path / "xform"))
        dagmod.load_task(transformed, jdbc_url=None,
                         csv_path=str(tmp_path / "final"))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_width)
    out = spark.read.parquet(transformed)
    assert out.count() == 2  # the (jo, doe, 1 elm st) pair deduped
    assert "surrogate" in [c.lower() for c in out.columns] or \
        "ID".lower() in [c.lower() for c in out.columns]
    assert glob.glob(f"{tmp_path}/final/part-*")


def test_driver_memory_default_respects_small_hosts(monkeypatch):
    """ADVICE r9: the local-mode driver-heap default is min(8g, ~70% of
    physical RAM) so a fixed 8g ask cannot OOM-kill constrained CI
    containers; SPARK_GRAFT_DRIVER_MEM always wins."""
    import pyspark_deduplication_spark.session as s

    monkeypatch.delenv("SPARK_GRAFT_DRIVER_MEM", raising=False)
    monkeypatch.setattr(s, "_total_ram_gib", lambda: 4)
    assert s._default_driver_mem() == "2g"
    monkeypatch.setattr(s, "_total_ram_gib", lambda: 1)
    assert s._default_driver_mem() == "1g"   # floor: never 0g
    monkeypatch.setattr(s, "_total_ram_gib", lambda: 128)
    assert s._default_driver_mem() == "8g"   # cap: local default
    monkeypatch.setenv("SPARK_GRAFT_DRIVER_MEM", "48g")
    assert s._default_driver_mem() == "48g"  # env always wins
    monkeypatch.undo()
    assert s._total_ram_gib() >= 1


def test_shuffle_partitions_track_input_bytes(tmp_path):
    """VERDICT r9 item 4: partitions = ceil(bytes*expansion/target),
    floored at local parallelism, capped — sized to DATA, not the box."""
    from pyspark_deduplication_spark.session import (
        dir_input_bytes,
        shuffle_partitions_for_bytes,
    )

    f = shuffle_partitions_for_bytes  # short alias for the table below
    assert f(0, floor=32) == 32                      # empty → floor
    assert f(1 << 30, floor=8) == 8                  # 1 GiB @128MiB = 8
    assert f(1 << 30, floor=4) == 8                  # need beats floor
    assert f(100 << 40, floor=8) == 200_000          # cap holds
    # the measured doc_dup_span case: ~11 MB compressed gram workload,
    # ~100x expansion, 8 MiB targets → the empirically-good ~128-133
    assert 120 <= f(11_148_996, target_partition_bytes=8 << 20,
                    expansion=100.0, floor=32) <= 140
    # base fixture stays on the 32 floor → batches stay comparable
    assert f(1_393_263, target_partition_bytes=8 << 20,
             expansion=100.0, floor=32) == 32

    d = tmp_path / "t"
    (d / "sub").mkdir(parents=True)
    (d / "a.bin").write_bytes(b"x" * 100)
    (d / "sub" / "b.bin").write_bytes(b"y" * 50)
    assert dir_input_bytes(str(d)) == 150
    # driver fixtures are single files, not directories — must size too
    assert dir_input_bytes(str(d / "a.bin")) == 100
    assert dir_input_bytes(str(tmp_path / "missing")) == 0


def test_commoncrawl_ingest_example_end_to_end(spark, tmp_path):
    """The examples/commoncrawl_ingest.py recipe on REAL on-disk
    ``.warc.gz`` segments — every r14 stage firing in one run:
    digest-header exact dedup (payloads untouched), HTTP framing +
    chunked/gzip body decode, charset transcode, robots-noindex drop,
    non-200 drop, WET conversion-record drop, non-HTTP payload
    degradation, tracking-param canonical identity collapse, and
    MinHash keep-best-quality survivorship."""
    import gzip
    import sys

    sys.path.insert(0, "examples")
    try:
        from commoncrawl_ingest import ingest_crawl_dir
    finally:
        sys.path.remove("examples")

    crlf, blank = b"\r\n", b"\r\n\r\n"

    def page(article, charset="utf-8", extra_head=""):
        return (
            "<html><head>" + extra_head + "<title>t</title></head>"
            "<body><div class=\"nav\"><a href=\"/\">HomePage</a> | "
            "<a href=\"/a\">AboutUs</a> | "
            "<a href=\"/c\">ContactUs</a></div>"
            "<p id=\"main\">" + article + "</p>"
            "<div class=\"footer\"><a href=\"/t\">Terms</a> | "
            "<a href=\"/p\">Privacy</a> | <a href=\"/k\">Cookies</a>"
            "</div></body></html>").encode(charset)

    def chunked(data, size=150):
        out = []
        for i in range(0, len(data), size):
            p = data[i:i + size]
            out.append(f"{len(p):x}".encode() + b"\r\n" + p + b"\r\n")
        return b"".join(out) + b"0\r\n\r\n"

    def http(body, ct="text/html; charset=utf-8", status=b"200 OK",
             *extra):
        head = [b"HTTP/1.1 " + status, b"Content-Type: " + ct.encode()]
        head += [e.encode() for e in extra]
        return b"\r\n".join(head) + blank + body

    def rec(uri, payload, wtype=b"response", digest=None):
        h = (b"WARC/1.0" + crlf + b"WARC-Type: " + wtype + crlf
             + b"WARC-Target-URI: " + uri.encode() + crlf)
        if digest:
            h += b"WARC-Payload-Digest: md5:" + digest.encode() + crlf
        return (h + b"Content-Length: " + str(len(payload)).encode()
                + blank + payload + blank)

    def words(prefix, n=25):
        return " ".join(f"{prefix}{i}" for i in range(n))

    art_a = words("alpha")
    art_b = words("beta")
    toks = art_b.split()
    toks[10] = "the"
    art_b2 = " ".join(toks)  # better quality (stopword ratio)
    art_cp = "“cp” " + words("gamma")
    art_bare = words("delta")

    seg1 = (
        # chunked 200 → kept
        rec("https://ex.com/a?page=1",
            http(chunked(page(art_a)), "text/html; charset=utf-8",
                 b"200 OK", "Transfer-Encoding: chunked"))
        # tracking-param re-crawl of the SAME page → canonical collapse
        + rec("https://EX.com/a?utm_source=x&page=1",
              http(chunked(page(art_a)), "text/html; charset=utf-8",
                   b"200 OK", "Transfer-Encoding: chunked"))
        # near-dup pair, second is better quality → survivorship
        + rec("https://ex.com/b1", http(page(art_b)))
        + rec("https://ex.com/b2", http(page(art_b2)))
    )
    seg2 = (
        # exact dup planted twice under one digest → digest dedup
        rec("https://ex.com/cp1",
              http(page(art_cp, "windows-1252"),
                   "text/html; charset=windows-1252"), digest="d1")
        + rec("https://ex.com/cp2",
              http(page(art_cp, "windows-1252"),
                   "text/html; charset=windows-1252"), digest="d1")
        # noindex → dropped
        + rec("https://ex.com/ni", http(page(
            words("noidx"), "utf-8",
            "<meta name=\"robots\" content=\"noindex\">")))
        # 404 → dropped
        + rec("https://ex.com/404", http(page(words("gone")),
                                         "text/html",
                                         b"404 Not Found"))
        # WET conversion record → dropped by type dispatch
        + rec("https://ex.com/wet", b"plain text",
              wtype=b"conversion")
        # bare non-HTTP payload → degrades to whole-payload body, kept
        + rec("https://ex.com/bare", page(art_bare))
    )
    crawl = tmp_path / "crawl"
    crawl.mkdir()
    (crawl / "seg1.warc.gz").write_bytes(gzip.compress(seg1))
    (crawl / "seg2.warc.gz").write_bytes(gzip.compress(seg2))

    out = {r.uri: r for r in
           ingest_crawl_dir(spark, str(crawl)).collect()}

    # a: exactly ONE row for the canonical pair (either raw spelling)
    a_rows = [u for u in out if "/a?" in u]
    assert len(a_rows) == 1, sorted(out)
    assert out[a_rows[0]].text == " ".join(art_a.split())
    # b: keep-best-quality kept b2 (the 'the' variant), dropped b1
    assert "https://ex.com/b2" in out and "https://ex.com/b1" not in out
    assert out["https://ex.com/b2"].text == " ".join(art_b2.split())
    # cp: digest dedup kept ONE copy; charset transcoded exactly
    cp_rows = [u for u in out if "/cp" in u]
    assert len(cp_rows) == 1
    assert "“cp”" in out[cp_rows[0]].text
    assert "�" not in out[cp_rows[0]].text
    # bare page survived the non-HTTP degradation path
    assert out["https://ex.com/bare"].text == " ".join(art_bare.split())
    # dropped: noindex, 404, WET conversion
    for gone in ("/ni", "/404", "/wet"):
        assert not any(gone in u for u in out), (gone, sorted(out))
    # nothing leaked chrome or HTTP heads
    for r in out.values():
        assert "HomePage" not in r.text and "HTTP/1.1" not in r.text
        assert r.quality is not None


def test_crawl_redirect_identity_collapse(spark, tmp_path, caplog):
    """Redirect-aware identity (r15 — VERDICT r14 item 7): a page
    captured at its OLD url plus a 301 chain (old→mid→new, the source
    hop carrying a tracking param) plus the NEW capture must collapse
    to ONE corpus row keyed on the new canonical URL when
    redirect_hops covers the chain — and stay two rows when redirects
    are off (the edge exists but is unused). Also smoke-checks
    warn_on_loss on a clean crawl (no warnings)."""
    import gzip
    import logging

    from pyspark_deduplication_spark.crawl import ingest_crawl_dir

    crlf, blank = b"\r\n", b"\r\n\r\n"

    def page(article):
        return (
            "<html><head><title>t</title></head>"
            "<body><div class=\"nav\"><a href=\"/\">HomePage</a> | "
            "<a href=\"/a\">AboutUs</a> | "
            "<a href=\"/c\">ContactUs</a></div>"
            "<p id=\"main\">" + article + "</p>"
            "<div class=\"footer\"><a href=\"/t\">Terms</a> | "
            "<a href=\"/p\">Privacy</a> | <a href=\"/k\">Cookies</a>"
            "</div></body></html>").encode()

    def http(body, *extra, status=b"200 OK"):
        head = [b"HTTP/1.1 " + status,
                b"Content-Type: text/html; charset=utf-8"]
        head += [e.encode() for e in extra]
        return b"\r\n".join(head) + blank + body

    def rec(uri, payload):
        return (b"WARC/1.0" + crlf + b"WARC-Type: response" + crlf
                + b"WARC-Target-URI: " + uri.encode() + crlf
                + b"Content-Length: " + str(len(payload)).encode()
                + blank + payload + blank)

    stale = "stale mirror kept only until the move completes ok"
    art = " ".join(f"fresh{i}" for i in range(30))
    seg = (
        rec("https://old.ex.com/p", http(page(stale)))
        + rec("https://old.ex.com/p?utm_campaign=x",
              http(b"<html><body>Moved</body></html>",
                   "Location: https://mid.ex.com/p",
                   status=b"301 Moved Permanently"))
        + rec("https://mid.ex.com/p",
              http(b"<html><body>Moved</body></html>",
                   "Location: /q",  # root-relative hop
                   status=b"301 Moved Permanently"))
        + rec("https://mid.ex.com/q",
              http(b"<html><body>Moved</body></html>",
                   "Location: https://new.ex.com/p",
                   status=b"301 Moved Permanently"))
        + rec("https://new.ex.com/p", http(page(art)))
    )
    crawl = tmp_path / "crawl"
    crawl.mkdir()
    (crawl / "seg.warc.gz").write_bytes(gzip.compress(seg))

    # hops=3 covers old→mid/p→mid/q→new; the stale capture merges
    # into the new identity and keep-best survivorship picks a single
    # row (min uri on the quality tie is new < old lexicographically
    # only via the canonical collapse: both rows carry the SAME
    # doc_id, and the collapse keeps the min-uri spelling)
    with caplog.at_level(logging.WARNING):
        out = ingest_crawl_dir(spark, str(crawl), redirect_hops=3,
                               warn_on_loss=True).collect()
    assert not [r for r in caplog.records
                if "ingest_crawl_dir: loss" in r.getMessage()]
    assert len(out) == 1, [(r.uri, r.text) for r in out]
    assert out[0].uri == "https://new.ex.com/p"
    assert out[0].text == art

    # redirects off: old and new captures stay distinct identities
    off = ingest_crawl_dir(spark, str(crawl)).collect()
    assert sorted(r.uri for r in off) == [
        "https://new.ex.com/p", "https://old.ex.com/p"]


def test_crawl_warn_on_loss_reports_bad_segment(spark, tmp_path,
                                                caplog):
    """warn_on_loss surfaces a damaged segment (truncated gzip tail)
    as a logged warning while the recipe still returns every cleanly
    parsed record — the no-silent-caps contract in the recipe
    spelling."""
    import gzip
    import logging

    from pyspark_deduplication_spark.crawl import ingest_crawl_dir

    crlf, blank = b"\r\n", b"\r\n\r\n"
    art = " ".join(f"word{i}" for i in range(30))
    page = ("<html><body><p id=\"main\">" + art + "</p></body></html>"
            ).encode()
    msg = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
           + page)

    def rec(uri, payload):
        return (b"WARC/1.0" + crlf + b"WARC-Type: response" + crlf
                + b"WARC-Target-URI: " + uri.encode() + crlf
                + b"Content-Length: " + str(len(payload)).encode()
                + blank + payload + blank)

    crawl = tmp_path / "crawl"
    crawl.mkdir()
    (crawl / "seg.warc.gz").write_bytes(
        gzip.compress(rec("https://a.ex.com/1", msg))
        + gzip.compress(rec("https://a.ex.com/2", msg))[:10])

    with caplog.at_level(logging.WARNING):
        out = ingest_crawl_dir(spark, str(crawl),
                               warn_on_loss=True).collect()
    msgs = [r.getMessage() for r in caplog.records
            if "ingest_crawl_dir: loss" in r.getMessage()]
    assert len(msgs) == 1 and "1 truncated gzip member" in msgs[0], msgs
    assert [r.uri for r in out] == ["https://a.ex.com/1"]
    assert out[0].text == art


def test_incremental_crawl_matches_streaming_twin(spark, tmp_path):
    """Cross-crawl incremental batch mode (r15 — VERDICT r14 item 8):
    ingesting two synthetic crawls SEQUENTIALLY through
    ``ingest_crawl_incremental`` must land the same corpus content as
    the streaming twin consuming the same WARC bytes as two
    micro-batches — equivalence is by construction (both drive
    ``fused_ingest_epoch``), and this pins it: crawl 2 carries a
    strictly-better near-dup (replace), a worse near-dup (drop), and
    a new doc (insert) against crawl 1's persisted corpus."""
    import gzip

    from pyspark.sql import types as T

    from pyspark_deduplication_spark.crawl import (
        ingest_crawl_incremental,
    )
    from pyspark_deduplication_spark.streaming.ops import (
        streaming_web_ingest,
    )

    crlf, blank = b"\r\n", b"\r\n\r\n"

    def page(article):
        return (
            "<html><head><title>t</title></head>"
            "<body><div class=\"nav\"><a href=\"/\">HomePage</a> | "
            "<a href=\"/a\">AboutUs</a> | "
            "<a href=\"/c\">ContactUs</a></div>"
            "<p id=\"main\">" + article + "</p>"
            "<div class=\"footer\"><a href=\"/t\">Terms</a> | "
            "<a href=\"/p\">Privacy</a> | <a href=\"/k\">Cookies</a>"
            "</div></body></html>").encode()

    def rec(uri, article):
        msg = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html; "
               b"charset=utf-8" + blank + page(article))
        return (b"WARC/1.0" + crlf + b"WARC-Type: response" + crlf
                + b"WARC-Target-URI: " + uri.encode() + crlf
                + b"Content-Length: " + str(len(msg)).encode()
                + blank + msg + blank)

    art_a = " ".join(f"alpha{i}" for i in range(25))
    toks = art_a.split()
    toks[5], toks[11] = "the", "and"
    art_a_better = " ".join(toks)  # near-dup, higher stopword ratio
    art_b = "the of and " + " ".join(f"beta{i}" for i in range(22))
    art_b_worse = art_b.replace("the ", "qq1 ", 1)  # stopword lost
    art_c = " ".join(f"gamma{i}" for i in range(25))

    seg1 = (rec("https://a.ex.com/p1", art_a)
            + rec("https://b.ex.com/p2", art_b))
    seg2 = (rec("https://a.ex.com/p1b", art_a_better)
            + rec("https://b.ex.com/p2b", art_b_worse)
            + rec("https://c.ex.com/p3", art_c))

    # ---- batch: two crawl directories ingested sequentially --------
    for i, seg in [(1, seg1), (2, seg2)]:
        d = tmp_path / f"crawl{i}"
        d.mkdir()
        (d / "seg.warc.gz").write_bytes(gzip.compress(seg))
    corpus_b = str(tmp_path / "corpus_batch")
    ingest_crawl_incremental(spark, str(tmp_path / "crawl1"), corpus_b)
    final_b = ingest_crawl_incremental(
        spark, str(tmp_path / "crawl2"), corpus_b)
    got_b = sorted((r.uri, r.text) for r in final_b.collect())

    # ---- streaming twin: same bytes as two micro-batches -----------
    src = str(tmp_path / "blobs")
    schema = T.StructType([T.StructField("blob", T.BinaryType())])
    for name, seg in [("f1", gzip.compress(seg1)),
                      ("f2", gzip.compress(seg2))]:
        spark.createDataFrame([(seg,)], schema).coalesce(1) \
            .write.mode("overwrite").parquet(f"{src}/{name}")
    stream = (spark.readStream.format("parquet").schema(schema)
              .option("maxFilesPerTrigger", "1").load(f"{src}/*"))
    corpus_s = str(tmp_path / "corpus_stream")
    q = streaming_web_ingest(
        stream, corpus_s, str(tmp_path / "ckpt"),
        binary_blobs=True, gzip_members=True, http_messages=True,
        canonical_ids=True)
    q.awaitTermination(240)
    got_s = sorted((r.uri, r.text)
                   for r in spark.read.parquet(corpus_s).collect())

    want = sorted([
        ("https://a.ex.com/p1b", " ".join(art_a_better.split())),
        ("https://b.ex.com/p2", " ".join(art_b.split())),
        ("https://c.ex.com/p3", " ".join(art_c.split())),
    ])
    assert got_b == want, got_b
    assert got_s == want, got_s


def test_crawl_politeness_gates(spark, tmp_path):
    """Site-level politeness in the batch recipe (r15): a banned
    registrable domain (captured through a subdomain spelling) and a
    robots star-Disallow prefix hit must both drop BEFORE extraction;
    a lookalike domain containing the banned name and a non-matching
    path survive. Gates off → all four pages land."""
    import gzip

    from pyspark_deduplication_spark.crawl import (
        ingest_crawl_dir,
        robots_star_rules,
    )

    crlf, blank = b"\r\n", b"\r\n\r\n"

    def page(article):
        return ("<html><body><p id=\"main\">" + article
                + "</p></body></html>").encode()

    def http(body):
        return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html"
                + blank + body)

    def rec(uri, payload):
        return (b"WARC/1.0" + crlf + b"WARC-Type: response" + crlf
                + b"WARC-Target-URI: " + uri.encode() + crlf
                + b"Content-Length: " + str(len(payload)).encode()
                + blank + payload + blank)

    def art(tag):
        return " ".join(f"{tag}{i}" for i in range(30))

    seg = (
        rec("https://ads.banned.com/x", http(page(art("a"))))
        + rec("https://not-banned.com/x", http(page(art("b"))))
        + rec("https://ok.com/tmp/secret", http(page(art("c"))))
        + rec("https://ok.com/public/fine", http(page(art("d"))))
    )
    crawl = tmp_path / "crawl"
    crawl.mkdir()
    (crawl / "seg.warc.gz").write_bytes(gzip.compress(seg))

    rules = robots_star_rules(spark.createDataFrame(
        [("ok.com", "User-agent: *\nDisallow: /tmp\n")],
        "domain string, robots_txt string"))
    out = ingest_crawl_dir(spark, str(crawl),
                           blocked_domains=["banned.com"],
                           robots_rules=rules).collect()
    assert sorted(r.uri for r in out) == [
        "https://not-banned.com/x", "https://ok.com/public/fine"]

    off = ingest_crawl_dir(spark, str(crawl)).collect()
    assert len(off) == 4
