"""URL canonicalization kernels: spelling variants must converge."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_deduplication_spark.functions.urls import (
    canonicalize_url,
    registrable_domain,
    url_host,
)


def _canon(spark, urls: list[str]) -> list[str | None]:
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.c for r in
            df.select(canonicalize_url(F.col("url")).alias("c")).collect()]


def test_spelling_variants_converge(spark):
    variants = [
        "HTTP://WWW.Example.COM:80/a/b/?z=2&a=1#frag",
        "http://www.example.com/a/b?a=1&z=2",
        "http://www.EXAMPLE.com.:80/a/b///?z=2&a=1",
    ]
    got = set(_canon(spark, variants))
    assert got == {"http://www.example.com/a/b?a=1&z=2"}


def test_ports_fragments_and_null(spark):
    got = _canon(spark, [
        "https://a.com:443/x",      # default https port dropped
        "https://a.com:8443/x",     # explicit port kept
        "http://a.com:443/x",       # 443 NOT default for http
        "HTTPS://A.com/#only-frag", # root path + fragment → bare host
        "user:pw@missing.scheme.com/x",  # not absolute → NULL
        "ftp://Files.Example.org:21/pub/",  # unknown default port kept
    ])
    assert got == [
        "https://a.com/x",
        "https://a.com:8443/x",
        "http://a.com:443/x",
        "https://a.com",
        None,
        "ftp://files.example.org:21/pub",
    ]


def test_userinfo_and_empty_query_params(spark):
    got = _canon(spark, [
        "http://Bob@site.com/p?&&b=2&a=1&",  # empty params dropped
        "http://site.com/p?",
    ])
    # userinfo is kept VERBATIM (module contract) — only scheme/host fold
    assert got == ["http://Bob@site.com/p?a=1&b=2", "http://site.com/p"]


def test_registrable_domain(spark):
    df = spark.createDataFrame(
        [("https://www.shop.CO.UK/x",), ("http://a.b.c.example.com/",),
         ("http://co.uk/",), ("http://localhost/",),
         ("not a url at all",)],
        "url string",
    )
    got = [r.d for r in
           df.select(registrable_domain(F.col("url")).alias("d")).collect()]
    assert got == ["shop.co.uk", "example.com", "", "", ""]


def test_canonicalization_is_a_fixpoint(spark):
    """canonicalize(canonicalize(u)) == canonicalize(u) across the full
    cross-product of spelling variants (2,880 URLs, one Spark pass) —
    the property that makes the canonical form a safe dedup/join key."""
    schemes = ["http", "HTTP", "https", "hTtPs"]
    hosts = ["A.B.co.uk.", "www.X.com", "host", "a.b.c.d.NET"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/p/q/", "/p//", "/p"]
    urls = [
        f"{s}://{u}{h}{po}{pa}{q}{fr}"
        for s in schemes for u in ["", "User@", "u:p@"] for h in hosts
        for po in ports for pa in paths
        for q in ["", "?", "?b=2&a=1"] for fr in ["", "#f"]
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    two = df.select(
        canonicalize_url(F.col("url")).alias("c1"),
        canonicalize_url(canonicalize_url(F.col("url"))).alias("c2"),
    ).collect()
    for r in two:
        assert r.c1 == r.c2, (r.c1, r.c2)


def test_host_strips_root_dot_only(spark):
    df = spark.createDataFrame(
        [("http://Sub.Host.NET./x",), ("http://h.net:9090/",)],
        "url string")
    got = [r.h for r in df.select(url_host(F.col("url")).alias("h")).collect()]
    assert got == ["sub.host.net", "h.net"]


def test_registrable_domain_wide_cctld_suffixes(spark):
    """The widened two-part-suffix table (VERDICT r5 item 7): common
    ccTLD second-level suffixes keep the third label."""
    cases = [
        ("http://www.loja.com.br/x", "loja.com.br"),
        ("http://shop.co.in/", "shop.co.in"),
        ("http://a.b.site.com.cn", "site.com.cn"),
        ("http://news.co.za/y", "news.co.za"),
        ("http://x.com.au", "x.com.au"),
        ("http://plain.org/", "plain.org"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.d for r in
           df.select(registrable_domain(F.col("url")).alias("d")).collect()]
    assert got == [want for _, want in cases]


def test_strip_tracking_params_semantics(spark):
    """Tracking-param stripping (r14): utm_*/fbclid/gclid/… drop from
    the canonical query — case-insensitively and ANCHORED on the
    param name, so a decoy param whose VALUE mentions utm_source
    survives; order-independence still comes from the sort; the
    default (no strip) preserves the original contract."""
    from pyspark.sql import functions as F

    from pyspark_deduplication_spark.functions.urls import (
        canonicalize_url,
        sorted_query,
    )

    cases = [
        (0, "https://Ex.COM/a?UTM_Source=x&b=2&a=1", "a=1&b=2"),
        (1, "https://ex.com/a?fbclid=abc&gclid=1&msclkid=2&a=1",
         "a=1"),
        # decoy: VALUE contains utm_source= — anchored match keeps it
        (2, "https://ex.com/a?note=utm_source%3Dx&q=utm_medium=y",
         "note=utm_source%3Dx&q=utm_medium=y"),
        (3, "https://ex.com/a?utm_campaign=c", ""),
        (4, "https://ex.com/a", ""),
    ]
    df = spark.createDataFrame(cases, "i long, u string, want string")
    rows = df.select(
        "i", "want",
        sorted_query("u", strip_tracking=True).alias("got"),
        canonicalize_url("u", strip_tracking=True).alias("canon"),
        sorted_query("u").alias("raw")).collect()
    for r in rows:
        assert r.got == r.want, (r.i, r.got)
    by_i = {r.i: r for r in rows}
    # default keeps tracking params (original contract)
    assert "utm_source" in by_i[0].raw.lower()
    # canonical spelling composes: host lowercased, empty query absent
    assert by_i[0].canon == "https://ex.com/a?a=1&b=2"
    assert by_i[3].canon == "https://ex.com/a"


def test_streaming_canonical_ids_collapse_recrawl(spark, tmp_path):
    """canonical_ids=True (r14): a re-crawl of the same page arriving
    through a campaign link (utm_*/gclid query) must carry the SAME
    doc identity — with better quality it REPLACES the standing copy
    instead of double-ingesting; the corpus ends with exactly one row
    for the page, and uri keeps the raw spelling for provenance."""
    from pyspark.sql import types as T

    from pyspark_deduplication_spark.streaming.ops import (
        streaming_web_ingest,
    )

    crlf, blank = b"\r\n", b"\r\n\r\n"

    def page(article: str) -> bytes:
        return (
            "<html><body><div class=\"nav\"><a href=\"/\">HomePage"
            "</a> | <a href=\"/a\">AboutUs</a> | "
            "<a href=\"/c\">ContactUs</a></div>"
            "<p id=\"main\">" + article + "</p>"
            "<div class=\"footer\"><a href=\"/t\">Terms</a> | "
            "<a href=\"/p\">Privacy</a> | <a href=\"/k\">Cookies</a>"
            "</div></body></html>").encode("utf-8")

    def rec(uri: str, article: str) -> bytes:
        p = page(article)
        return (b"WARC/1.0" + crlf + b"WARC-Type: response" + crlf
                + b"WARC-Target-URI: " + uri.encode() + crlf
                + b"Content-Length: " + str(len(p)).encode()
                + blank + p + blank)

    art = "« " + " ".join(f"word{i}" for i in range(25)) + " »"
    toks = art.split()
    toks[10] = "the"
    art2 = " ".join(toks)  # higher stopword ratio → better quality
    f1 = rec("https://ex.com/p/1?page=1", art)
    f2 = rec("https://EX.com/p/1?utm_source=feed&page=1&gclid=g1",
             art2)

    src = str(tmp_path / "incoming")
    corpus_dir = str(tmp_path / "cid_corpus")
    schema = T.StructType([T.StructField("blob", T.BinaryType())])
    for name, blob in [("f1", f1), ("f2", f2)]:
        spark.createDataFrame([(blob,)], schema).coalesce(1) \
            .write.mode("overwrite").parquet(f"{src}/{name}")

    stream = (spark.readStream.format("parquet").schema(schema)
              .option("maxFilesPerTrigger", "1").load(f"{src}/*"))
    q = streaming_web_ingest(
        stream, corpus_dir, str(tmp_path / "ckpt"),
        cosine_threshold=0.999, n_cells=2,
        binary_blobs=True, canonical_ids=True)
    q.awaitTermination(240)

    rows = spark.read.parquet(corpus_dir).collect()
    assert len(rows) == 1, [(r.uri, r.text) for r in rows]
    assert rows[0].text == " ".join(art2.split())
    # provenance: the RAW re-crawl spelling, not the canonical one
    assert "utm_source" in rows[0].uri


def test_resolve_url_reference_cases(spark):
    """resolve_url (r15 — redirect-aware identity): RFC 3986 §5 cases
    real Location headers use. Absolute verbatim; scheme-relative gets
    the base scheme; root-relative the base authority; path-relative
    the base directory (no dot-segment normalization — documented);
    empty/NULL resolves to NULL; an authority-only base resolves
    root-relative refs against the bare host."""
    from pyspark_deduplication_spark.functions.urls import resolve_url

    cases = [
        (0, "https://a.com/x/y?q=1", "https://b.com/p"),
        (1, "https://a.com/x/y", "//cdn.com/z"),
        (2, "https://a.com/x/y", "/root"),
        (3, "https://a.com/x/y", "rel"),
        (4, "https://a.com/x/y", "  /sp  "),   # header whitespace
        (5, "https://a.com/x/y", ""),
        (6, "https://a.com/x/y", None),
        (7, "https://a.com", "/p"),
        (8, "http://u:p@a.com:8080/d/e", "/q"),  # authority intact
    ]
    from pyspark.sql import functions as F

    df = spark.createDataFrame(cases, "i long, b string, r string")
    got = {row.i: row.out for row in df.select(
        "i", resolve_url(F.col("b"), F.col("r")).alias("out"))
        .collect()}
    assert got[0] == "https://b.com/p"
    assert got[1] == "https://cdn.com/z"
    assert got[2] == "https://a.com/root"
    assert got[3] == "https://a.com/x/rel"
    assert got[4] == "https://a.com/sp"
    assert got[5] is None and got[6] is None
    assert got[7] == "https://a.com/p"
    assert got[8] == "http://u:p@a.com:8080/q"


def test_surt_key(spark):
    from pyspark_deduplication_spark.functions.urls import surt_key

    df = spark.createDataFrame(
        [(0, "https://www.Example.COM/a/b?q=1#f"),
         (1, "http://single/"),
         (2, "https://Example.com"),
         (3, "not-a-url")],
        "i long, u string")
    got = {r.i: r.s for r in
           df.select("i", surt_key(F.col("u")).alias("s")).collect()}
    assert got[0] == "com,example,www)/a/b"
    assert got[1] == "single)/"
    assert got[2] == "com,example)/"
    assert got[3] is None


def test_sitemap_entries_parse(spark):
    from pyspark_deduplication_spark.functions.urls import sitemap_entries

    urlset = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> https://a.com/1 </loc>
    <lastmod>2024-01-02</lastmod>
    <image:loc>https://cdn/i.png</image:loc>
  </url>
  <url><loc>https://a.com/2</loc></url>
  <url><lastmod>2024-01-03</lastmod></url>
</urlset>"""
    index = """<sitemapindex>
  <sitemap><loc>https://a.com/sitemap1.xml</loc></sitemap>
</sitemapindex>"""
    df = spark.createDataFrame([(0, urlset), (1, index), (2, None)],
                               "i long, xml string")
    got = {r.i: r.e for r in
           df.select("i", sitemap_entries(F.col("xml")).alias("e"))
           .collect()}
    assert [(e.loc, e.lastmod) for e in got[0]] == [
        ("https://a.com/1", "2024-01-02"),  # trimmed; decoy skipped
        ("https://a.com/2", None),          # lastmod optional
        (None, "2024-01-03"),               # loc-less block -> NULL
    ]
    assert got[1] == []   # index file: no <url> blocks
    assert got[2] is None
