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
