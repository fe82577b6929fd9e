"""robots.txt group parsing: the REP operational subset
(``crawl.robots_star_rules``) against hand-built corner cases the
graded entry's arithmetic oracle can't isolate individually."""

from __future__ import annotations

from pyspark.sql import functions as F

from pyspark_deduplication_spark.crawl import robots_star_rules


def _rules(spark, body: str) -> set[str]:
    df = spark.createDataFrame([("d.com", body)],
                               "domain string, robots_txt string")
    return {r.prefix for r in robots_star_rules(df).collect()}


def test_multi_agent_run_shares_one_group(spark):
    body = ("User-agent: bingbot\n"
            "User-agent: *\n"
            "Disallow: /a\n"
            "Disallow: /b\n")
    assert _rules(spark, body) == {"/a", "/b"}


def test_non_star_group_does_not_leak(spark):
    body = ("User-agent: Googlebot\n"
            "Disallow: /private\n"
            "\n"
            "User-agent: *\n"
            "Disallow: /tmp\n")
    assert _rules(spark, body) == {"/tmp"}


def test_case_inline_comment_and_empty_disallow(spark):
    # Case-variant directive + inline comment still binds *; an empty
    # Disallow is allow-all and must yield no rule.
    body = ("USER-AGENT: *  # wildcard\n"
            "DISALLOW:\n"
            "Disallow: /x   # trailing comment\n")
    assert _rules(spark, body) == {"/x"}


def test_rules_before_any_group_drop(spark):
    body = ("Disallow: /orphan\n"
            "User-agent: *\n"
            "Disallow: /kept\n")
    assert _rules(spark, body) == {"/kept"}


def test_blank_lines_do_not_split_a_group(spark):
    # RFC 9309 drops the old blank-line group terminator: rules after
    # a blank still belong to the open group.
    body = ("User-agent: *\n"
            "\n"
            "Disallow: /after-blank\n")
    assert _rules(spark, body) == {"/after-blank"}


def test_second_star_group_merges(spark):
    body = ("User-agent: *\n"
            "Disallow: /a\n"
            "User-agent: Googlebot\n"
            "Disallow: /g\n"
            "User-agent: *\n"
            "Disallow: /z\n")
    assert _rules(spark, body) == {"/a", "/z"}


def test_comment_only_and_empty_body(spark):
    assert _rules(spark, "# nothing here\n\n") == set()
    assert _rules(spark, "") == set()


def test_multiple_domains_stay_separate(spark):
    df = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /a\n"),
         ("b.com", "User-agent: *\nDisallow: /b\n")],
        "domain string, robots_txt string")
    got = {(r.domain, r.prefix) for r in robots_star_rules(df).collect()}
    assert got == {("a.com", "/a"), ("b.com", "/b")}
