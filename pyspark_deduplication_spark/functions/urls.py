"""URL / domain canonicalization for crawl curation.

Web-scale training corpora key dedup, per-site caps
(``operators.sampling.cap_per_group``) and domain-level quality policies
on URLs — which arrive in wildly inconsistent spellings. These kernels
normalize them with pure native expressions (regex + string ops only, no
UDFs, map-only at any scale), in the Java-regex ∩ RE2 dialect the
engine's other cross-verified text kernels use, so every step is
DuckDB-oracle-checkable.

Canonicalization contract (documented, deterministic):

1. scheme and host lowercase; trailing dots stripped from the host
   (``example.com.`` is the DNS-root spelling of ``example.com``);
2. default ports dropped (``:80`` for http, ``:443`` for https);
   explicit non-default ports kept;
3. trailing slashes stripped from the path (``/a/b/`` ≡ ``/a/b``,
   root ``/`` ≡ empty);
4. query parameters split on ``&``, empties dropped, sorted
   byte-lexicographically, re-joined — param ORDER never distinguishes
   resources; param VALUES do, so they are preserved verbatim;
5. fragments dropped (client-side only);
6. userinfo kept verbatim (rare in crawls; stripping it would merge
   genuinely distinct fetch targets).

URLs without an absolute ``scheme://`` prefix canonicalize to NULL —
loud-by-construction for downstream counts.

``registrable_domain`` extracts the owner-registered domain (the
per-site cap key). A full Public Suffix List is a moving external
dataset; this uses the structural rule (last two labels) plus the
common two-part public suffixes (``co.uk``-style), covering the long
tail of real crawls — documented approximation, NOT a PSL mirror.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^\s*([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = r"^\s*[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"

# Common two-part public suffixes (PSL subset; see module docstring).
TWO_PART_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "co.in", "net.in", "org.in", "ac.in", "gov.in",
    "com.br", "net.br", "org.br", "gov.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.ar", "com.tr", "com.sg", "com.hk", "com.tw",
    "co.za", "co.nz", "co.kr", "co.th", "co.id",
]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def url_scheme(url: Column | str) -> Column:
    """Lowercased scheme; '' when the URL is not absolute."""
    return F.lower(F.regexp_extract(_c(url), _SCHEME_RE, 1))


def url_authority(url: Column | str) -> Column:
    """Raw authority (userinfo@host:port) between ``://`` and the first
    ``/``, ``?`` or ``#``."""
    return F.regexp_extract(_c(url), _AUTH_RE, 1)


def url_host(url: Column | str) -> Column:
    """Lowercased host with trailing (DNS-root) dots stripped."""
    auth = url_authority(url)
    host = F.regexp_extract(auth, r"^(?:[^@]*@)?([^:]*)", 1)
    return F.regexp_replace(F.lower(host), r"[.]+$", "")


def url_port(url: Column | str) -> Column:
    """Explicit port string ('' when absent)."""
    return F.regexp_extract(url_authority(url), r":([0-9]+)$", 1)


def url_userinfo(url: Column | str) -> Column:
    """userinfo ('' when absent)."""
    return F.regexp_extract(url_authority(url), r"^([^@]*)@", 1)


def url_path(url: Column | str) -> Column:
    """Path component, verbatim (may be '')."""
    return F.regexp_extract(_c(url), _PATH_RE, 1)


def url_query(url: Column | str) -> Column:
    """Query string after ``?`` and before ``#`` ('' when absent)."""
    return F.regexp_extract(_c(url), _QUERY_RE, 1)


# Tracking/analytics query parameters that never distinguish the
# fetched resource — the crawl-dedup convention: a re-crawl arriving
# through a campaign link (utm_*) or a social-share click id
# (fbclid/gclid/…) is the SAME page, and keying identity on the raw
# query would double-ingest it. Name-prefix match, case-insensitive,
# values irrelevant. Java∩RE2 dialect, anchored; a '^' prefix
# guarantees a param whose VALUE contains 'utm_source=' survives.
TRACKING_PARAM_RE = (
    r"(?i)^(?:utm_[a-z0-9]+|fbclid|gclid|dclid|msclkid|twclid"
    r"|yclid|igshid|mc_eid|mc_cid|_ga|_gl|ref_src|spm|s_kwcid)=")


def surt_key(url: Column | str) -> Column:
    """SURT-style sort key for a capture index (the CDX convention):
    lowercased host labels REVERSED and comma-joined, then ``)`` and
    the path — ``https://www.Example.com/a/b`` →
    ``com,example,www)/a/b`` — so captures sort domain-first and a
    range scan over one registrable domain is a contiguous index
    slice. Operational subset: host + path only (query/fragment
    dropped, no canonicalization beyond host lowercasing — feed
    ``canonicalize_url`` output when identity-grade keys are needed);
    '' path renders ``)/ ``-less as ``)/``. NULL for non-absolute
    input (no extractable host)."""
    host = F.lower(url_host(url))
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = url_path(url)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.when(host == "", F.lit(None).cast("string")).otherwise(
        F.concat(rev, F.lit(")"), path))


def sitemap_entries(xml: Column | str) -> Column:
    """Parse a ``<urlset>`` sitemap body into
    ``array<struct<loc:string, lastmod:string>>`` — the crawl
    discovery input that pairs with the robots.txt gate (sitemaps are
    how sites VOLUNTEER URLs; robots is how they withhold them).
    Native regexps only, map-only; the operational subset:

    - one struct per ``<url>…</url>`` block (non-greedy dotall split,
      so multi-line pretty-printed sitemaps work);
    - ``<loc>``/``<lastmod>`` values whitespace-trimmed; a missing or
      empty tag yields NULL (``lastmod`` is optional per the
      protocol);
    - the tag match is anchored on the literal ``<loc>`` opener, so
      namespaced decoys (``<image:loc>``, common in image sitemap
      extensions) never leak into the URL inventory;
    - ``<sitemapindex>`` index files yield an empty array (no
      ``<url>`` blocks) — recursing into child sitemaps is a fetch
      concern, not a parse concern.
    """
    blocks = F.regexp_extract_all(
        _c(xml), F.lit(r"(?s)<url>(.*?)</url>"), 1)

    def field(b: Column, tag: str) -> Column:
        v = F.regexp_extract(
            b, rf"(?s)<{tag}>\s*([^<]*?)\s*</{tag}>", 1)
        return F.when(v == "", F.lit(None).cast("string")).otherwise(v)

    return F.transform(
        blocks,
        lambda b: F.struct(field(b, "loc").alias("loc"),
                           field(b, "lastmod").alias("lastmod")))


def sorted_query(url: Column | str,
                 strip_tracking: bool = False) -> Column:
    """Query params sorted byte-lexicographically, empties dropped;
    ``strip_tracking`` additionally drops ``TRACKING_PARAM_RE``
    matches (utm_*/fbclid/… — the crawl-identity spelling)."""
    parts = F.filter(
        F.split(url_query(url), "&"), lambda p: p != F.lit("")
    )
    if strip_tracking:
        parts = F.filter(parts, lambda p: ~p.rlike(TRACKING_PARAM_RE))
    return F.array_join(F.array_sort(parts), "&")


def canonicalize_url(url: Column | str,
                     strip_tracking: bool = False) -> Column:
    """The full canonical spelling (see module contract); NULL for
    non-absolute input. ``strip_tracking=True`` drops tracking/
    analytics params from the query first (crawl identity — see
    ``TRACKING_PARAM_RE``); the default keeps them, preserving the
    original contract for analytics consumers who key on them."""
    u = _c(url)
    scheme = url_scheme(u)
    host = url_host(u)
    port = url_port(u)
    keep_port = F.when(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == ""),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    user = url_userinfo(u)
    user_at = F.when(user == "", F.lit("")).otherwise(
        F.concat(user, F.lit("@")))
    path = F.regexp_replace(url_path(u), r"/+$", "")
    q = sorted_query(u, strip_tracking=strip_tracking)
    q_part = F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q))
    return F.when(
        scheme != "",
        F.concat(scheme, F.lit("://"), user_at, host, keep_port,
                 path, q_part),
    )


def registrable_domain(url_or_host: Column | str, is_host: bool = False) -> Column:
    """Owner-registered domain: last two host labels, or three when the
    last two form a known two-part public suffix. '' for hosts with
    fewer labels than the rule needs.

    Approximation caveat (also in the module header): the suffix table
    is the common ``TWO_PART_SUFFIXES`` subset, NOT a full Public
    Suffix List mirror — hosts under a multi-part suffix absent from
    the table collapse to the suffix itself (e.g. two sites under an
    unlisted ``co.xx`` would merge), so per-domain caps keyed on this
    column can over-merge on exotic ccTLDs."""
    host = _c(url_or_host) if is_host else url_host(url_or_host)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    last3 = F.array_join(F.slice(labels, -3, 3), ".")
    is_two_part = last2.isin(*TWO_PART_SUFFIXES)
    return (
        F.when(n < 2, F.lit(""))
        .when(is_two_part & (n < 3), F.lit(""))
        .when(is_two_part, last3)
        .otherwise(last2)
    )


def resolve_url(base: Column | str, ref: Column | str) -> Column:
    """Resolve an HTTP ``Location`` reference against the URL of the
    response that carried it (RFC 3986 §5, the cases real redirects
    use) — the primitive redirect-aware crawl identity needs (VERDICT
    r14 item 7: a 301 from a campaign URL to the canonical page names
    the SAME document). Native expressions only, map-only:

    - absolute (``scheme://…``): taken verbatim;
    - scheme-relative (``//host/p``): base's scheme prepended;
    - root-relative (``/p``): base's scheme+authority prepended;
    - path-relative (``p``, ``../p``): resolved against the base's
      directory WITHOUT dot-segment normalization (documented
      approximation — real-world Location headers are overwhelmingly
      absolute or root-relative; a surviving ``..`` keeps the URL
      distinct rather than silently merging identities);
    - empty/NULL ref: NULL (a 3xx without a Location resolves nowhere).

    The result feeds ``canonicalize_url`` — resolution itself neither
    lowercases nor re-orders anything."""
    b, r = _c(base), _c(ref)
    r = F.trim(r)
    scheme = url_scheme(b)
    authority = F.regexp_extract(b, _AUTH_RE, 1)
    base_dir = F.regexp_replace(url_path(b), r"[^/]*$", "")
    base_dir = F.when(base_dir == "", F.lit("/")).otherwise(base_dir)
    return (
        F.when(r.isNull() | (r == ""), F.lit(None).cast("string"))
        .when(r.rlike(_SCHEME_RE), r)
        .when(r.startswith("//"), F.concat(scheme, F.lit(":"), r))
        .when(r.startswith("/"),
              F.concat(scheme, F.lit("://"), authority, r))
        .otherwise(F.concat(scheme, F.lit("://"), authority,
                            base_dir, r))
    )
