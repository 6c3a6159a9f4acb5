"""URL canonicalization and identity — the engine's per-key semantics.

The reference serializes work per repository key ``host/owner/repo``
(``repoLockKey``, crawler/crawler.go:620-632) and uses the provider clone
URL as canonical identity (scanner/github.go:236-239,
scanner/bitbucket.go:78,139). At frontier scale the engine instead keys
everything on ``xxhash64(canonicalize(url))``; this module defines the
canonical form, both as a pure-Python kernel (oracle) and a vectorized
pandas UDF (engine). Both must agree byte-for-byte — tested.

Canonical form:
  * scheme and host lowercased
  * default ports stripped (``:80`` for http, ``:443`` for https)
  * fragment dropped
  * query keys sorted (stable sort; duplicate keys keep input order)
  * trailing ``/`` stripped from non-root paths; root path ``/`` dropped
  * relative references resolved against the source page's URL
"""

from __future__ import annotations

from urllib.parse import urljoin, urlsplit, urlunsplit, parse_qsl, urlencode

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url(url: str, base: str | None = None) -> str:
    """Pure-Python canonicalizer (oracle + UDF kernel)."""
    if base:
        url = urljoin(base, url)
    parts = urlsplit(url.strip())
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    if "@" in netloc:
        userinfo, _, hostport = netloc.rpartition("@")
        netloc = hostport  # drop credentials: never part of identity
    if ":" in netloc:
        host, _, port = netloc.rpartition(":")
        if _DEFAULT_PORTS.get(scheme) == port:
            netloc = host
    path = parts.path
    if path.endswith("/") and path != "/":
        path = path.rstrip("/")
    if path == "/":
        path = ""
    query = parts.query
    if query:
        pairs = parse_qsl(query, keep_blank_values=True)
        pairs.sort(key=lambda kv: kv[0])  # stable: dup keys keep input order
        query = urlencode(pairs)
    return urlunsplit((scheme, netloc, path, query, ""))


def url_host(url: str) -> str:
    """Host (no port) of an already-canonical URL."""
    netloc = urlsplit(url).netloc
    if ":" in netloc:
        return netloc.rpartition(":")[0]
    return netloc


def url_path(url: str) -> str:
    p = urlsplit(url).path
    return p if p else "/"


@F.pandas_udf(T.StringType())
def canonicalize_url_udf(url: pd.Series) -> pd.Series:
    return url.map(lambda u: canonicalize_url(u) if u is not None else None)


@F.pandas_udf(T.StringType())
def resolve_and_canonicalize_udf(href: pd.Series, base: pd.Series) -> pd.Series:
    return pd.Series(
        [
            canonicalize_url(h, b) if h is not None else None
            for h, b in zip(href, base)
        ]
    )


# --- hybrid canonicalization: JVM fast path + Python fallback ---------------
#
# The generic canonicalizer above needs real URL parsing (userinfo, ports,
# query re-encoding, dot segments) and stays a pandas UDF. But crawl link
# traffic is overwhelmingly two trivial shapes — absolute http(s) URLs and
# root-relative paths — which a handful of codegen'd regex expressions
# canonicalize byte-identically. Splitting the dataflow (not a CASE
# expression: Catalyst evaluates extracted Python UDFs for EVERY input row
# regardless of the branch taken, so a `when(simple, jvm).otherwise(udf)`
# would still ship all rows to Python) sends only the rare complex rows
# through a Python worker. Parity of both paths against canonicalize_url
# is pinned in tests/test_urls_hashing.py.

# conservative "simple" shapes: no query/fragment/userinfo/port/whitespace,
# ASCII host. Anything else falls back to the generic Python kernel.
#
# Two divergence traps the char classes must close (both confirmed against
# the Python oracle):
#   * dot segments: urljoin resolves '/a/../b' -> '/b'; the fast path
#     would emit it verbatim — reject any '.' / '..' path segment.
#   * non-ASCII whitespace: Java's \s is ASCII-only while the oracle's
#     str.strip() removes Unicode whitespace (U+00A0 etc) — restrict the
#     path class to printable ASCII (\x21-\x7e minus '?' '#') so anything
#     else falls back to Python.
# \z (not $): Java's $ matches BEFORE a final line terminator (\n, \r,
# U+0085, U+2028, U+2029), so '/p ' would pass an $-anchored check
# and skip the Python fallback that strips/keeps such chars correctly.
_NO_DOTSEG = r"(?!.*(?:^|/)\.\.?(?:/|\z))"
_PATH_CHAR = r"[\x21\x22\x24-\x3e\x40-\x7e]"  # printable ASCII minus ? #
_ABS_SIMPLE_RE = (
    r"^" + _NO_DOTSEG
    + r"[A-Za-z][A-Za-z0-9+.\-]*://[0-9A-Za-z.\-]+(/" + _PATH_CHAR + r"*)?\z"
)
# (?!/): a '//host/path' href is a protocol-relative network reference
# (urljoin swaps the authority), not a root-relative path — fallback.
_REL_SIMPLE_RE = r"^" + _NO_DOTSEG + r"/(?!/)" + _PATH_CHAR + r"*\z"


def _strip_trailing_slashes(path: Column) -> Column:
    # python kernel: path.rstrip('/') when it ends with '/', and bare '/'
    # becomes '' — regexp '/+$' -> '' reproduces both
    return F.regexp_replace(path, "/+$", "")


def _abs_fast(href: Column) -> Column:
    scheme = F.lower(F.regexp_extract(href, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    host = F.lower(F.regexp_extract(href, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/]*)", 1))
    path = F.regexp_extract(href, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/]*(/.*)?$", 1)
    return F.concat(scheme, F.lit("://"), host, _strip_trailing_slashes(path))


def _rel_fast(href: Column, base: Column) -> Column:
    scheme = F.lower(F.regexp_extract(base, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    host = F.lower(F.regexp_extract(base, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/]*)", 1))
    return F.concat(scheme, F.lit("://"), host, _strip_trailing_slashes(href))


def add_canonical_url_abs(df, url: str, out: str):
    """df + column ``out`` = canonicalize_url(url) for base-less absolute
    URLs (seed lists, frontiers): JVM fast path for the dominant simple
    shape, pandas-UDF fallback for the rest. Same split rationale and
    byte-parity contract as ``add_canonical_url`` (urljoin is the
    identity on the fast-path shapes, so the abs kernel serves both the
    with-base and base-less forms — pinned in tests)."""
    is_abs = F.coalesce(F.col(url).rlike(_ABS_SIMPLE_RE), F.lit(False))
    fast = df.filter(is_abs).withColumn(out, _abs_fast(F.col(url)))
    slow = df.filter(~is_abs).withColumn(
        out, canonicalize_url_udf(F.col(url))
    )
    return fast.unionByName(slow)


def add_canonical_url(df, href: str, base: str, out: str):
    """df + column ``out`` = canonicalize_url(href, base) — JVM expressions
    for simple shapes, pandas-UDF fallback for the rest (see module note).
    Row order is NOT preserved (two-branch union); callers re-establish
    order downstream, which the crawl round does by construction."""
    # coalesce to false so NULL href/base rows take exactly one branch
    # (the fallback) instead of failing both filters
    is_abs = F.coalesce(F.col(href).rlike(_ABS_SIMPLE_RE), F.lit(False))
    is_rel = F.coalesce(
        F.col(href).rlike(_REL_SIMPLE_RE) & F.col(base).rlike(_ABS_SIMPLE_RE),
        F.lit(False),
    )
    fast = df.filter(is_abs | is_rel).withColumn(
        out,
        F.when(is_abs, _abs_fast(F.col(href))).otherwise(
            _rel_fast(F.col(href), F.col(base))
        ),
    )
    slow = df.filter(~(is_abs | is_rel)).withColumn(
        out, resolve_and_canonicalize_udf(F.col(href), F.col(base))
    )
    return fast.unionByName(slow)


# --- JVM-side column helpers (no Python in the hot path) -------------------


def host_col(url: Column) -> Column:
    """Host of a canonical URL, JVM-side (codegen'd regexp)."""
    return F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)


def path_col(url: Column) -> Column:
    """Path of a canonical URL ('/' when empty), JVM-side."""
    p = F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def title_from_repository_name(name: Column) -> Column:
    """X2 — Go ``path.Base(name)`` (crawler/crawler.go:484-490)."""
    return F.element_at(F.split(name, "/"), -1)


def split_full_name(name: Column) -> tuple[Column, Column]:
    """X4 — ``common.SplitFullName`` (common/split_fullname.go:12-24):
    vendor = everything before the last '/', repo = last segment."""
    repo = F.element_at(F.split(name, "/"), -1)
    vendor = F.when(
        F.instr(name, "/") == 0, F.lit("")
    ).otherwise(F.regexp_replace(name, r"/[^/]*$", ""))
    return vendor, repo


def repo_lock_key(host: Column, name: Column) -> Column:
    """X5 — ``repoLockKey`` (crawler/crawler.go:620-632): host for empty
    names, host/name for single-segment names, host/first/second else."""
    parts = F.split(name, "/")
    return (
        F.when(name == "", host)
        .when(F.size(parts) < 2, F.concat_ws("/", host, name))
        .otherwise(F.concat_ws("/", host, parts[0], parts[1]))
    )


def ensure_description(
    description: Column, title: Column, name: Column
) -> Column:
    """X3 — ``ensureDescription`` (crawler/crawler.go:716-730): first
    non-empty of description, title, name, else the fixed fallback."""
    return F.coalesce(
        F.nullif(description, F.lit("")),
        F.nullif(title, F.lit("")),
        F.nullif(name, F.lit("")),
        F.lit("No description provided"),
    )


def surt_key(url: Column) -> Column:
    """SURT (Sort-friendly URI Reordering Transform) key — the sort key
    of Common Crawl's CDX capture index: reversed host components
    joined by commas, a ``)``, then the path, all lowercased; scheme,
    a leading ``www.`` label, and any port are dropped so the
    http/https/www variants of one resource sort adjacently.

        https://www.Sub.Example.com:443/Path -> com,example,sub)/path

    Pure codegen expressions (split/reverse/concat) — map-side, zero
    Python. Userinfo (``user@host``) is out of contract: the crawl's
    canonicalizer never emits it, and Common Crawl's own SURT drops
    captures carrying it.

    The input is lowercased BEFORE the scheme strip (an uppercase
    ``HTTPS://`` must not survive into the key), and the host stops at
    the first of ``/``, ``?`` or ``#`` — canonicalize_url emits
    query-bearing root URLs (``https://example.com?q=1``), whose SURT is
    ``com,example)/?q=1``: the query belongs to the path remainder, never
    the host.
    """
    rest = F.regexp_replace(F.lower(url), r"^[a-z][a-z0-9+.-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?#]+)", 1)
    host = F.regexp_replace(
        F.substring_index(hostport, ":", 1), r"^www\.", ""
    )
    remainder = F.substr(rest, F.length(hostport) + F.lit(1))
    path = (
        F.when(remainder == "", F.lit("/"))
        .when(remainder.startswith("/"), remainder)
        .otherwise(F.concat(F.lit("/"), remainder))
    )
    return F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        F.lit(")"),
        path,
    )
