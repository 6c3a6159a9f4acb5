"""HTTP/1.x response-record parsing — the WARC ``response`` half.

The WET reader (sources/warc.py) covers *conversion* records, whose
payload is extracted text. Common-Crawl-style ``response`` records
carry the raw HTTP exchange instead: a status line, a header block,
one blank line, then the entity body. This module parses that payload
shape with pure-JVM regex/substring expressions (whole-stage codegen,
zero Python), mirroring the crawl's own status/header pipeline
(reference: the Go crawler reads status + rate-limit headers off
net/http responses; here the same fields come out of stored bytes).

Semantics (RFC 7230/9112, narrowed to what a crawler consumes):

- status line ``HTTP/1.<minor> <code> [reason]`` — the reason phrase
  is optional (empty on e.g. ``HTTP/1.1 200``) and may contain spaces;
- header field names are case-INsensitive; when a field repeats, the
  FIRST occurrence wins (the conservative crawler choice for
  Content-Type/Content-Length: a smuggled duplicate cannot override
  what the origin sent first — pinned in tests);
- only horizontal whitespace is trimmed around values ([ \\t]*, not
  \\s* — \\s would swallow the CRLF of an empty-valued header and
  capture the next line's token, the same latent bug the WET reader's
  review pass fixed);
- the body is EVERYTHING after the first blank line — bodies may
  themselves contain ``\\r\\n\\r\\n`` (HTML with empty lines), so no
  further splitting;
- a malformed record (no HTTP/ preamble) degrades to null status, not
  a scan abort (try_cast; degrade-don't-drop, the repo-wide rule).

Scale: all columns are codegen string expressions over an
already-partitioned payload column — map-side only, zero exchanges,
zero Python. Obsolete line folding (RFC 9112 §5.2) is rejected by
proxies and absent from Common Crawl captures; documented out of
contract here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: columns produced by :func:`parse_http_response`
HTTP_FIELDS = [
    "status_code",
    "reason",
    "content_type",
    "content_length",
    "n_headers",
    "body",
]


def http_header(block: Column, name: str) -> Column:
    """First occurrence of header ``name`` (case-insensitive) in a
    CRLF-joined header block; null when absent, '' when empty-valued."""
    # value = rest of the physical line, trailing [ \t] trimmed; the
    # lazy [^\r\n]*? keeps interior spaces (e.g. "text/html;
    # charset=utf-8") while never crossing the line boundary
    extracted = F.regexp_extract(
        block, rf"(?mi)^{name}:[ \t]*([^\r\n]*?)[ \t]*(?:\r|$)", 1
    )
    # regexp_extract returns '' for no-match AND for a genuinely empty
    # value; disambiguate by probing for the bare field line (null
    # block -> null probe -> null result, the absent case)
    exists = F.regexp_extract(block, rf"(?mi)^{name}:", 0) != ""
    return F.when(exists, extracted)


def parse_http_response(raw: Column) -> list[Column]:
    """Parse one raw HTTP/1.x response (status line + headers + blank
    line + body) into typed columns. Pure codegen expressions."""
    # header block = status line + headers, up to the first blank line
    head = F.substring_index(raw, "\r\n\r\n", 1)
    status = F.regexp_extract(
        head, r"^HTTP/1\.[01] (\d{3})", 1
    ).try_cast("int")
    reason = F.regexp_extract(head, r"^HTTP/1\.[01] \d{3} ([^\r\n]*)", 1)
    # headers start after the status line
    hdr_block = F.nullif(
        F.regexp_replace(head, r"^HTTP/1\.[01][^\r\n]*\r\n?", ""), F.lit("")
    )
    n_headers = F.coalesce(
        F.size(
            F.filter(
                F.split(F.coalesce(hdr_block, F.lit("")), "\r\n"),
                lambda l: l.rlike("^[!#$%&'*+.^_`|~0-9A-Za-z-]+:"),
            )
        ),
        F.lit(0),
    )
    body = F.when(
        raw.contains("\r\n\r\n"),
        # everything after the FIRST blank line — substring by byte-safe
        # char offset (headers are ASCII, so char == byte offsets there)
        raw.substr(F.length(head) + F.lit(5), F.length(raw)),
    )
    return [
        status.alias("status_code"),
        F.when(status.isNotNull(), reason).alias("reason"),
        http_header(hdr_block, "Content-Type").alias("content_type"),
        http_header(hdr_block, "Content-Length")
        .try_cast("long")
        .alias("content_length"),
        n_headers.alias("n_headers"),
        body.alias("body"),
    ]


def format_http_response(
    status_code: Column,
    reason: Column,
    headers: Column,
    body: Column,
) -> Column:
    """Render a raw HTTP/1.1 response — exact inverse of
    :func:`parse_http_response` for well-formed inputs. ``headers`` is
    a pre-rendered CRLF-joined header block (may be '')."""
    return F.concat(
        F.lit("HTTP/1.1 "),
        status_code.cast("string"),
        F.when(reason != "", F.concat(F.lit(" "), reason)).otherwise(
            F.lit("")
        ),
        F.lit("\r\n"),
        F.when(headers != "", F.concat(headers, F.lit("\r\n"))).otherwise(
            F.lit("")
        ),
        F.lit("\r\n"),
        body,
    )


# --- soft-404 detection ------------------------------------------------------

#: error phrases whose presence in a 200 body marks it as a masked error
#: page (Bar-Yossef, Broder, Kumar & Tomkins 2004, "Sic transit gloria
#: telae": servers that answer 200 for vanished content). Lowercase;
#: matched as substrings of the lowercased body.
SOFT404_PHRASES = (
    "page not found",
    "file not found",
    "error 404",
    "404 error",
    "does not exist",
    "no longer available",
    "been removed",
)

#: bodies shorter than this AND containing a bare "404" token also flag
#: (minimal error templates carry little else).
SOFT404_TINY_BODY = 512


def soft404_flags(status_code: Column, body: Column) -> list[Column]:
    """Soft-404 signals + verdict, all map-side codegen (zero Python).

    A *soft 404* is a 200-status response whose content is actually an
    error page — the link is rotted but the server hides it, so a crawler
    that trusts the status code keeps recrawling and indexing garbage.
    Detection is the published heuristic family (error-phrase match,
    error-title match, tiny body + bare 404 token); the full Bar-Yossef
    method (probe a random sibling URL and compare templates) needs live
    fetches and is out of contract here.

    Returns [body_len, err_phrase, title_err, tiny_body, soft404,
    rot_class] where rot_class is 'hard404' (status 404/410),
    'soft404', or 'ok'. \\b404\\b is the Java-and-RE2-identical
    word-bounded form, so a DuckDB oracle reproduces it exactly.
    """
    low = F.lower(body)
    phrase = F.lit(False)
    for p in SOFT404_PHRASES:
        phrase = phrase | low.contains(p)
    title = F.lower(
        F.regexp_extract(body, r"(?is)<title[^>]*>(.*?)</title>", 1)
    )
    title_err = title.contains("not found") | title.rlike(r"\b404\b")
    body_len = F.length(body).cast("int")
    tiny = (body_len < SOFT404_TINY_BODY) & low.rlike(r"\b404\b")
    soft = (status_code == 200) & (phrase | title_err | tiny)
    hard = status_code.isin(404, 410)
    return [
        body_len.alias("body_len"),
        phrase.alias("err_phrase"),
        title_err.alias("title_err"),
        tiny.alias("tiny_body"),
        soft.alias("soft404"),
        F.when(hard, "hard404")
        .when(soft, "soft404")
        .otherwise("ok")
        .alias("rot_class"),
    ]


# RFC 9111 heuristic freshness fraction (1/10 of age since
# Last-Modified) and the 1-year ttl ceiling.
HEURISTIC_DIV = 10
TTL_CEILING = 31_536_000
# day-of-week tokens are format-only in Spark 3+ parsers, so the
# "Sun, " prefix is split off before parsing; the trailing GMT is
# rewritten to an explicit +0000 offset so the parsed INSTANT is
# session-timezone independent (a literal 'GMT' token would read the
# wall-clock in the session zone — wrong across DST transitions)
_HTTP_DATE_FMT = "dd MMM yyyy HH:mm:ss xx"


def cache_policy(
    cache_control: Column,
    expires: Column,
    date: Column,
    last_modified: Column,
) -> list[Column]:
    """RFC 9111 cache/freshness policy from response headers — what a
    recrawl scheduler reads before inventing its own revisit interval
    (a served max-age is the origin TELLING the crawler when content
    goes stale; crawl_revisit_priority's estimator is the fallback for
    servers that say nothing).

    Precedence (RFC 9111 §4.2): no-store / UNQUALIFIED no-cache force
    ttl 0 (the qualified ``no-cache="field"`` form leaves the response
    cacheable and does not) > ``max-age=N`` > ``Expires - Date``
    (clamped at 0 when already expired; a present-but-unparseable
    Expires — §5.3's "Expires: 0" — also reads as ttl 0) > the §4.2.2
    heuristic (age since Last-Modified over 10) > unknown (every
    header absent — null ttl, degrade-don't-drop). ttl capped at one year. HTTP-dates parse with
    try_to_timestamp (a malformed date falls through to the next rung,
    never aborts the scan).

    Columns: ``no_store`` (bool), ``max_age`` (the raw directive,
    null if absent), ``ttl_seconds``, ``cache_policy`` (no_store |
    no_cache | max_age | expires | heuristic | unknown). Exact integer seconds
    arithmetic; pure codegen, map-side only.
    """
    cc = F.coalesce(cache_control, F.lit(""))
    # no-store ONLY — the qualified form no-cache="field" restricts
    # specific headers and leaves the response cacheable, so no-cache
    # is detected separately and only in its UNQUALIFIED form
    no_store = cc.rlike(r"(?i)(^|[,\s])no-store($|[,\s])")
    no_cache = cc.rlike(r"(?i)(^|[,\s])no-cache\s*($|,)")
    max_age = F.regexp_extract(
        cc, r"""(?i)(?:^|[,\s])max-age\s*=\s*"?(\d+)""", 1
    ).try_cast("long")
    ts = lambda c: F.unix_timestamp(
        F.try_to_timestamp(
            F.replace(
                F.substring_index(c, ", ", -1), F.lit(" GMT"), F.lit(" +0000")
            ),
            F.lit(_HTTP_DATE_FMT),
        )
    )
    # RFC 9111 §5.3: a PRESENT but unparseable Expires (the ubiquitous
    # "Expires: 0") means already-expired — ttl 0, not a fall-through
    exp_invalid = expires.isNotNull() & ts(expires).isNull()
    exp_ttl = ts(expires) - ts(date)
    heur_ttl = (ts(date) - ts(last_modified)) / F.lit(HEURISTIC_DIV)
    ttl = (
        F.when(no_store | no_cache, F.lit(0).cast("long"))
        .when(max_age.isNotNull(), max_age)
        .when(exp_invalid, F.lit(0).cast("long"))
        .when(exp_ttl.isNotNull(), F.greatest(exp_ttl, F.lit(0)))
        .when(
            heur_ttl.isNotNull(),
            F.greatest(heur_ttl.cast("long"), F.lit(0)),
        )
    )
    policy = (
        F.when(no_store, "no_store")
        .when(no_cache, "no_cache")
        .when(max_age.isNotNull(), "max_age")
        .when(exp_invalid | exp_ttl.isNotNull(), "expires")
        .when(heur_ttl.isNotNull(), "heuristic")
        .otherwise("unknown")
    )
    return [
        no_store.alias("no_store"),
        max_age.alias("max_age"),
        # Spark's least() SKIPS nulls (least(null, cap) == cap — the
        # recrawl clamp trap), so the unknown-policy null must be
        # pinned before the ceiling is applied
        F.when(ttl.isNotNull(), F.least(ttl, F.lit(TTL_CEILING)))
        .cast("long")
        .alias("ttl_seconds"),
        policy.alias("cache_policy"),
    ]
