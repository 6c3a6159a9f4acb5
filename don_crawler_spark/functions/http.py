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
