"""Character-encoding sniffing for fetched pages — the WHATWG ladder.

A crawler that stores ``html`` bytes must decide an encoding before any
text extraction; Common-Crawl-scale corpora mix labelled and unlabelled
legacy encodings. This module implements the deterministic detection
ladder from the WHATWG Encoding/HTML standards, narrowed to what a
batch pipeline consumes (reference parity note: the Go reference
fetches via net/http and relies on Go's charset handling when reading
README/publiccode payloads — `internal/extract` operates on decoded
text; here the *decision* itself is surfaced as a first-class column):

1. **BOM** — a leading U+FEFF (the UTF-8 BOM after byte decode) forces
   utf-8 and outranks every declared label (WHATWG Encoding §4.2).
2. **Transport header** — the ``charset=`` parameter of the
   Content-Type header.
3. **In-page prescan** — ``<meta charset=...>`` within the first
   ``prescan`` (default 1024) characters, mirroring the spec's
   1024-byte prescan window; a declaration *after* the window is
   deliberately ignored. Two documented approximations vs WHATWG
   (ADVICE r4): the window is counted in decoded *characters*, not
   raw bytes (the engine operates on already-decoded text columns;
   for the ASCII-dominated ``<head>`` prefix the two coincide), and
   comment handling is regex-based — closed ``<!-- -->`` blocks
   inside the window are stripped before the meta scan (the spec's
   prescan skips comment constructs, so a commented-out declaration
   must NOT be honored), and an unclosed ``<!--`` suppresses the
   rest of the window, like the spec's bogus-comment skip-to-end.
4. **http-equiv prescan** — ``<meta http-equiv="Content-Type"
   content="...charset=...">`` within the same window.
5. **Default** — utf-8 (the modern-web prior).

Extracted labels are lowercased and folded through the WHATWG alias
groups that matter at corpus scale (latin1/ascii family -> windows-1252,
utf8 -> utf-8, sjis family -> shift_jis); unknown labels pass through
lowercased rather than erroring (degrade-don't-drop, the repo-wide
rule).

Scale: every column is a codegen substring/regexp expression over the
page prefix — map-side only, zero exchanges, zero Python. The regexes
are restricted to constructs with identical semantics in Java regex and
RE2 (the same discipline as functions/http.py and the subword
tokenizer) so a DuckDB oracle replays byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (?i) + character classes + optional quotes only: Java/RE2-identical.
_HEADER_RE = r"""(?i)charset\s*=\s*["']?([A-Za-z0-9._\-]+)"""
_META_RE = r"""(?i)<meta\s+charset\s*=\s*["']?([A-Za-z0-9._\-]+)"""
_EQUIV_RE = (
    r"""(?i)<meta\s+http-equiv[^>]*charset\s*=\s*["']?([A-Za-z0-9._\-]+)"""
)

# WHATWG alias groups (the ones that dominate real corpora). Labels are
# matched lowercased; anything unlisted passes through unchanged.
_ALIASES = {
    "windows-1252": (
        "iso-8859-1",
        "latin1",
        "us-ascii",
        "ascii",
        "cp1252",
        "x-cp1252",
        "windows-1252",
    ),
    "utf-8": ("utf8", "utf-8", "unicode-1-1-utf-8"),
    "shift_jis": ("shift_jis", "shift-jis", "sjis", "x-sjis", "ms_kanji"),
    "iso-8859-2": ("iso-8859-2", "latin2", "iso8859-2"),
}


def _normalize(label: Column) -> Column:
    out = F.lower(label)
    for canon, aliases in _ALIASES.items():
        out = F.when(F.lower(label).isin(*aliases), F.lit(canon)).otherwise(
            out
        )
    return out


def charset_sniff(
    html: Column, content_type: Column, prescan: int = 1024
) -> list[Column]:
    """Columns ``encoding`` (canonical lowercase label) and
    ``charset_source`` (bom | header | meta | meta_http_equiv |
    default) for a page given its decoded html and the Content-Type
    header value (nullable)."""
    window = F.substring(html, 1, prescan)
    # WHATWG's prescan tokenizer skips comment constructs: a
    # commented-out <meta charset> must not win. Strip closed comment
    # blocks inside the window, then blank everything after an unclosed
    # '<!--' (the window cut a comment in half \u2014 its content, including
    # any meta the full page closes later, is not scannable text).
    scanned = F.regexp_replace(window, r"(?s)<!--.*?-->", "")
    scanned = F.regexp_replace(scanned, r"(?s)<!--.*$", "")
    bom = F.substring(html, 1, 1) == "\ufeff"
    hdr = F.regexp_extract(F.coalesce(content_type, F.lit("")), _HEADER_RE, 1)
    meta = F.regexp_extract(scanned, _META_RE, 1)
    equiv = F.regexp_extract(scanned, _EQUIV_RE, 1)
    encoding = (
        F.when(bom, F.lit("utf-8"))
        .when(hdr != "", _normalize(hdr))
        .when(meta != "", _normalize(meta))
        .when(equiv != "", _normalize(equiv))
        .otherwise(F.lit("utf-8"))
    )
    source = (
        F.when(bom, F.lit("bom"))
        .when(hdr != "", F.lit("header"))
        .when(meta != "", F.lit("meta"))
        .when(equiv != "", F.lit("meta_http_equiv"))
        .otherwise(F.lit("default"))
    )
    return [encoding.alias("encoding"), source.alias("charset_source")]
