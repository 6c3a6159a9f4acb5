"""HTML main-text extraction — the crawl→webtext boundary.

A crawl tier's final product is TEXT, not markup: every downstream
operator in this repo (dedup, quality, tokenization, retrieval)
consumes the extracted page text. This module is the deterministic
tag-soup reducer that produces it (reference parity note: the Go
reference extracts description text from README markdown via
`internal/extract`; here the same concern is generalized to the HTML
pages a web crawl actually fetches — trafilatura-style extraction
reduced to its order-sensitive deterministic core):

1. **Block removal** — the whole ``<head>`` element (its text is page
   metadata: the title and description are surfaced as columns, never
   as body text), then ``<script>``/``<style>`` elements (their text is
   code, and may itself contain ``<``/``>``) and ``<!-- -->`` comments,
   as whole blocks, non-greedy per block.
2. **Tag strip** — every remaining ``<...>`` becomes a single space
   (word-boundary-preserving: ``a</p><p>b`` must not fuse to ``ab``).
3. **Entity decode** — the five predefined entities plus ``&nbsp;`` and
   the numeric forms of quote/apostrophe; ``&amp;`` is decoded LAST so
   freed ampersands never re-trigger earlier replacements (the
   sitemaps.py discipline). Decoding AFTER the tag strip is what makes
   ``&lt;tag&gt;`` survive as literal text instead of being eaten as
   markup.
4. **Whitespace collapse** — runs of blank characters fold to one
   space, ends trimmed.

Also surfaced: ``<title>`` and ``<meta name="description">`` — the two
per-page descriptors ranking/report queries want without re-parsing.

Scale: the whole ladder is chained codegen ``regexp_replace`` /
``regexp_extract`` over the page string — map-side only, zero
exchanges, zero Python. Regexes are restricted to constructs with
identical semantics in Java regex and RE2 (non-greedy + (?is) flags +
character classes; no backreferences, no lookaround) so a DuckDB
oracle replays byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Whole-block removals, non-greedy so adjacent blocks stay separate.
# <head> goes first and wholly: its text (title, inline metadata) is
# page METADATA, surfaced as dedicated columns, never body text.
_HEAD_RE = r"(?is)<head[^>]*>.*?</head>"
_SCRIPT_RE = r"(?is)<script[^>]*>.*?</script>"
_STYLE_RE = r"(?is)<style[^>]*>.*?</style>"
_COMMENT_RE = r"(?s)<!--.*?-->"
# A tag open must be followed by a letter (optionally after /) or '!'
# (doctype/markup declaration) — the WHATWG tokenizer rule; a bare
# '< 5 and 7 >' comparison in prose is text, not markup.
_TAG_RE = r"</?[A-Za-z!][^>]*>"
_WS_RE = r"[ \t\r\n]+"

_TITLE_RE = r"(?is)<title[^>]*>(.*?)</title>"
_META_DESC_RE = (
    r"""(?is)<meta\s+name\s*=\s*["']description["']\s+"""
    r"""content\s*=\s*["']([^"']*)"""
)

# (entity, replacement) in decode order; &amp; LAST (see module doc).
ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#34;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def _unescape(c: Column) -> Column:
    for ent, ch in ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def _collapse(c: Column) -> Column:
    return F.trim(F.regexp_replace(c, _WS_RE, " "))


def html_text_extract(html: Column) -> list[Column]:
    """Columns ``title``, ``meta_description``, ``text``, ``n_chars``
    for a page given its html. Empty title/description degrade to null
    (degrade-don't-drop); ``n_chars`` is the extracted-text length."""
    stripped = F.regexp_replace(html, _HEAD_RE, " ")
    stripped = F.regexp_replace(stripped, _SCRIPT_RE, " ")
    stripped = F.regexp_replace(stripped, _STYLE_RE, " ")
    stripped = F.regexp_replace(stripped, _COMMENT_RE, " ")
    stripped = F.regexp_replace(stripped, _TAG_RE, " ")
    text = _collapse(_unescape(stripped))
    title = _collapse(_unescape(F.regexp_extract(html, _TITLE_RE, 1)))
    desc = _collapse(_unescape(F.regexp_extract(html, _META_DESC_RE, 1)))
    return [
        F.nullif(title, F.lit("")).alias("title"),
        F.nullif(desc, F.lit("")).alias("meta_description"),
        text.alias("text"),
        F.length(text).alias("n_chars"),
    ]
