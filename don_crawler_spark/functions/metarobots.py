"""Robots META directives: the page-level indexing policy a crawler
must honour AFTER fetching (robots.txt gates the fetch itself;
``<meta name="robots">`` and the ``X-Robots-Tag`` response header gate
what may be indexed and which links may be followed — the public
Google/Bing robots-meta contract).

Semantics implemented:

- directives are comma-separated tokens, case-insensitive, whitespace
  trimmed: ``noindex``, ``nofollow``, ``none`` (= noindex + nofollow);
  anything else (``all``, ``noarchive``, ...) is no restriction here;
- multiple meta tags AND the header UNION their restrictions (most
  restrictive wins) — the standard conservative combination;
- attribute order inside the tag is free (``name`` before or after
  ``content``); attribute names are case-insensitive; values must be
  double-quoted or bare (the crawl canonicalizer's own output shape —
  single-quoted attrs are out of contract, documented);
- per-link ``rel="nofollow"`` drops that link from the followable set;
  a page-level nofollow drops them all.

Every expression is JVM codegen regex/array logic — zero Python, zero
exchanges — and every regex is restricted to the RE2-and-Java-identical
construct subset (no backreferences, no lookaround except none at all),
so the DuckDB oracle matches byte-for-byte (same discipline as
text_subword_tokens, operators/textstats.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# name=robots ... content="..."  /  content="..." ... name=robots
_META_A = (
    r'(?i)<meta\s[^>]*name\s*=\s*"?robots"?[^>]*'
    r'content\s*=\s*"([^"]*)"[^>]*>'
)
_META_B = (
    r'(?i)<meta\s[^>]*content\s*=\s*"([^"]*)"[^>]*'
    r'name\s*=\s*"?robots"?[^>]*>'
)
_ANCHOR = r"(?i)<a\s[^>]*>"
_NOFOLLOW_REL = r'(?i)rel\s*=\s*"?nofollow'


def _directive_set(html: Column, xrobots: Column | None) -> Column:
    """All directive tokens from every robots meta tag plus the header,
    lowercased and trimmed, as one array."""
    metas = F.concat(
        F.regexp_extract_all(html, F.lit(_META_A), 1),
        F.regexp_extract_all(html, F.lit(_META_B), 1),
    )
    if xrobots is not None:
        metas = F.concat(metas, F.array(F.coalesce(xrobots, F.lit(""))))
    joined = F.lower(F.array_join(metas, ","))
    return F.transform(F.split(joined, ","), lambda t: F.trim(t))


def meta_robots_flags(
    html: Column, xrobots: Column | None = None
) -> list[Column]:
    """``[noindex, nofollow]`` boolean columns — the unioned policy of
    every robots meta tag in ``html`` and (optionally) an
    ``X-Robots-Tag`` header value column."""
    toks = _directive_set(html, xrobots)

    def _has(*names: str) -> Column:
        return F.exists(
            toks, lambda t: t.isin(*names)  # noqa: B023 — bound per call
        )

    return [
        _has("noindex", "none").alias("noindex"),
        _has("nofollow", "none").alias("nofollow"),
    ]


def followable_link_counts(
    html: Column, page_nofollow: Column
) -> list[Column]:
    """``[n_links, n_links_followable]`` — total anchor tags and those a
    polite crawler may follow (page-level nofollow drops them all;
    otherwise per-link ``rel=nofollow`` tags are excluded)."""
    tags = F.regexp_extract_all(html, F.lit(_ANCHOR), 0)
    n_links = F.size(tags).cast("long")
    kept = F.size(
        F.filter(tags, lambda t: ~t.rlike(_NOFOLLOW_REL))
    ).cast("long")
    return [
        n_links.alias("n_links"),
        F.when(page_nofollow, F.lit(0).cast("long"))
        .otherwise(kept)
        .alias("n_links_followable"),
    ]
