"""sitemap.xml parsing: the crawl's canonical seed-discovery format.

Sitemaps (sitemaps.org protocol) are how hosts advertise their URL
inventory to crawlers; robots.txt points at them via ``Sitemap:``
lines. This module turns raw sitemap/sitemap-index XML bodies into
frontier-seed rows, relationally (split + regexp expressions, whole-
stage codegen, no Python and no XML library in the hot path — the
protocol's fixed ``<url>/<sitemap>`` + ``<loc>/<lastmod>`` shape makes
a full XML parser unnecessary and the regex form DuckDB-replayable).

Scale: one map-side explode per document; sitemap files are capped at
50k URLs by the protocol, so per-row fan-out is bounded. No shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# lazy inner match (not [^<]*): CMS sitemap plugins commonly wrap loc
# in CDATA, whose opener contains '<'; the wrapper is stripped after
_LOC = r"<loc>\s*(.*?)\s*</loc>"
_LASTMOD = r"<lastmod>\s*([^<]*?)\s*</lastmod>"


def _strip_cdata(c: Column) -> Column:
    return F.regexp_replace(
        F.regexp_replace(c, r"^<!\[CDATA\[\s*", ""), r"\s*\]\]>$", ""
    )


def _xml_unescape(c: Column) -> Column:
    """The five XML predefined entities; ``&amp;`` LAST so freed
    ampersands never re-trigger earlier replacements."""
    for ent, ch in [
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&amp;", "&"),
    ]:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return c


def _cdata_or_unescape(c: Column) -> Column:
    """CDATA content is literal per the XML spec — a title
    ``<![CDATA[use &amp; here]]>`` surfaces the five characters
    ``&amp;``, never ``&`` (ADVICE r4). Entity unescaping applies only
    to the non-CDATA branch."""
    return F.when(
        c.rlike(r"^<!\[CDATA\["), _strip_cdata(c)
    ).otherwise(_xml_unescape(c))


def parse_sitemaps(
    df: DataFrame, host_col: str = "host", xml_col: str = "xml"
) -> DataFrame:
    """(host, xml) -> one row per advertised URL: ``(host, loc,
    lastmod, is_index)``. ``is_index`` marks sitemap-INDEX entries
    (``loc`` then names another sitemap to fetch, not a page — the
    frontier treats those as recursive seed fetches)."""
    is_index = F.col(xml_col).contains("<sitemapindex")
    seg = F.explode(F.split(F.col(xml_col), "<url>|<sitemap>")).alias("seg")
    loc = F.regexp_extract("seg", _LOC, 1)
    lastmod = F.nullif(F.regexp_extract("seg", _LASTMOD, 1), F.lit(""))
    return (
        df.select(
            F.col(host_col).alias("host"), is_index.alias("is_index"), seg
        )
        .filter(loc != "")
        .select(
            "host",
            _cdata_or_unescape(loc).alias("loc"),
            lastmod.alias("lastmod"),
            "is_index",
        )
        .filter(F.col("loc") != "")
    )


def sitemap_urls_from_robots(
    df: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """Extract ``Sitemap:`` lines from raw robots.txt bodies ->
    ``(host, sitemap_url)``. Per RFC 9309 §2.3 these are group-
    independent (valid anywhere in the file), so no group logic —
    one explode + one case-insensitive match. The value keeps its own
    colons (``https://``): only the FIRST colon splits field/value."""
    line = F.regexp_replace(
        F.regexp_replace(F.col("raw"), "\r", ""), "#.*", ""
    )
    lines = (
        df.select(
            F.col(host_col).alias("host"),
            F.explode(F.split(F.col(text_col), "\n")).alias("raw"),
        )
        .select("host", line.alias("line"))
        # colon-less lines have no value: without this guard a bare
        # 'sitemap' line would emit itself as the URL
        .filter(F.instr("line", ":") > 0)
    )
    field = F.lower(F.trim(F.substring_index("line", ":", 1)))
    value = F.trim(
        F.col("line").substr(F.instr(F.col("line"), ":") + 1, F.length("line"))
    )
    return lines.filter((field == "sitemap") & (value != "")).select(
        "host", value.alias("sitemap_url")
    )


# RSS 2.0 items carry the URL as <link>text</link>; Atom entries as
# <link href="..."/>. Real Atom entries list rel="self"/"replies"
# links BEFORE the article link, so rel="alternate" (either attribute
# order) is preferred and the bare first-href is only the fallback.
# Titles may be CDATA-wrapped in both.
_RSS_LINK = r"<link>\s*(.*?)\s*</link>"
_ATOM_LINK = r"""<link[^>]*href\s*=\s*["']([^"']*)"""
_ATOM_ALT_RH = (
    r"""<link[^>]*rel\s*=\s*["']alternate["'][^>]*href\s*=\s*["']([^"']*)"""
)
_ATOM_ALT_HR = (
    r"""<link[^>]*href\s*=\s*["']([^"']*)["'][^>]*rel\s*=\s*["']alternate["']"""
)
_ITEM_TITLE = r"<title>\s*(.*?)\s*</title>"


def parse_feeds(feeds: DataFrame, xml: str = "xml") -> DataFrame:
    """RSS 2.0 / Atom feed parsing — the third discovery channel after
    links and sitemaps (news/blog hosts advertise fresh URLs in feeds
    long before sitemaps regenerate; news-crawl tiers poll feeds on the
    revisit schedule, exactly what crawl_revisit_priority emits for
    high-change-rate hosts).

    Input: one row per fetched feed with ``feed_url`` and the raw xml
    body. Output: one row per item/entry — (feed_url, kind rss|atom,
    item_url, title) — with CDATA stripping and XML entity unescaping
    (&amp; last) shared with the sitemap parser. Items without a
    parseable link are dropped; a feed that is neither RSS nor Atom
    contributes zero rows (degrade-don't-drop at the feed level is the
    caller's join).

    Relational like parse_sitemaps: split the body on the fixed
    ``<item>`` / ``<entry`` element openers (the channel prologue is
    slice 0, never an item), one regexp per field within each slice —
    map-side explode only, zero exchanges, no XML library.
    """
    x = F.col(xml)
    is_rss = x.contains("<rss") | x.contains("<channel>")
    is_atom = x.contains("<feed")

    def items(src: DataFrame, marker: str, kind: str, link_re: str) -> DataFrame:
        part = F.posexplode(F.split(x, marker))
        sliced = src.select(
            "feed_url", part.alias("pos", "chunk")
        ).filter(F.col("pos") > 0)
        raw = F.regexp_extract("chunk", link_re, 1)
        if kind == "atom":
            raw = F.coalesce(
                F.nullif(F.regexp_extract("chunk", _ATOM_ALT_RH, 1), F.lit("")),
                F.nullif(F.regexp_extract("chunk", _ATOM_ALT_HR, 1), F.lit("")),
                raw,
            )
        url = _cdata_or_unescape(raw)
        title = _cdata_or_unescape(
            F.regexp_extract("chunk", _ITEM_TITLE, 1)
        )
        return sliced.select(
            "feed_url",
            F.lit(kind).alias("kind"),
            url.alias("item_url"),
            F.nullif(title, F.lit("")).alias("title"),
        ).filter(F.col("item_url") != "")

    return items(feeds.filter(is_rss), "<item>", "rss", _RSS_LINK).unionByName(
        items(feeds.filter(is_atom & ~is_rss), "<entry", "atom", _ATOM_LINK)
    )
