"""Crawl-trap detection: URL-pattern-explosion signals per host.

Production crawlers bound their frontier against *traps* — generated URL
spaces that are syntactically infinite (calendar pages that link to the
next month forever, session-id query strings that mint a fresh URL per
request, symlink loops that repeat path segments without bound). The
reference bounds its universe by construction (a fixed org/repo listing,
scanner/gitlab.go's finite project enumeration), so it never needs this;
a web-tier crawl does, and the classic heuristics are public knowledge
(Heritrix's PathologicalPathDecideRule / TooManyPathSegmentsDecideRule,
Cho et al.'s crawl-ordering work on URL normalization).

Spark-first shape: every per-URL signal is a map-side codegen expression
over the scan (regex extract + array HOFs on the handful of path
segments — no Python, no explode); the host verdict is ONE
groupBy(host) whose shuffle rows carry only (host, five small ints), so
at 10^10 frontier URLs the exchange moves ~a hundred bytes per URL and
the heavy-hitter hosts (the traps themselves, by definition skewed)
collapse in the map-side partial agg before they travel. Thresholds are
integer-exact (ratios compared via cross-multiplication), so the same
verdict reproduces bit-for-bit in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Verdict thresholds (Heritrix-flavoured defaults).
MAX_SEG_REPEAT = 3          # a path segment repeating >= 3x => loop trap
MAX_PATH_DEPTH = 8          # deeper than 8 segments => pathological path
CALENDAR_MIN_URLS = 8       # >= this many dated URLs on one host
PARAM_EXPLOSION_RATIO = 4   # n_urls >= ratio * n_distinct_paths ...
PARAM_EXPLOSION_MIN = 12    # ... once the host has at least this many URLs


def _path_col(url):
    """URL path (query/fragment stripped), '/' when absent."""
    p = F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://[^/?#]*(/[^?#]*)?", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def url_trap_signals(
    pages: DataFrame, url: str = "url", host: str | None = None
) -> DataFrame:
    """Per-URL trap signals, all map-side codegen (zero exchanges).

    Appends to the input columns:
      host            lowercased authority (parsed unless ``host`` given)
      path            URL path, query/fragment stripped
      path_depth      number of non-empty path segments
      max_seg_repeat  occurrences of the most-repeated path segment
                      (/a/b/a/b/a -> 3): the symlink-loop signal
      n_query_params  '&'-separated parameter count (0 without a query)
      is_calendar     path carries a /YYYY/M(/D) date-shaped prefix
      url_len         raw URL length

    The segment-repeat count is an O(depth^2) array HOF over <=~16
    segments — trivially codegen-friendly and identical in DuckDB's
    list_transform/list_filter, which is what keeps the oracle exact.
    """
    u = F.col(url)
    out = pages
    if host is None:
        out = out.withColumn(
            "host",
            F.lower(F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)),
        )
    else:
        out = out.withColumn("host", F.lower(F.col(host)))
    out = out.withColumn("path", _path_col(u))
    segs = F.filter(F.split(F.col("path"), "/"), lambda s: s != "")
    rep = F.array_max(
        F.transform(segs, lambda s: F.size(F.filter(segs, lambda x: x == s)))
    )
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    return (
        out.withColumn("path_depth", F.size(segs).cast("int"))
        .withColumn(
            "max_seg_repeat", F.coalesce(rep, F.lit(0)).cast("int")
        )
        .withColumn(
            "n_query_params",
            F.when(query == "", F.lit(0))
            .otherwise(F.size(F.split(query, "&")))
            .cast("int"),
        )
        .withColumn(
            "is_calendar",
            F.col("path").rlike(r"/(19|20)[0-9]{2}/[0-9]{1,2}(/|$)"),
        )
        .withColumn("url_len", F.length(u).cast("int"))
    )


def host_trap_report(
    pages: DataFrame,
    url: str = "url",
    host: str | None = None,
    max_seg_repeat: int = MAX_SEG_REPEAT,
    max_path_depth: int = MAX_PATH_DEPTH,
    calendar_min: int = CALENDAR_MIN_URLS,
    explosion_ratio: int = PARAM_EXPLOSION_RATIO,
    explosion_min: int = PARAM_EXPLOSION_MIN,
) -> DataFrame:
    """Per-host trap verdicts over the discovered-URL set.

    ONE logical groupBy(host); Spark plans the countDistinct as the
    standard two-phase distinct agg — a map-side partial on
    (host, path-md5) first, so a trap host's URL flood (by definition
    few distinct paths) collapses to its distinct paths BEFORE anything
    travels, then the tiny (host) final. The shuffles carry
    (host, md5, five ints) — never URL text. Verdicts:

      path_loop        any URL repeats a path segment >= max_seg_repeat
      deep_paths       any URL exceeds max_path_depth segments
      calendar_trap    >= calendar_min date-shaped URLs on the host
      param_explosion  n_urls >= explosion_min AND
                       n_urls >= explosion_ratio * n_distinct_paths
                       (session-id minting: many URLs, few paths) —
                       integer cross-multiplied, engine-exact
      trapped          any of the above

    Returns (host, n_urls, n_paths, max_depth, worst_seg_repeat,
    n_calendar_urls, n_query_urls, path_loop, deep_paths, calendar_trap,
    param_explosion, trapped) sorted by the caller if needed.
    """
    sig = url_trap_signals(pages, url=url, host=host)
    per_url = sig.select(
        "host",
        F.md5(F.col("path")).alias("path_fp"),
        "path_depth",
        "max_seg_repeat",
        (F.col("n_query_params") > 0).cast("int").alias("has_query"),
        F.col("is_calendar").cast("int").alias("is_cal"),
    )
    agg = per_url.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.countDistinct("path_fp").alias("n_paths"),
        F.max("path_depth").alias("max_depth"),
        F.max("max_seg_repeat").alias("worst_seg_repeat"),
        F.sum("is_cal").alias("n_calendar_urls"),
        F.sum("has_query").alias("n_query_urls"),
    )
    path_loop = F.col("worst_seg_repeat") >= max_seg_repeat
    deep = F.col("max_depth") > max_path_depth
    cal = F.col("n_calendar_urls") >= calendar_min
    expl = (F.col("n_urls") >= explosion_min) & (
        F.col("n_urls") >= explosion_ratio * F.col("n_paths")
    )
    return agg.select(
        "host",
        "n_urls",
        "n_paths",
        "max_depth",
        "worst_seg_repeat",
        "n_calendar_urls",
        "n_query_urls",
        path_loop.alias("path_loop"),
        deep.alias("deep_paths"),
        cal.alias("calendar_trap"),
        expl.alias("param_explosion"),
        (path_loop | deep | cal | expl).alias("trapped"),
    )


TEMPLATE_TOPK = 3


def url_templates(
    pages: DataFrame, url: str = "url", k: int = TEMPLATE_TOPK
) -> DataFrame:
    """Per-host top-k URL path TEMPLATES — the generalization step that
    turns raw frontier URLs into crawl policy: long hex runs (session
    ids, cache busters) become ``{h}``, digit runs (post ids, dates)
    become ``{n}``. A host whose top template covers most of its URLs
    is structured (one crawl rule handles it); a host with no dominant
    template after generalization is the residual trap signal
    host_trap_report thresholds on.

    Hex generalizes BEFORE digits (hex runs contain digits); 16+ hex
    chars is the session-id shape, short hex stays literal. Both
    regexes are Java/RE2-identical so the DuckDB oracle replays the
    generalization byte-for-byte.

    Plan: map-side generalization, ONE (host, template) partial-agg
    shuffle (heavy-hitter templates collapse before traveling — the
    traps module's rule), then a per-host top-k window whose partition
    is the number of DISTINCT templates per host — bounded precisely
    BECAUSE generalization collapsed the exploding dimension (the
    anchor_text_topk argument). Ties (count DESC, template ASC).
    """
    from pyspark.sql import Window

    tpl = F.regexp_replace(
        F.regexp_replace(_path_col(F.col(url)), "(?i)[0-9a-f]{16,}", "{h}"),
        "[0-9]+",
        "{n}",
    )
    per = (
        pages.select(
            # SAME host regex as url_trap_signals (port stripped), so
            # the two trap surfaces join on identical host keys
            F.lower(
                F.regexp_extract(F.col(url), r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1)
            ).alias("host"),
            tpl.alias("template"),
        )
        .groupBy("host", "template")
        .agg(F.count(F.lit(1)).alias("n_urls"))
    )
    w = Window.partitionBy("host").orderBy(
        F.col("n_urls").desc(), F.col("template")
    )
    return (
        per.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("host", "rank", "template", "n_urls")
    )
