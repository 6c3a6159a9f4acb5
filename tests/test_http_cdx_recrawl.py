"""HTTP response parsing, SURT/CDX index, and recrawl-scheduling tests:
adversarial record shapes, from-scratch estimator replay, and the
plan shapes the modules promise (map-side parse, one exchange for CDX).
"""

from __future__ import annotations

import math

import duckdb
import pytest
from pyspark.sql import functions as F

from don_crawler_spark.functions.http import parse_http_response
from don_crawler_spark.functions.urls import surt_key
from don_crawler_spark.operators.recrawl import LN2_NANO, revisit_schedule
from don_crawler_spark.sources.warc import cdx_index


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# HTTP response parsing
# ---------------------------------------------------------------------------

_RESPONSES = {
    # the plain case
    "plain": (
        "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        "Content-Length: 5\r\n\r\nhello"
    ),
    # reason phrase with spaces; header value with interior spaces and
    # trailing horizontal whitespace (must be trimmed)
    "spaces": (
        "HTTP/1.1 503 Service Unavailable\r\n"
        "Content-Type: text/html; charset=utf-8 \t\r\n\r\nx"
    ),
    # no reason phrase at all
    "noreason": "HTTP/1.1 204\r\nContent-Length: 0\r\n\r\n",
    # EMPTY header value: must come back '' (present), not swallow the
    # next line's token; next header must still parse
    "emptyval": (
        "HTTP/1.1 200 OK\r\nContent-Type:\r\nContent-Length: 2\r\n\r\nok"
    ),
    # duplicate header: FIRST occurrence wins
    "dup": (
        "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
        "Content-Type: smuggled/override\r\n\r\nbody"
    ),
    # body containing its own blank lines: split on the FIRST only
    "blankbody": (
        "HTTP/1.1 200 OK\r\n\r\nfirst\r\n\r\nsecond\r\n\r\nthird"
    ),
    # headerless response: status line, blank line, body
    "bare": "HTTP/1.1 404 Not Found\r\n\r\ngone",
    # malformed: no HTTP preamble -> null status, degrade don't abort
    "garbage": "<!DOCTYPE html><html>not a response</html>",
    # truncated: no blank line -> null body
    "truncated": "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n",
}


def test_http_parse_adversarial_shapes(spark) -> None:
    df = spark.createDataFrame(
        [(k, v) for k, v in _RESPONSES.items()], "name string, raw string"
    )
    rows = {
        r["name"]: r
        for r in df.select("name", *parse_http_response(F.col("raw"))).collect()
    }
    plain = rows["plain"]
    assert (plain["status_code"], plain["reason"]) == (200, "OK")
    assert plain["content_type"] == "text/html"
    assert plain["content_length"] == 5
    assert plain["n_headers"] == 2
    assert plain["body"] == "hello"

    sp = rows["spaces"]
    assert sp["reason"] == "Service Unavailable"
    assert sp["content_type"] == "text/html; charset=utf-8"
    assert sp["content_length"] is None

    nr = rows["noreason"]
    assert (nr["status_code"], nr["reason"]) == (204, "")
    assert nr["content_length"] == 0
    assert nr["body"] == ""

    ev = rows["emptyval"]
    assert ev["content_type"] == ""  # present-but-empty, not null
    assert ev["content_length"] == 2
    assert ev["body"] == "ok"

    assert rows["dup"]["content_type"] == "text/plain"

    bb = rows["blankbody"]
    assert bb["n_headers"] == 0
    assert bb["body"] == "first\r\n\r\nsecond\r\n\r\nthird"

    bare = rows["bare"]
    assert bare["content_type"] is None
    assert bare["body"] == "gone"

    g = rows["garbage"]
    assert g["status_code"] is None
    assert g["content_length"] is None

    assert rows["truncated"]["body"] is None


def test_http_parse_is_map_side(spark) -> None:
    df = spark.createDataFrame([("HTTP/1.1 200 OK\r\n\r\nx",)], "raw string")
    plan = _plan(df.select(*parse_http_response(F.col("raw"))))
    assert "Exchange" not in plan
    assert "Python" not in plan


# ---------------------------------------------------------------------------
# SURT + CDX
# ---------------------------------------------------------------------------


def test_surt_key_shapes(spark) -> None:
    cases = [
        ("https://www.Sub.Example.com:443/Path/X", "com,example,sub)/path/x"),
        ("http://example.com/", "com,example)/"),
        ("http://example.com", "com,example)/"),  # no path -> '/'
        ("https://a.b.c.d.org:8080/x?Q=1", "org,d,c,b,a)/x?q=1"),
        ("http://WWW.UPPER.NET/p", "net,upper)/p"),
        # ADVICE r4: query-bearing root URL — the '?' starts the path
        # remainder, never the host
        ("https://example.com?q=1", "com,example)/?q=1"),
        ("https://example.com:8080?q=1", "com,example)/?q=1"),
        # ADVICE r4: uppercase scheme must be stripped too
        ("HTTPS://WWW.Example.com/Path", "com,example)/path"),
        # fragment-bearing root URL
        ("http://example.com#frag", "com,example)/#frag"),
    ]
    df = spark.createDataFrame(cases, "url string, want string")
    bad = df.select(surt_key(F.col("url")).alias("got"), "want").where(
        F.col("got") != F.col("want")
    )
    assert bad.count() == 0


def test_cdx_offsets_are_per_file_running_sums(spark) -> None:
    # two files, interleaved seq; offsets must restart per file and
    # accumulate EARLIER records only
    rows = [
        # url, ts, mime, status, digest, filename, seq, rec_bytes
        ("http://a.com/1", "t1", "text/html", 200, "d1", "f0", 0, 100),
        ("http://a.com/2", "t2", "text/html", 200, "d2", "f0", 1, 250),
        ("http://a.com/3", "t3", "text/html", 200, "d3", "f0", 2, 50),
        ("http://b.com/1", "t4", "text/html", 200, "d4", "f1", 0, 999),
        ("http://b.com/2", "t5", "text/html", 200, "d5", "f1", 1, 1),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, warc_ts string, mime string, status_code int, "
        "digest string, filename string, seq long, rec_bytes long",
    )
    got = {
        (r["filename"], r["url"]): (r["offset"], r["length"])
        for r in cdx_index(df).collect()
    }
    assert got[("f0", "http://a.com/1")] == (0, 100)
    assert got[("f0", "http://a.com/2")] == (100, 250)
    assert got[("f0", "http://a.com/3")] == (350, 50)
    assert got[("f1", "http://b.com/1")] == (0, 999)
    assert got[("f1", "http://b.com/2")] == (999, 1)


def test_cdx_plan_one_exchange_no_python(spark) -> None:
    df = spark.createDataFrame(
        [("http://a.com/1", "t", "m", 200, "d", "f", 0, 10)],
        "url string, warc_ts string, mime string, status_code int, "
        "digest string, filename string, seq long, rec_bytes long",
    )
    plan = _plan(cdx_index(df))
    assert plan.count("Exchange") == 1  # the filename window, nothing else
    assert "Python" not in plan


# ---------------------------------------------------------------------------
# recrawl scheduling
# ---------------------------------------------------------------------------


def test_revisit_estimator_matches_from_scratch_replay(spark) -> None:
    """All seven (n=6, X) outcomes vs an independent math.log replay AND
    DuckDB's ln — the cross-engine determinism the oracle depends on."""
    rows = [
        (doc, k, k < x) for x in range(7) for doc in [x] for k in range(6)
    ]
    hist = spark.createDataFrame(rows, "doc_id long, k int, changed boolean")
    got = {
        r["doc_id"]: r
        for r in revisit_schedule(hist.select("doc_id", "changed"), 7).collect()
    }
    duck = dict(
        duckdb.sql(
            "SELECT x, CAST(round(-ln((6 - x + 0.5) / 6.5) / 7 * 1e9) AS BIGINT)"
            " FROM range(7) t(x)"
        ).fetchall()
    )
    for x in range(7):
        lam_py = -math.log((6 - x + 0.5) / 6.5) / 7 * 1e9
        r = got[x]
        assert r["n_checks"] == 6 and r["n_changed"] == x
        assert r["lambda_nano_per_day"] == round(lam_py) == duck[x]
        if x == 0:
            assert r["revisit_days"] == 365  # rate 0 -> ceiling, not abort
        else:
            expect = min(365, max(1, round(LN2_NANO / r["lambda_nano_per_day"])))
            assert r["revisit_days"] == expect
    # X == n at interval 7: half-life ln2/(ln13/7) = 1.89 days -> 2
    assert got[6]["revisit_days"] == 2
    # the 1-day floor needs a faster cadence: X == n at interval 1 gives
    # half-life 0.27 days, round -> 0, clamped up to 1
    fast = revisit_schedule(
        hist.where(F.col("doc_id") == 6).select("doc_id", "changed"), 1
    ).collect()[0]
    assert fast["revisit_days"] == 1


def test_revisit_shuffle_carries_two_ints(spark) -> None:
    hist = spark.createDataFrame(
        [(1, True), (1, False)], "doc_id long, changed boolean"
    )
    plan = _plan(revisit_schedule(hist))
    assert plan.count("Exchange") == 1
    assert "partial_count" in plan or "partial" in plan.lower()
    assert "Python" not in plan


# ---------------------------------------------------------------------------
# anchor text
# ---------------------------------------------------------------------------


def test_anchor_text_topk_semantics(spark) -> None:
    from don_crawler_spark.operators.graph import anchor_text_topk

    links = spark.createDataFrame(
        [
            # p1: 'docs' x3, 'home' x2, 'b' x1, 'a' x1 -> top3 docs,home,a
            ("s1", "p1", "docs"), ("s2", "p1", "docs"), ("s3", "p1", "docs"),
            ("s4", "p1", "home"), ("s5", "p1", "home"),
            ("s6", "p1", "b"), ("s7", "p1", "a"),
            # p2: tie between 'x' and 'y' -> anchor ASC breaks it
            ("s1", "p2", "y"), ("s2", "p2", "x"),
        ],
        "src string, dst string, anchor string",
    )
    rows = anchor_text_topk(links, k=3).collect()
    p1 = sorted(
        [(r["rank"], r["anchor"], r["cnt"]) for r in rows if r["dst"] == "p1"]
    )
    assert p1 == [(1, "docs", 3), (2, "home", 2), (3, "a", 1)]
    p1_meta = {(r["n_inlinks"], r["n_anchors"]) for r in rows if r["dst"] == "p1"}
    assert p1_meta == {(7, 4)}
    p2 = sorted(
        [(r["rank"], r["anchor"]) for r in rows if r["dst"] == "p2"]
    )
    assert p2 == [(1, "x"), (2, "y")]


def test_anchor_text_partial_agg_before_window(spark) -> None:
    """The skewed raw-inlink dimension must collapse in a partial agg
    BEFORE the dst window: the plan below the window's exchange carries
    a partial_count, and no Python appears anywhere."""
    from don_crawler_spark.operators.graph import anchor_text_topk

    links = spark.createDataFrame(
        [("s", "p", "a")], "src string, dst string, anchor string"
    )
    plan = _plan(anchor_text_topk(links))
    assert "partial_count" in plan
    assert "Python" not in plan
    # partial agg sits BELOW the first exchange (map-side combine)
    below_first_exchange = plan.split("Exchange")[-1]
    assert "partial_count" in below_first_exchange


def test_recrawl_frontier_rank_skew_shape_and_exactness(spark) -> None:
    """The salted two-phase top-k must EQUAL the single-window
    definition, and the plan must rank inside (host, salt) cells before
    the exact per-host window (two window exchanges, no Python)."""
    from don_crawler_spark.operators.recrawl import recrawl_frontier_rank

    # one hot host with 200 due urls + one cold host; cap 3
    rows = [(f"u{i:03d}", "hot", i % 7) for i in range(200)] + [
        ("c1", "cold", 5),
        ("c2", "cold", 9),
    ]
    due = spark.createDataFrame(rows, "url string, host string, overdue long")
    got = {
        (r["host"], r["recrawl_rank"]): (r["url"], r["overdue"])
        for r in recrawl_frontier_rank(due, cap=3).collect()
    }
    # single-window reference computed from scratch
    import hashlib

    ref = sorted(
        [r for r in rows if r[1] == "hot"],
        key=lambda r: (-r[2], hashlib.md5(r[0].encode()).hexdigest(), r[0]),
    )[:3]
    for i, (url, _h, od) in enumerate(ref, start=1):
        assert got[("hot", i)] == (url, od)
    assert got[("cold", 1)] == ("c2", 9)
    assert got[("cold", 2)] == ("c1", 5)
    assert ("cold", 3) not in got

    plan = _plan(recrawl_frontier_rank(due, cap=3))
    assert plan.count("Exchange") == 2  # cell window + exact window
    assert "Python" not in plan


# ---------------------------------------------------------------------------
# robots meta directives
# ---------------------------------------------------------------------------


def test_meta_robots_flags_edge_cases(spark) -> None:
    from don_crawler_spark.functions.metarobots import (
        followable_link_counts,
        meta_robots_flags,
    )

    cases = [
        # name, html, xrobots, want (noindex, nofollow, n_links, followable)
        ("none", "<p>plain</p>", None, (False, False, 0, 0)),
        (
            "classic",
            '<meta name="robots" content="noindex">',
            None,
            (True, False, 0, 0),
        ),
        (
            "order_b_upper",
            '<META CONTENT="NOFOLLOW" NAME="ROBOTS">',
            None,
            (False, True, 0, 0),
        ),
        (
            "none_token",
            '<meta name=robots content="none"><a href="/x">l</a>',
            None,
            (True, True, 1, 0),
        ),
        (
            "decoy_keywords",
            '<meta name="keywords" content="noindex"><a href="/x">l</a>',
            None,
            (False, False, 1, 1),
        ),
        (
            # directive must be a TOKEN: "nonexistent" contains "none"
            # as a substring but is no restriction
            "substring_trap",
            '<meta name="robots" content="nonexistent">',
            None,
            (False, False, 0, 0),
        ),
        (
            "header_only",
            '<a href="/x">l</a><a rel="nofollow" href="/y">m</a>',
            "noarchive, noindex",
            (True, False, 2, 1),
        ),
        (
            "multi_union",
            '<meta name="robots" content="noindex">'
            '<meta name="robots" content="nofollow">'
            '<a href="/x">l</a>',
            None,
            (True, True, 1, 0),
        ),
    ]
    df = spark.createDataFrame(
        [(n, h, x) for n, h, x, _ in cases],
        "name string, html string, xr string",
    )
    staged = df.select(
        "name", "html", *meta_robots_flags(F.col("html"), F.col("xr"))
    ).select(
        "name",
        "noindex",
        "nofollow",
        *followable_link_counts(F.col("html"), F.col("nofollow")),
    )
    got = {r["name"]: r for r in staged.collect()}
    for name, _h, _x, want in cases:
        r = got[name]
        assert (
            r["noindex"],
            r["nofollow"],
            r["n_links"],
            r["n_links_followable"],
        ) == want, name


def test_meta_robots_is_map_side(spark) -> None:
    from don_crawler_spark.functions.metarobots import meta_robots_flags

    df = spark.createDataFrame([("<p>x</p>",)], "html string")
    plan = _plan(df.select(*meta_robots_flags(F.col("html"))))
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_snapshot_diff_verdicts(spark) -> None:
    from don_crawler_spark.operators.recrawl import snapshot_diff

    prev = spark.createDataFrame(
        [("u1", "same"), ("u2", "old"), ("u3", "gone")],
        "url string, text string",
    )
    curr = spark.createDataFrame(
        [("u1", "same"), ("u2", "new"), ("u4", "fresh")],
        "url string, text string",
    )
    got = {
        r["url"]: (r["verdict"], r["prev_fp"] is None, r["curr_fp"] is None)
        for r in snapshot_diff(prev, curr).collect()
    }
    assert got == {
        "u1": ("unchanged", False, False),
        "u2": ("changed", False, False),
        "u3": ("removed", False, True),
        "u4": ("added", True, False),
    }


def test_snapshot_diff_text_never_crosses_exchange(spark) -> None:
    from don_crawler_spark.operators.recrawl import snapshot_diff
    from don_crawler_spark.sources.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents", respread=False)
    a = docs.selectExpr("CAST(doc_id AS STRING) AS url", "text")
    b = docs.selectExpr("CAST(doc_id AS STRING) AS url", "upper(text) AS text")
    plan = (
        snapshot_diff(a, b)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    # fingerprints are computed map-side; no exchange row carries text
    for frag in plan.split("Exchange hashpartitioning")[1:]:
        assert "text#" not in frag.split("\n")[0]


def test_cache_policy_precedence_and_edges(spark) -> None:
    from don_crawler_spark.functions.http import cache_policy

    rows = [
        # no-store wins over a present max-age for ttl; directive kept
        (0, "max-age=600, no-store", None, None, None),
        (1, "public, max-age=120", None, None, None),
        # expired page: Expires before Date clamps to 0, never negative
        (2, None, "Thu, 01 Jan 2026 00:00:00 GMT",
         "Thu, 01 Jan 2026 02:00:00 GMT", None),
        # heuristic: 100 days since Last-Modified -> 10 days ttl
        (3, None, None, "Sat, 11 Apr 2026 00:00:00 GMT",
         "Thu, 01 Jan 2026 00:00:00 GMT"),
        # present-but-unparseable Expires ("Expires: 0") = already
        # expired per RFC 9111 s5.3: ttl 0, never a fall-through
        (4, None, "0", "Thu, 01 Jan 2026 00:00:00 GMT",
         "Mon, 01 Dec 2025 00:00:00 GMT"),
        # ttl ceiling: a 10-year max-age caps at one year
        (5, "max-age=315360000", None, None, None),
        (6, None, None, None, None),
    ]
    df = spark.createDataFrame(
        rows, "id int, cc string, exp string, date string, lm string"
    )
    got = {
        r["id"]: (r["no_store"], r["max_age"], r["ttl_seconds"],
                  r["cache_policy"])
        for r in df.select(
            "id",
            *cache_policy(
                F.col("cc"), F.col("exp"), F.col("date"), F.col("lm")
            ),
        ).collect()
    }
    assert got[0] == (True, 600, 0, "no_store")
    assert got[1] == (False, 120, 120, "max_age")
    assert got[2] == (False, None, 0, "expires")
    assert got[3] == (False, None, 864000, "heuristic")
    assert got[4] == (False, None, 0, "expires")
    assert got[5] == (False, 315360000, 31536000, "max_age")
    assert got[6] == (False, None, None, "unknown")


def test_cache_policy_no_cache_forms(spark) -> None:
    from don_crawler_spark.functions.http import cache_policy

    rows = [
        # unqualified no-cache forces ttl 0 (distinct from no_store)
        (0, "no-cache, max-age=300"),
        # QUALIFIED no-cache="field" leaves the response cacheable
        (1, 'no-cache="Set-Cookie", max-age=3600'),
    ]
    df = spark.createDataFrame(rows, "id int, cc string")
    got = {
        r["id"]: (r["no_store"], r["ttl_seconds"], r["cache_policy"])
        for r in df.select(
            "id",
            *cache_policy(F.col("cc"), F.lit(None), F.lit(None), F.lit(None)),
        ).collect()
    }
    assert got[0] == (False, 0, "no_cache")
    assert got[1] == (False, 3600, "max_age")


def test_cache_policy_plan_is_map_side(spark) -> None:
    from don_crawler_spark.functions.http import cache_policy
    from don_crawler_spark.sources.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents", respread=False)
    plan = (
        docs.select(
            "doc_id",
            *cache_policy(F.col("text"), F.col("text"), F.col("text"),
                          F.col("text")),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
