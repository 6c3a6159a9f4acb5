"""WET source reader/round-trip and robots.txt text-parser tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from don_crawler_spark.functions.robots import (
    apply_robots_filter,
    compile_rules,
    parse_robots_txt,
)
from don_crawler_spark.sources.warc import (
    format_wet_record,
    parse_wet_fields,
    read_wet,
    write_wet,
)

# ---------------------------------------------------------------------------
# WET
# ---------------------------------------------------------------------------

# payload 2 contains an embedded blank CRLF line: Content-Length slicing,
# not delimiter scanning, must recover it
_PAYLOADS = [
    "héllo wörld",
    "first line\r\n\r\nsecond paragraph after embedded blank line",
    "",
]


def _wet_bytes() -> bytes:
    out = ["WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n"]
    for i, p in enumerate(_PAYLOADS):
        body = p.encode("utf-8")
        out.append(
            "WARC/1.0\r\n"
            "WARC-Type: conversion\r\n"
            f"WARC-Target-URI: https://ex.com/p{i}\r\n"
            f"WARC-Date: 2026-08-0{i + 1}T00:00:00Z\r\n"
            "Content-Type: text/plain\r\n"
            f"Content-Length: {len(body)}\r\n\r\n" + p + "\r\n\r\n"
        )
    return "".join(out).encode("utf-8")


def test_read_wet_file(spark, tmp_path) -> None:
    d = tmp_path / "wet"
    d.mkdir()
    (d / "part0.warc.wet").write_bytes(_wet_bytes())
    rows = read_wet(spark, str(d)).orderBy("target_uri").collect()
    assert [r.payload for r in rows] == _PAYLOADS
    assert [r.target_uri for r in rows] == [
        f"https://ex.com/p{i}" for i in range(3)
    ]
    assert [r.content_length for r in rows] == [
        len(p.encode("utf-8")) for p in _PAYLOADS
    ]
    assert rows[0].warc_date == "2026-08-01T00:00:00Z"
    # warcinfo preamble dropped by default, kept with conversion_only=False
    assert read_wet(spark, str(d), conversion_only=False).count() == 4


def test_wet_record_roundtrip_exprs(spark) -> None:
    df = spark.createDataFrame(
        [(f"https://ex.com/{i}", "2026-01-01T00:00:00Z", p) for i, p in enumerate(_PAYLOADS)],
        "target_uri string, warc_date string, text string",
    )
    rec = df.select(
        "text",
        format_wet_record(
            F.col("target_uri"), F.col("warc_date"), F.col("text")
        ).alias("rec"),
    )
    back = rec.select("text", *parse_wet_fields(F.col("rec"))).collect()
    for r in back:
        assert r.payload == r.text
        assert r.warc_type == "conversion"
        assert r.content_length == len(r.text.encode("utf-8"))


def test_write_then_read_wet(spark, tmp_path) -> None:
    df = spark.createDataFrame(
        [(f"https://ex.com/{i}", "2026-01-02T03:04:05Z", f"doc {i} body ×{i}") for i in range(50)],
        "target_uri string, warc_date string, text string",
    ).repartition(4)
    out = str(tmp_path / "out_wet")
    write_wet(df, out)
    got = read_wet(spark, out)
    assert got.count() == 50
    joined = got.join(
        df.withColumnRenamed("text", "want"), "target_uri"
    ).filter(F.col("payload") != F.col("want"))
    assert joined.count() == 0


def test_read_wet_gzip(spark, tmp_path) -> None:
    """Real CC WET segments ship as .warc.wet.gz: the text source
    decompresses by extension (whole-file, one partition per file —
    gzip is not splittable, which matches WARC's per-segment
    parallelism), and record parsing is unchanged."""
    import gzip

    d = tmp_path / "wet_gz"
    d.mkdir()
    (d / "seg.warc.wet.gz").write_bytes(gzip.compress(_wet_bytes()))
    rows = read_wet(spark, str(d)).orderBy("target_uri").collect()
    assert [r.payload for r in rows] == _PAYLOADS


def test_read_wet_malformed_degrades(spark, tmp_path) -> None:
    """Garbage preamble, a record with no Content-Length, and an
    EMPTY-valued header must degrade to null fields — never abort the
    scan (ANSI cast) or capture the next line's token as a value."""
    d = tmp_path / "wet_bad"
    d.mkdir()
    (d / "bad.wet").write_bytes(
        b"garbage preamble not a record\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: conversion\r\n"
        b"WARC-Target-URI:\r\n"          # empty value
        b"WARC-Date: 2026-08-01T00:00:00Z\r\n\r\nxx\r\n\r\n"  # no Content-Length
        + _wet_bytes()
    )
    df = read_wet(spark, str(d))
    rows = df.orderBy("target_uri").collect()
    # the 3 good conversion records still parse exactly
    good = [r for r in rows if r.payload is not None]
    assert [r.payload for r in good] == _PAYLOADS
    # the malformed record is present but degraded, with NO cross-line
    # value capture (target_uri must not read 'WARC-Date:')
    bad = [r for r in rows if r.payload is None]
    assert len(bad) == 1
    assert bad[0].content_length is None
    assert bad[0].target_uri == ""


def test_read_warc_binary_corrupt_record_skipped(spark, tmp_path) -> None:
    from don_crawler_spark.sources.warc import read_warc_binary

    good_body = b"ok-payload"
    data = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://x/bad\r\n"
        b"Content-Length: abc\r\n\r\njunk\r\n\r\n"
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://x/good\r\n"
        + f"Content-Length: {len(good_body)}\r\n\r\n".encode()
        + good_body
        + b"\r\n\r\n"
    )
    d = tmp_path / "warc_bad"
    d.mkdir()
    (d / "c.warc").write_bytes(data)
    rows = read_warc_binary(spark, str(d)).collect()
    assert [(r.target_uri, bytes(r.payload)) for r in rows] == [
        ("https://x/good", good_body)
    ]


def test_parse_sitemaps_cdata_loc(spark) -> None:
    from don_crawler_spark.sources.sitemaps import parse_sitemaps

    xml = (
        "<urlset><url><loc><![CDATA[https://a.com/cdata?x=1&amp;y=2]]></loc>"
        "</url></urlset>"
    )
    df = spark.createDataFrame([("a.com", xml)], "host string, xml string")
    rows = parse_sitemaps(df).collect()
    # CDATA content is literal per the XML spec (ADVICE r4): the
    # wrapped '&amp;' surfaces as the five characters, not '&'
    assert [(r.loc, r.is_index) for r in rows] == [
        ("https://a.com/cdata?x=1&amp;y=2", False)
    ]


def test_sitemap_bare_line_not_a_url(spark) -> None:
    from don_crawler_spark.sources.sitemaps import sitemap_urls_from_robots

    df = spark.createDataFrame(
        [("a.com", "sitemap\nSitemap: https://a.com/s.xml\n")],
        "host string, robots_txt string",
    )
    assert [r.sitemap_url for r in sitemap_urls_from_robots(df).collect()] == [
        "https://a.com/s.xml"
    ]


def test_wet_streaming_ingest(spark, tmp_path) -> None:
    """WET drops -> streaming text source (record lineSep) -> pages
    parquet, exactly-once per file across re-runs."""
    from don_crawler_spark.streaming.ingest import ingest_wet_available

    drops = tmp_path / "drops"
    drops.mkdir()
    (drops / "d0.warc.wet").write_bytes(_wet_bytes())
    target = str(tmp_path / "pages")
    ckpt = str(tmp_path / "ckpt")
    ingest_wet_available(spark, str(drops), target, ckpt)
    got = spark.read.parquet(target)
    assert got.count() == 3  # warcinfo dropped
    assert set(got.columns) == {"url", "warc_ts", "text"}
    by_url = {r.url: r for r in got.collect()}
    assert by_url["https://ex.com/p0"].text == _PAYLOADS[0]
    assert by_url["https://ex.com/p1"].warc_ts is not None
    # second drain with the same checkpoint: d0 is NOT re-ingested, the
    # new drop is picked up
    (drops / "d1.warc.wet").write_bytes(_wet_bytes())
    ingest_wet_available(spark, str(drops), target, ckpt)
    assert spark.read.parquet(target).count() == 6


def test_read_warc_binary(spark, tmp_path) -> None:
    """Byte-true reader: binary payloads, including one that EMBEDS the
    record marker (the adversarial case the lineSep fast path cannot
    handle) and one with non-UTF8 bytes, recovered exactly."""
    from don_crawler_spark.sources.warc import read_warc_binary

    payloads = [
        b"plain ascii",
        b"evil WARC/1.0\r\n embedded marker",
        bytes(range(256)),  # arbitrary binary (fake image)
    ]
    recs = []
    for i, body in enumerate(payloads):
        recs.append(
            (
                "WARC/1.0\r\n"
                "WARC-Type: response\r\n"
                f"WARC-Target-URI: https://ex.com/b{i}\r\n"
                "WARC-Date: 2026-08-19T00:00:00Z\r\n"
                "Content-Type: application/octet-stream\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode()
            + body
            + b"\r\n\r\n"
        )
    d = tmp_path / "warc"
    d.mkdir()
    (d / "a.warc").write_bytes(b"".join(recs[:2]))
    (d / "b.warc").write_bytes(recs[2])
    rows = read_warc_binary(spark, str(d)).orderBy("target_uri").collect()
    assert [bytes(r.payload) for r in rows] == payloads
    assert [r.content_length for r in rows] == [len(p) for p in payloads]
    assert {r.warc_type for r in rows} == {"response"}
    assert rows[1].content_type == "application/octet-stream"


# ---------------------------------------------------------------------------
# plan shapes (repo convention: every operator asserts its scale story)
# ---------------------------------------------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_source_parse_plans(spark) -> None:
    """WET record parsing and sitemap parsing are pure map-side codegen
    (zero exchanges, zero Python); robots parsing shuffles only on its
    small keys (host/gid), never RangePartitioning, never Python."""
    import __spark_entry__ as em

    sf = "/root/testdata/sf0.001"
    wet = _plan(em.queries()["wet_record_roundtrip"](spark, sf))
    # the only exchange is the loader's round-robin re-spread; the
    # format/parse itself never keys a shuffle
    assert "hashpartitioning" not in wet.lower()
    assert "rangepartitioning" not in wet.lower()
    assert "Python" not in wet

    sm = _plan(em.queries()["sitemap_parse"](spark, sf))
    # union of the two doc shapes still parses map-side per branch
    assert "Exchange" not in sm and "Python" not in sm

    rb = _plan(em.queries()["robots_txt_parse"](spark, sf))
    assert "Python" not in rb
    assert "rangepartitioning" not in rb.lower()


# ---------------------------------------------------------------------------
# robots.txt parser
# ---------------------------------------------------------------------------

_FIXTURES = {
    # CRLF + comments + case-insensitive fields + multi-UA group
    "a.com": (
        "# banner\r\n"
        "USER-AGENT: googlebot\r\n"
        "User-agent: doncrawler\r\n"
        "Disallow: /private/\r\n"
        "Allow: /private/ok/\r\n"
    ),
    # exact UA group beats star: star rules must NOT apply
    "b.com": (
        "User-agent: *\n"
        "Disallow: /\n"
        "\n"
        "User-Agent: DonCrawler\n"
        "Allow: /api/\n"
    ),
    # no matching UA -> star group; badbot group ignored; empty Disallow
    # dropped; rule before any group ignored
    "c.com": (
        "Disallow: /orphan/\n"
        "User-agent: badbot\n"
        "Disallow: /\n"
        "User-agent: *\n"
        "Disallow:\n"
        "Disallow: /tmp/ # inline comment\n"
    ),
    # wildcard policy: trailing * stripped, interior * and $ dropped
    "d.com": (
        "User-agent: *\n"
        "Disallow: /search*\n"
        "Disallow: /a/*/b\n"
        "Disallow: /exact$\n"
        "Allow: /search/ok/\n"
    ),
    # no group matches at all -> no rules
    "e.com": "User-agent: badbot\nDisallow: /\n",
    # a BLANK line between UA lines terminates the run: doncrawler's
    # (empty) group must NOT merge with badbot's — nothing is blocked
    "f.com": "User-agent: doncrawler\n\nUser-agent: badbot\nDisallow: /\n",
    # same with a Sitemap: line as the separator
    "g.com": (
        "User-agent: doncrawler\nSitemap: https://g.com/s.xml\n"
        "User-agent: badbot\nDisallow: /\n"
    ),
}

_EXPECTED = {
    "a.com": {("/private/", False), ("/private/ok/", True)},
    "b.com": {("/api/", True)},
    "c.com": {("/tmp/", False)},
    "d.com": {("/search", False), ("/search/ok/", True)},
    "e.com": set(),
    "f.com": set(),
    "g.com": set(),
}


def _parse_robots_py(text: str, ua: str) -> set[tuple[str, bool]]:
    """From-scratch reference replay of the documented grammar."""
    groups: list[tuple[set[str], list[tuple[str, bool]]]] = []
    prev_ua = False
    for raw in text.split("\n"):
        line = raw.replace("\r", "").split("#")[0]
        if ":" not in line:
            prev_ua = False
            continue
        field, _, val = line.partition(":")
        field, val = field.strip().lower(), val.strip()
        if field == "user-agent":
            if not prev_ua:
                groups.append((set(), []))
            groups[-1][0].add(val.lower())
            prev_ua = True
        elif field in ("allow", "disallow"):
            prev_ua = False
            if groups and val:
                groups[-1][1].append((val, field == "allow"))
        else:
            prev_ua = False
    has_exact = any(ua in g[0] for g in groups)
    out: set[tuple[str, bool]] = set()
    for uas, rules in groups:
        if (ua in uas) if has_exact else ("*" in uas):
            for val, allow in rules:
                val = val[:-1] if val.endswith("*") else val
                if "*" in val or "$" in val:
                    continue
                out.add((val, allow))
    return out


def test_parse_robots_txt_grammar(spark) -> None:
    df = spark.createDataFrame(
        list(_FIXTURES.items()), "host string, robots_txt string"
    )
    got: dict[str, set] = {h: set() for h in _FIXTURES}
    for r in parse_robots_txt(df).collect():
        got[r.host].add((r.path_prefix, r.allow))
    assert got == _EXPECTED
    # and the documented grammar equals the from-scratch Python replay
    for h, text in _FIXTURES.items():
        assert _parse_robots_py(text, "doncrawler") == _EXPECTED[h], h


def test_parse_sitemaps(spark) -> None:
    from don_crawler_spark.sources.sitemaps import parse_sitemaps

    urlset = (
        '<?xml version="1.0" encoding="UTF-8"?>\n'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
        "<url><loc>https://a.com/x</loc><lastmod>2026-01-02</lastmod></url>\n"
        "<url><loc>  https://a.com/y?p=1&amp;q=2  </loc></url>\n"
        "<url><loc>https://a.com/amp&amp;lt;</loc></url>\n"
        "</urlset>"
    )
    index = (
        "<sitemapindex><sitemap><loc>https://b.com/s1.xml</loc>"
        "<lastmod>2026-03-01</lastmod></sitemap>"
        "<sitemap><loc>https://b.com/s2.xml</loc></sitemap></sitemapindex>"
    )
    df = spark.createDataFrame(
        [("a.com", urlset), ("b.com", index)], "host string, xml string"
    )
    rows = {(r.host, r.loc, r.lastmod, r.is_index) for r in parse_sitemaps(df).collect()}
    assert rows == {
        ("a.com", "https://a.com/x", "2026-01-02", False),
        ("a.com", "https://a.com/y?p=1&q=2", None, False),  # trimmed + unescaped
        ("a.com", "https://a.com/amp&lt;", None, False),  # &amp; decoded LAST
        ("b.com", "https://b.com/s1.xml", "2026-03-01", True),
        ("b.com", "https://b.com/s2.xml", None, True),
    }


def test_sitemap_urls_from_robots(spark) -> None:
    from don_crawler_spark.sources.sitemaps import sitemap_urls_from_robots

    df = spark.createDataFrame(
        [
            (
                "a.com",
                "User-agent: *\nDisallow: /x/\n"
                "Sitemap: https://a.com/sitemap.xml  # primary\n"
                "SITEMAP: https://cdn.a.com/s2.xml\nSitemap:\n",
            ),
            ("b.com", "User-agent: *\nAllow: /\n"),
        ],
        "host string, robots_txt string",
    )
    got = {(r.host, r.sitemap_url) for r in sitemap_urls_from_robots(df).collect()}
    assert got == {
        ("a.com", "https://a.com/sitemap.xml"),
        ("a.com", "https://cdn.a.com/s2.xml"),
    }


def test_crawl_delays_from_robots(spark) -> None:
    """Crawl-delay is group-scoped: the exact-UA group's delay wins
    over star's, invalid values ignored, max across selected groups,
    fractional seconds -> ms."""
    from don_crawler_spark.functions.robots import crawl_delays_from_robots

    df = spark.createDataFrame(
        [
            # exact group (0.5s) replaces star group (10s)
            (
                "a.com",
                "User-agent: *\nCrawl-delay: 10\n\n"
                "User-agent: doncrawler\nCrawl-delay: 0.5\n",
            ),
            # two selected star groups -> max; junk value ignored
            (
                "b.com",
                "User-agent: *\nCrawl-delay: 2\nUser-agent: *\n"
                "Crawl-delay: oops\nCrawl-delay: 3\n",
            ),
            ("c.com", "User-agent: *\nDisallow: /x/\n"),  # no delay
        ],
        "host string, robots_txt string",
    )
    got = {
        (r.host, r.crawl_delay_ms)
        for r in crawl_delays_from_robots(df).collect()
    }
    assert got == {("a.com", 500), ("b.com", 3000)}


def test_frontier_from_sitemaps(spark) -> None:
    from don_crawler_spark.plans.round import frontier_from_sitemaps
    from don_crawler_spark.sources.sitemaps import parse_sitemaps

    xml = (
        "<urlset><url><loc>https://a.com/p1</loc></url>"
        "<url><loc>https://a.com/p2</loc></url></urlset>"
    )
    idx = "<sitemapindex><sitemap><loc>https://a.com/s.xml</loc></sitemap></sitemapindex>"
    parsed = parse_sitemaps(
        spark.createDataFrame(
            [("a.com", xml), ("a.com", idx)], "host string, xml string"
        )
    )
    fr = frontier_from_sitemaps(parsed)
    rows = fr.collect()
    assert {r.url for r in rows} == {"https://a.com/p1", "https://a.com/p2"}
    assert all(r.depth == 0 and r.host == "a.com" for r in rows)
    # index entries are sitemap fetch targets, never frontier pages
    assert not any("s.xml" in r.url for r in rows)


def test_parse_feeds_filter(spark) -> None:
    """End-to-end: raw text -> rules -> longest-prefix frontier filter."""
    df = spark.createDataFrame(
        list(_FIXTURES.items()), "host string, robots_txt string"
    )
    rules = parse_robots_txt(df)
    compile_rules(rules)  # shape check: aggregates without error
    frontier = spark.createDataFrame(
        [
            ("a.com", "/private/secret"),   # denied
            ("a.com", "/private/ok/x"),     # allowed (longer allow wins)
            ("b.com", "/api/v1"),           # allowed (exact-UA group)
            ("b.com", "/other"),            # allowed (star group not selected)
            ("c.com", "/tmp/x"),            # denied
            ("e.com", "/anything"),         # allowed (no rules at all)
        ],
        "host string, path string",
    )
    allowed, denied = apply_robots_filter(frontier, rules)
    assert {(r.host, r.path) for r in denied.collect()} == {
        ("a.com", "/private/secret"),
        ("c.com", "/tmp/x"),
    }
    assert allowed.count() == 4


def test_revisit_records_digest_dedup(spark) -> None:
    from don_crawler_spark.sources.warc import revisit_records

    caps = spark.createDataFrame(
        [
            ("u/a", 10, "same bytes"),
            ("u/b", 20, "same bytes"),   # later, other URL: revisit -> u/a
            ("u/a", 30, "same bytes"),   # recrawl of u/a: revisit -> u/a@10
            ("u/a", 40, "new bytes"),    # content changed: fresh response
            ("u/c", 10, "tie bytes"),
            ("u/d", 10, "tie bytes"),    # same ts: url tie-break -> u/c
        ],
        "url string, warc_ts long, text string",
    )
    got = {
        (r["url"], r["warc_ts"]): (
            r["record_type"], r["refers_to_url"], r["refers_to_ts"]
        )
        for r in revisit_records(caps).collect()
    }
    assert got[("u/a", 10)] == ("response", None, None)
    assert got[("u/b", 20)] == ("revisit", "u/a", 10)
    assert got[("u/a", 30)] == ("revisit", "u/a", 10)
    assert got[("u/a", 40)] == ("response", None, None)
    assert got[("u/c", 10)] == ("response", None, None)
    assert got[("u/d", 10)] == ("revisit", "u/c", 10)


def test_revisit_records_plan_no_window_no_text_shuffle(spark) -> None:
    from don_crawler_spark.sources.warc import revisit_records
    from don_crawler_spark.sources.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents", respread=False)
    caps = docs.selectExpr(
        "CAST(doc_id AS STRING) AS url", "doc_id AS warc_ts", "text"
    )
    plan = (
        revisit_records(caps)._jdf.queryExecution().executedPlan().toString()
    )
    # struct-min aggregate with map-side partial combine, never a
    # per-digest window (hot digests would skew a window partition)
    assert "Window" not in plan
    assert "partial_min" in plan
    assert "EvalPython" not in plan
    for frag in plan.split("Exchange hashpartitioning")[1:]:
        assert "text#" not in frag.split("\n")[0]


def test_feed_parse_shapes(spark) -> None:
    from don_crawler_spark.sources.sitemaps import parse_feeds

    rss = (
        "<rss><channel><title>c</title><link>https://c.example</link>"
        "<item><title><![CDATA[Hello &amp; co]]></title>"
        "<link>https://a.example/p?x=1&amp;y=2</link></item>"
        "<item><link>https://a.example/q</link></item>"  # titleless item
        "</channel></rss>"
    )
    atom = (
        "<feed><entry><title>E1</title>"
        "<link rel='alternate' href='https://b.example/e1'/></entry>"
        "<entry><title>no link here</title></entry>"  # dropped
        "</feed>"
    )
    feeds = spark.createDataFrame(
        [("f1", rss), ("f2", atom), ("f3", "<html>nope</html>")],
        "feed_url string, xml string",
    )
    got = sorted(
        (r["feed_url"], r["kind"], r["item_url"], r["title"])
        for r in parse_feeds(feeds).collect()
    )
    assert got == [
        # CDATA title stays literal (XML spec, ADVICE r4); the
        # non-CDATA link still gets entity decoding
        ("f1", "rss", "https://a.example/p?x=1&y=2", "Hello &amp; co"),
        ("f1", "rss", "https://a.example/q", None),
        ("f2", "atom", "https://b.example/e1", "E1"),
    ]


def test_feed_parse_plan_is_map_side(spark) -> None:
    from don_crawler_spark.sources.sitemaps import parse_feeds
    from don_crawler_spark.sources.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents", respread=False)
    feeds = docs.selectExpr("CAST(doc_id AS STRING) AS feed_url", "text AS xml")
    plan = parse_feeds(feeds)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_feed_parse_atom_prefers_rel_alternate(spark) -> None:
    from don_crawler_spark.sources.sitemaps import parse_feeds

    atom = (
        "<feed><entry><title>Post</title>"
        "<link rel='replies' href='https://b.example/p1/comments'/>"
        "<link rel='self' href='https://api.b.example/feeds/1'/>"
        "<link href='https://b.example/p1' rel='alternate'/>"
        "</entry></feed>"
    )
    got = parse_feeds(
        spark.createDataFrame([("f", atom)], "feed_url string, xml string")
    ).collect()
    assert [(r["item_url"], r["title"]) for r in got] == [
        ("https://b.example/p1", "Post")
    ]
