"""Behavioral pins for the HTML main-text extractor
(functions/html.py): block-removal non-greediness, decode order,
head-vs-body separation, degrade semantics, and the map-side plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from don_crawler_spark.functions.html import html_text_extract
from don_crawler_spark.sources.tables import load

SF = "/root/testdata/sf0.001"


def _extract(spark, pages):
    df = spark.createDataFrame(pages, "id int, html string")
    out = df.select("id", *html_text_extract(F.col("html")))
    return {
        r["id"]: (r["title"], r["meta_description"], r["text"], r["n_chars"])
        for r in out.collect()
    }


def test_adjacent_blocks_removed_non_greedily(spark) -> None:
    # text BETWEEN two script blocks must survive: a greedy .* would
    # swallow everything from the first <script> to the last </script>
    got = _extract(
        spark,
        [(0, "<body><script>a()</script>keep<script>b()</script></body>")],
    )
    assert got[0][2] == "keep"


def test_decode_order_and_double_escapes(spark) -> None:
    got = _extract(
        spark,
        [
            # single-escaped tags become literal text (decode AFTER strip)
            (0, "<body>&lt;div&gt;</body>"),
            # double-escaped decodes exactly one level
            (1, "<body>&amp;lt;x&amp;gt; &amp;amp;</body>"),
            (2, "<body>a&nbsp;&nbsp;b</body>"),
            # numeric quote form decodes like &quot;
            (3, "<body>say &#34;hi&#34;</body>"),
        ],
    )
    assert got[0][2] == "<div>"
    assert got[1][2] == "&lt;x&gt; &amp;"
    # decoded nbsp runs collapse like any whitespace
    assert got[2][2] == "a b"
    assert got[3][2] == 'say "hi"'


def test_head_content_is_metadata_not_text(spark) -> None:
    got = _extract(
        spark,
        [
            (
                0,
                "<html><head><title> My  Title </title>"
                '<meta name="description" content=" a  summary ">'
                "<style>b{}</style></head><body>body text</body></html>",
            ),
            # no head, no title: both degrade to null, text still flows
            (1, "<html><body>plain</body></html>"),
            # empty title degrades to null rather than ""
            (2, "<html><head><title></title></head><body>x</body></html>"),
        ],
    )
    assert got[0] == ("My Title", "a summary", "body text", 9)
    assert got[1] == (None, None, "plain", 5)
    assert got[2][0] is None


def test_comment_hiding_markup_is_removed_wholly(spark) -> None:
    got = _extract(
        spark,
        [(0, "<body>a<!-- <script>evil()</script> <p>hidden</p> -->b</body>")],
    )
    # the comment and everything inside it vanish; a/b stay separate words
    assert got[0][2] == "a b"


def test_unclosed_angle_survives(spark) -> None:
    # a bare '<' with no closing '>' is text, not a tag
    got = _extract(spark, [(0, "<body>3 < 5 and 7 > 2</body>")])
    assert got[0][2] == "3 < 5 and 7 > 2"


def test_plan_is_map_side_only(spark) -> None:
    docs = load(spark, SF, "documents", respread=False)
    plan = (
        docs.select("doc_id", *html_text_extract(F.col("text")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
