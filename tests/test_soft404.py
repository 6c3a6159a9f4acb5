"""Soft-404 detection (functions/http.py soft404_flags): crafted edge
shapes beyond the registry row's nine classes, plus plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from don_crawler_spark.functions.http import soft404_flags


def _run(spark, rows):
    df = spark.createDataFrame(rows, "status int, body string")
    out = df.select(
        "status", "body", *soft404_flags(F.col("status"), F.col("body"))
    )
    return out.collect()


def test_soft404_edges(spark) -> None:
    rows = [
        # multiline, case-varied title across lines ((?is) must span)
        (200, "<TITLE>\nPage NOT Found\n</TITLE>" + "x" * 600),
        # title attribute junk before '>'
        (200, '<title class="t">error 404</title>' + "x" * 600),
        # 404 token at start/end boundaries of the tiny body
        (200, "404"),
        # 404 embedded in a word: no flag even in a tiny body
        (200, "see E404X"),
        # phrase present but status already hard: rot_class = hard404
        (404, "page not found"),
        # 410 Gone
        (410, "x" * 600),
        # honest empty body
        (200, ""),
    ]
    got = _run(spark, rows)
    by_body = {r.body[:12]: r for r in got}
    r = by_body["<TITLE>\nPage"]
    assert r.title_err and r.soft404 and r.rot_class == "soft404"
    r = by_body['<title class']
    assert r.title_err and r.soft404
    r = by_body["404"]
    assert r.tiny_body and r.soft404
    r = by_body["see E404X"]
    assert not r.tiny_body and not r.soft404 and r.rot_class == "ok"
    r = by_body["page not fou"]
    assert r.err_phrase and not r.soft404 and r.rot_class == "hard404"
    assert by_body["xxxxxxxxxxxx"].rot_class == "hard404"
    r = by_body[""]
    assert r.body_len == 0 and r.rot_class == "ok"


def test_soft404_plan_is_map_side(spark) -> None:
    df = spark.createDataFrame([(200, "x")], "status int, body string")
    out = df.select(*soft404_flags(F.col("status"), F.col("body")))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan
