"""Crawl-trap detection (operators/traps.py): crafted-URL verdict
semantics plus plan-shape guarantees (map-side signals, partial-agg
collapse before the exchange, zero Python)."""

from __future__ import annotations

from don_crawler_spark.operators.traps import (
    host_trap_report,
    url_trap_signals,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_url_signals_crafted(spark) -> None:
    urls = spark.createDataFrame(
        [
            ("https://a.example/x/y/z?p=1&q=2#frag",),
            ("https://b.example",),  # no path at all -> '/'
            ("https://c.example/a/b/a/b/a/leaf",),  # 'a' repeats 3x
            ("https://d.example/archive/2019/7/",),  # calendar shape
            ("https://e.example/post-2019/7",),  # no leading /YYYY/: not calendar
        ],
        "url string",
    )
    rows = {r.url: r for r in url_trap_signals(urls).collect()}
    r = rows["https://a.example/x/y/z?p=1&q=2#frag"]
    assert (r.host, r.path, r.path_depth) == ("a.example", "/x/y/z", 3)
    assert (r.max_seg_repeat, r.n_query_params, r.is_calendar) == (1, 2, False)
    r = rows["https://b.example"]
    assert (r.path, r.path_depth, r.max_seg_repeat, r.n_query_params) == (
        "/", 0, 0, 0,
    )
    assert rows["https://c.example/a/b/a/b/a/leaf"].max_seg_repeat == 3
    assert rows["https://d.example/archive/2019/7/"].is_calendar
    assert not rows["https://e.example/post-2019/7"].is_calendar


def test_host_verdicts_crafted(spark) -> None:
    rows = []
    # loop.example: one symlink-loop URL among benign ones
    rows += [(f"https://loop.example/p/{i}",) for i in range(3)]
    rows += [("https://loop.example/a/b/a/b/a/x",)]
    # deep.example: 9 segments > MAX_PATH_DEPTH=8
    rows += [("https://deep.example/1/2/3/4/5/6/7/8/9",)]
    # cal.example: exactly CALENDAR_MIN_URLS=8 dated URLs (boundary: >=)
    rows += [(f"https://cal.example/2020/{m}/",) for m in range(1, 9)]
    # boundary.example: 7 dated URLs -> stays below the calendar gate
    rows += [(f"https://boundary.example/2020/{m}/",) for m in range(1, 8)]
    # mint.example: 12 URLs on 3 paths (>=12 and 12 >= 4*3, both at
    # the exact threshold: cross-multiplied integers, no rounding slack)
    rows += [(f"https://mint.example/p/{i % 3}?sid={i}",) for i in range(12)]
    # almost.example: 11 URLs on 2 paths -> under the explosion_min gate
    rows += [(f"https://almost.example/p/{i % 2}?sid={i}",) for i in range(11)]
    # ok.example: plain benign
    rows += [(f"https://ok.example/page/{i}",) for i in range(5)]
    rep = {
        r.host: r
        for r in host_trap_report(
            spark.createDataFrame(rows, "url string")
        ).collect()
    }
    assert rep["loop.example"].path_loop and rep["loop.example"].trapped
    assert not rep["loop.example"].deep_paths
    assert rep["deep.example"].deep_paths and rep["deep.example"].max_depth == 9
    assert rep["cal.example"].calendar_trap
    assert not rep["boundary.example"].calendar_trap
    assert not rep["boundary.example"].trapped
    m = rep["mint.example"]
    assert m.param_explosion and (m.n_urls, m.n_paths) == (12, 3)
    assert m.n_query_urls == 12
    assert not rep["almost.example"].param_explosion
    ok = rep["ok.example"]
    assert not ok.trapped
    assert (ok.path_loop, ok.deep_paths, ok.calendar_trap) == (
        False, False, False,
    )


def test_trap_plan_shape(spark) -> None:
    urls = spark.createDataFrame([("https://a.example/x/y",)], "url string")
    sig_plan = _plan(url_trap_signals(urls))
    assert "Exchange" not in sig_plan and "EvalPython" not in sig_plan
    rep_plan = _plan(host_trap_report(urls))
    assert "EvalPython" not in rep_plan
    # two-phase distinct agg: a map-side partial on (host, path_fp)
    # must sit BELOW the first exchange so trap-host URL floods collapse
    # to their distinct paths before anything travels
    assert rep_plan.count("Exchange") == 2
    # plan prints top-down: [1] is the final (host) exchange, [2] the
    # bottom (host, path_fp) one; a partial HashAggregate sits below it
    assert "path_fp" not in rep_plan.split("Exchange")[1].split("\n")[0]
    assert "path_fp" in rep_plan.split("Exchange")[2].split("\n")[0]
    below = rep_plan.split("Exchange")[-1]
    assert "HashAggregate" in below and "partial" in below


def test_url_templates_generalization_and_topk(spark) -> None:
    from don_crawler_spark.operators.traps import url_templates

    urls = [
        "https://a.example/post/1",
        "https://a.example/post/22",
        "https://a.example/post/333",
        # 32-hex session id -> {h}; short hex '/ab12' stays literal
        "https://a.example/s/0123456789abcdef0123456789abcdef",
        "https://a.example/ab12/x",
        "https://a.example/about",
        "https://b.example/",  # bare root -> '/'
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        (r["host"], r["rank"]): (r["template"], r["n_urls"])
        for r in url_templates(df, k=2).collect()
    }
    assert got[("a.example", 1)] == ("/post/{n}", 3)
    # ties at count 1 break by template string ascending ('o' < '{')
    assert got[("a.example", 2)] == ("/about", 1)
    assert got[("b.example", 1)] == ("/", 1)


def test_url_templates_hex_before_digits(spark) -> None:
    from don_crawler_spark.operators.traps import url_templates

    # a 16-hex run that is ALL digits must read {h}, not {n}
    df = spark.createDataFrame(
        [("https://h.example/t/1234567890123456",)], "url string"
    )
    assert url_templates(df).collect()[0]["template"] == "/t/{h}"
