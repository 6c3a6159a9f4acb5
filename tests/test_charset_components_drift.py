"""Behavioral pins for the three newest operators: the WHATWG charset
sniff ladder (functions/charset.py), host-graph connected components
(operators/graph.components), and corpus unigram drift
(operators/textstats.corpus_drift_topk). Each gets a crafted-input
semantics test, an independent from-scratch replay where arithmetic is
involved, and a plan-shape assertion."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from don_crawler_spark.functions.charset import charset_sniff
from don_crawler_spark.operators.graph import components
from don_crawler_spark.operators.textstats import corpus_drift_topk
from don_crawler_spark.sources.tables import load

SF = "/root/testdata/sf0.001"


def _sniff(spark, rows):
    df = spark.createDataFrame(rows, "id int, html string, ctype string")
    out = df.select("id", *charset_sniff(F.col("html"), F.col("ctype")))
    return {r["id"]: (r["encoding"], r["charset_source"]) for r in out.collect()}


def test_charset_ladder_precedence(spark) -> None:
    base = "<html><head><title>t</title></head><body>x</body></html>"
    got = _sniff(
        spark,
        [
            # BOM outranks a contradicting header label
            (0, "﻿" + base, "text/html; charset=latin2"),
            # header outranks an in-page meta
            (1, '<meta charset="big5">' + base, "text/html; charset=EUC-KR"),
            # meta charset chosen when header has no charset param
            (2, '<meta charset="Windows-1252">' + base, "text/html"),
            # http-equiv is the last declared rung
            (
                3,
                '<meta http-equiv="Content-Type" '
                'content="text/html; charset=Shift_JIS">' + base,
                None,
            ),
            # nothing declared -> utf-8 default
            (4, base, None),
        ],
    )
    assert got[0] == ("utf-8", "bom")
    assert got[1] == ("euc-kr", "header")
    assert got[2] == ("windows-1252", "meta")
    assert got[3] == ("shift_jis", "meta_http_equiv")
    assert got[4] == ("utf-8", "default")


def test_charset_alias_folding_and_prescan_window(spark) -> None:
    pad = "x" * 1100
    got = _sniff(
        spark,
        [
            # WHATWG alias groups fold to their canonical label
            (0, "", "text/html; charset=ISO-8859-1"),
            (1, "<meta charset=utf8><body>x</body>", None),
            (2, "", 'text/html;charset="SJIS"'),
            # unknown labels pass through lowercased, never error
            (3, "", "text/html; charset=KOI8-R"),
            # a meta past the 1024-char prescan window is ignored
            (
                4,
                "<html><head><!-- " + pad + ' --><meta charset="big5">'
                "</head><body>x</body></html>",
                None,
            ),
            # unquoted and single-quoted attribute forms both parse
            (5, "<meta charset=big5><body>x</body>", None),
            (6, "<meta charset='latin1'><body>x</body>", None),
        ],
    )
    assert got[0] == ("windows-1252", "header")
    assert got[1] == ("utf-8", "meta")
    assert got[2] == ("shift_jis", "header")
    assert got[3] == ("koi8-r", "header")
    assert got[4] == ("utf-8", "default")
    assert got[5] == ("big5", "meta")
    assert got[6] == ("windows-1252", "meta")


def test_charset_prescan_skips_comments(spark) -> None:
    # ADVICE r4: WHATWG's prescan skips comment constructs — a
    # commented-out declaration inside the window must NOT be honored
    got = _sniff(
        spark,
        [
            # closed comment wrapping the meta -> ignored
            (
                0,
                '<html><head><!-- <meta charset="big5"> --></head>'
                "<body>x</body></html>",
                None,
            ),
            # commented meta followed by a real one -> real one wins
            (
                1,
                '<head><!-- <meta charset="big5"> -->'
                '<meta charset="utf8"></head>',
                None,
            ),
            # unclosed comment suppresses the rest of the window
            (2, '<head><!-- oops <meta charset="big5"></head>', None),
            # commented http-equiv is skipped the same way
            (
                3,
                '<head><!-- <meta http-equiv="Content-Type" '
                'content="text/html; charset=Shift_JIS"> --></head>',
                None,
            ),
        ],
    )
    assert got[0] == ("utf-8", "default")
    assert got[1] == ("utf-8", "meta")
    assert got[2] == ("utf-8", "default")
    assert got[3] == ("utf-8", "default")


def test_charset_plan_is_map_side_only(spark) -> None:
    docs = load(spark, SF, "documents", respread=False)
    plan = (
        docs.select(
            "doc_id", *charset_sniff(F.col("text"), F.lit("text/html"))
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_components_crafted_graph(spark) -> None:
    # component {1,2,3,4} as a chain (diameter 3), component {7,9},
    # and a self-contained pair {10,11} reached via a reversed edge
    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (7, 9), (11, 10)], "src long, dst long"
    )
    out = {
        r["host"]: (r["component_id"], r["n_members"], r["is_rep"])
        for r in components(edges).collect()
    }
    assert out == {
        1: (1, 4, True),
        2: (1, 4, False),
        3: (1, 4, False),
        4: (1, 4, False),
        7: (7, 2, True),
        9: (7, 2, False),
        10: (10, 2, True),
        11: (10, 2, False),
    }


def test_components_labels_are_iteration_order_free(spark) -> None:
    # a long chain converges to the same min label whether propagation
    # starts from either end (max_iters well above the diameter)
    chain = [(i, i + 1) for i in range(20, 30)]
    out = components(
        spark.createDataFrame(chain[::-1], "src long, dst long")
    ).collect()
    assert {r["component_id"] for r in out} == {20}
    assert sum(r["is_rep"] for r in out) == 1
    assert all(r["n_members"] == 11 for r in out)


def _drift_replay(texts_a, texts_b, k=50):
    ca: Counter = Counter()
    cb: Counter = Counter()
    for t in texts_a:
        ca.update(w for w in t.split(" ") if w)
    for t in texts_b:
        cb.update(w for w in t.split(" ") if w)
    vocab = set(ca) | set(cb)
    na, nb, v = sum(ca.values()), sum(cb.values()), len(vocab)
    rows = [
        (
            tok,
            ca[tok],
            cb[tok],
            (ca[tok] + 1) * (nb + v) - (cb[tok] + 1) * (na + v),
        )
        for tok in vocab
    ]
    rows.sort(key=lambda r: (-abs(r[3]), r[0]))
    # the engine emits the exact cross-product as its decimal string
    return [(t, a, b, str(s)) for t, a, b, s in rows[:k]]


def test_corpus_drift_matches_counter_replay(spark) -> None:
    # doc_id parity defines the slices; craft asymmetric vocabularies
    texts = [
        (0, "alpha alpha beta shared"),
        (1, "gamma gamma gamma shared"),
        (2, "alpha beta beta shared"),
        (3, "delta shared shared"),
    ]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    got = [
        (r["token"], r["n_a"], r["n_b"], r["shift_num"])
        for r in corpus_drift_topk(docs).collect()
    ]
    want = _drift_replay(
        [t for i, t in texts if i % 2 == 0],
        [t for i, t in texts if i % 2 == 1],
    )
    assert got == want
    # sign convention: slice-A-heavy tokens positive, B-heavy negative
    by_tok = dict((t, int(s)) for t, _, _, s in got)
    assert by_tok["alpha"] > 0 and by_tok["gamma"] < 0


def test_corpus_drift_plan_is_topk_not_global_sort(spark) -> None:
    plan = (
        corpus_drift_topk(load(spark, SF, "documents", respread=False))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan
    # the totals frame joins back broadcast, never shuffles the vocab
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
