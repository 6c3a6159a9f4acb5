"""Behavioral tests for the winnowing fingerprint sketch
(operators/textstats.py winnow_sketch): the paper's detection guarantee
on crafted documents, an independent from-scratch replay, and the
map-side-only plan shape."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from don_crawler_spark.operators.textstats import WINNOW_K, WINNOW_W, winnow_sketch
from don_crawler_spark.sources.tables import load

SF = "/root/testdata/sf0.001"


def _replay(text: str, k: int, w: int) -> set[int]:
    toks = [t for t in text.split(" ") if t]
    if len(toks) < k:
        return set()
    grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [
        int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams
    ]
    n_win = max(len(hs) - w + 1, 1)
    return {min(hs[i : i + w]) for i in range(n_win)}


def test_winnow_matches_from_scratch_replay(spark) -> None:
    docs = load(spark, SF, "documents")
    rows = winnow_sketch(docs).collect()
    got: dict[int, set[int]] = {}
    for r in rows:
        got.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    texts = {r["doc_id"]: r["text"] for r in docs.select("doc_id", "text").collect()}
    expect = {
        did: fp
        for did, t in texts.items()
        if (fp := _replay(t, WINNOW_K, WINNOW_W))
    }
    assert got == expect
    # density sanity: the sketch is a real sparsification, not all grams
    total_grams = sum(
        max(len([t for t in t_.split() if t]) - WINNOW_K + 1, 0)
        for t_ in texts.values()
    )
    assert 0 < len(rows) < total_grams


def test_winnow_detection_guarantee(spark) -> None:
    """Any shared run of >= w + k - 1 tokens must share a fingerprint
    (Schleimer et al. 2003, the winnowing correctness property)."""
    shared = "alpha beta gamma delta epsilon zeta"  # 6 = w + k - 1 tokens
    docs = spark.createDataFrame(
        [
            (1, f"one two {shared} three four"),
            (2, f"nine eight seven {shared} six"),
            (3, "completely different words entirely here now"),
            (4, "tiny doc"),  # < k tokens -> no sketch at all
        ],
        "doc_id long, text string",
    )
    rows = winnow_sketch(docs).collect()
    by_doc: dict[int, set[int]] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert by_doc[1] & by_doc[2], "guaranteed shared fingerprint missing"
    assert not (by_doc[1] & by_doc[3])
    assert 4 not in by_doc


def test_winnow_plan_is_map_side_only(spark) -> None:
    plan = (
        winnow_sketch(load(spark, SF, "documents", respread=False))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_corpus_cube_stats_cells_and_rollups(spark) -> None:
    """CUBE semantics replayed from the base cells: every rollup level
    is the exact sum of its children; gid identifies the level."""
    from don_crawler_spark.operators.textstats import corpus_cube_stats

    docs = load(spark, SF, "documents")
    rows = corpus_cube_stats(docs).collect()
    by_gid: dict[int, dict] = {0: {}, 1: {}, 2: {}, 3: {}}
    for r in rows:
        by_gid[r["gid"]][(r["lang"], r["source"])] = (
            r["n_docs"], r["total_tokens"]
        )
    base = by_gid[0]
    # gid=1: source rolled up -> per-lang sums over base cells
    for (lang, src), (n, t) in by_gid[1].items():
        assert src is None
        cells = [v for (l, _), v in base.items() if l == lang]
        assert n == sum(c[0] for c in cells) and t == sum(c[1] for c in cells)
    # gid=2: lang rolled up
    for (lang, src), (n, t) in by_gid[2].items():
        assert lang is None
        cells = [v for (_, s), v in base.items() if s == src]
        assert n == sum(c[0] for c in cells) and t == sum(c[1] for c in cells)
    # gid=3: grand total
    [(k, (n, t))] = list(by_gid[3].items())
    assert k == (None, None)
    assert n == sum(c[0] for c in base.values())
    assert t == sum(c[1] for c in base.values())
    assert n == docs.count()


def test_corpus_cube_plan_single_exchange(spark) -> None:
    """Expand feeds ONE hash-aggregate pair: exactly one shuffle, with
    partial aggregation below it; no Python."""
    from don_crawler_spark.operators.textstats import corpus_cube_stats

    plan = (
        corpus_cube_stats(load(spark, SF, "documents", respread=False))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "Expand" in plan
    assert "EvalPython" not in plan


def test_script_profile_counts_and_dominance(spark) -> None:
    from don_crawler_spark.operators.textstats import script_profile

    docs = spark.createDataFrame(
        [
            (0, "hello мир"),          # latin 5, cyrillic 3 -> latin
            (1, "Привет world wide"),  # cyrillic 6, latin 9 -> latin
            (2, "汉字"),                # han only
            (3, "مرحبا 42"),           # arabic + digits
            (4, "  12 34 "),           # digits only: no script -> none
            (5, "abc АБВ"),            # 3 vs 3 tie -> priority latin
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_latin"], r["n_cyrillic"], r["n_han"], r["n_arabic"],
            r["n_digit"], r["dominant_script"],
        )
        for r in script_profile(docs).collect()
    }
    assert got[0] == (5, 3, 0, 0, 0, "latin")
    assert got[1] == (9, 6, 0, 0, 0, "latin")
    assert got[2] == (0, 0, 2, 0, 0, "han")
    assert got[3] == (0, 0, 0, 5, 2, "arabic")
    assert got[4] == (0, 0, 0, 0, 4, "none")
    assert got[5] == (3, 3, 0, 0, 0, "latin")


def test_script_profile_plan_is_map_side(spark) -> None:
    from don_crawler_spark.operators.textstats import script_profile

    plan = (
        script_profile(load(spark, SF, "documents", respread=False))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_vocab_growth_matches_cumulative_replay(spark) -> None:
    from don_crawler_spark.operators.textstats import vocab_growth_curve

    texts = {0: "a b a", 1: "b c", 2: "d d d", 3: "a e"}
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r["n_docs"]: (r["vocab_size"], r["n_tokens"])
        for r in vocab_growth_curve(docs, checkpoints=(1, 2, 3, 4)).collect()
    }
    # cumulative replay from scratch
    for n in (1, 2, 3, 4):
        toks = [
            t for d, s in texts.items() if d + 1 <= n for t in s.split()
        ]
        assert got[n] == (len(set(toks)), len(toks)), n


def test_vocab_growth_plan_no_window_no_python(spark) -> None:
    from don_crawler_spark.operators.textstats import vocab_growth_curve

    plan = (
        vocab_growth_curve(load(spark, SF, "documents", respread=False))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # no running-state construct: the curve is aggregates, not windows
    assert "Window" not in plan
    assert "EvalPython" not in plan


def test_vocab_growth_docs_past_last_checkpoint_are_excluded(spark) -> None:
    # a doc beyond the final checkpoint must be dropped, not crash the
    # ANSI [0]-on-empty-array trap (regression: surfaced at sf0.1,
    # where doc ids exceed the 1000-doc checkpoint ladder)
    from don_crawler_spark.operators.textstats import vocab_growth_curve

    docs = spark.createDataFrame(
        [(0, "a b"), (1, "c"), (5, "z z z")], "doc_id long, text string"
    )
    got = {
        r["n_docs"]: (r["vocab_size"], r["n_tokens"])
        for r in vocab_growth_curve(docs, checkpoints=(1, 2)).collect()
    }
    assert got == {1: (2, 2), 2: (3, 3)}
