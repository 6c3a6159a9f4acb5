"""Behavioral + plan-shape tests for the retrieval/chunking/BPE-pair
operators (operators/retrieval.py bm25_topk, operators/pipeline.py
sliding_chunks, operators/textstats.py bpe_pair_stats): crafted-input
exactness vs independent from-scratch Python replays, and plan
assertions (chunking is map-side only; the top-k operators end in
TakeOrderedAndProject and carry no Python UDF)."""

from __future__ import annotations

import math
import re

from don_crawler_spark.operators import pipeline as PL
from don_crawler_spark.operators import retrieval as RT
from don_crawler_spark.operators import textstats as TS
from don_crawler_spark.sources.tables import load

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- BM25 -------------------------------------------------------------------


def _bm25_replay(corpus, terms, k1=1.2, b=0.75):
    """Independent from-scratch BM25 (+1 idf), integer-scaled per-term
    contributions summed exactly — mirrors the operator's contract."""
    toks = {d: t.split() for d, t in corpus}
    n_docs = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n_docs
    df = {q: sum(1 for t in toks.values() if q in t) for q in terms}
    out = {}
    for d, t in toks.items():
        raw_i, n_terms = 0, 0
        for q in terms:
            tf = t.count(q)
            if tf == 0:
                continue
            n_terms += 1
            idf = math.log(1.0 + (n_docs - df[q] + 0.5) / (df[q] + 0.5))
            w = ((idf * tf) * (k1 + 1.0)) / (
                tf + k1 * ((1.0 - b) + b * len(t) / avgdl)
            )
            raw_i += int(round(w * 1e9))
        if n_terms:
            out[d] = (n_terms, round(raw_i / 1e9, 6))
    return out


def test_bm25_crafted_matches_replay(spark) -> None:
    corpus = [
        (1, "merge sort merge join window"),  # tf(merge)=2, window=1
        (2, "customer table scan"),
        (3, "the quick brown fox"),  # no query terms -> absent
        (4, "window window window window window window"),  # long, saturating
        (5, "merge"),  # shortest doc, dl boost
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_terms"], r["bm25"])
        for r in RT.bm25_topk(docs).collect()
    }
    want = _bm25_replay(corpus, RT.BM25_QUERY)
    assert got == want
    assert 3 not in got  # zero-hit docs emit nothing


def test_bm25_plan_shape(spark) -> None:
    plan = _plan(RT.bm25_topk(load(spark, SF, "documents", respread=False)))
    assert "TakeOrderedAndProject" in plan  # top-k, never a global sort
    assert "EvalPython" not in plan  # fully JVM
    # df + corpus-stats dims reach the score join as broadcasts
    assert plan.count("BroadcastExchange") >= 2


# --- sliding chunks ---------------------------------------------------------


def test_sliding_chunks_crafted(spark) -> None:
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),  # n=5: starts 0,1 -> [a b c],[c d e]
            (2, "a b c"),  # n == window: exactly one chunk
            (3, "a b c d"),  # n=4: [a b c],[c d] (short tail)
            (4, ""),  # tokenless: no rows
            (5, "x"),  # n=1 < window: one short chunk
        ],
        "doc_id long, text string",
    )
    rows = PL.sliding_chunks(docs, window=3, stride=2).collect()
    got = {
        (r["doc_id"], r["chunk_id"]): (r["n_chunk_tokens"], r["chunk_text"])
        for r in rows
    }
    assert got == {
        (1, 0): (3, "a b c"),
        (1, 1): (3, "c d e"),
        (2, 0): (3, "a b c"),
        (3, 0): (3, "a b c"),
        (3, 1): (2, "c d"),
        (5, 0): (1, "x"),
    }


def test_sliding_chunks_covers_every_token(spark) -> None:
    docs = load(spark, SF, "documents", respread=False)
    from pyspark.sql import functions as F
    from don_crawler_spark.operators.dedup import tokens_col

    n_by_doc = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", F.size(tokens_col()).alias("n")
        ).collect()
    }
    # the furthest token index any chunk reaches must equal the doc length
    cover: dict[int, int] = {}
    for r in PL.sliding_chunks(docs).collect():
        end = r["chunk_id"] * PL.CHUNK_STRIDE + r["n_chunk_tokens"]
        cover[r["doc_id"]] = max(cover.get(r["doc_id"], 0), end)
    for d, n in n_by_doc.items():
        if n > 0:
            assert cover[d] == n, f"doc {d}: covered {cover.get(d)} of {n}"


def test_sliding_chunks_plan_is_map_side_only(spark) -> None:
    plan = _plan(PL.sliding_chunks(load(spark, SF, "documents", respread=False)))
    assert "Exchange" not in plan  # scan -> generate -> project, no shuffle
    assert "EvalPython" not in plan


# --- BPE pair stats ---------------------------------------------------------


def test_bpe_pairs_crafted_matches_replay(spark) -> None:
    texts = ["aa bb aa bb", "can't stop won't stop", "x1 2y"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["left_tok"], r["right_tok"]): r["n_pairs"]
        for r in TS.bpe_pair_stats(docs).collect()
    }
    # independent replay with Python re (same pattern semantics)
    pat = re.compile(TS.BPE_SPLIT_RE)
    want: dict[tuple[str, str], int] = {}
    for t in texts:
        sub = pat.findall(t)
        for a, b in zip(sub, sub[1:]):
            want[(a, b)] = want.get((a, b), 0) + 1
    assert got == want


def test_bpe_pairs_plan_shape(spark) -> None:
    plan = _plan(TS.bpe_pair_stats(load(spark, SF, "documents", respread=False)))
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan


# --- hybrid RRF --------------------------------------------------------------


def test_hybrid_rrf_crafted_matches_replay(spark) -> None:
    corpus = [
        (0, "merge window customer"),  # hits all terms
        (1, "merge merge merge"),
        (2, "no query words here"),
        (3, "customer window"),
        (4, "plain filler text"),
    ]
    import numpy as np

    rng = np.random.default_rng(7)
    vecs = {d: rng.standard_normal(8).astype("float32") for d, _ in corpus}
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    emb = spark.createDataFrame(
        [(d, [float(x) for x in v], 0) for d, v in vecs.items()],
        "vec_id long, embedding array<float>, label int",
    )
    got = [
        (r["doc_id"], r["bm25_rank"], r["cos_rank"], r["rrf"])
        for r in RT.hybrid_rrf_topk(docs, emb, pool=3, k=5).collect()
    ]

    # independent replay: BM25 ranks from _bm25_replay's exact raw scores,
    # cosine ranks from numpy in double, fused 1/(60+r)
    bm = _bm25_replay(corpus, RT.BM25_QUERY)
    bm_order = sorted(bm, key=lambda d: (-bm[d][1], d))[:3]
    q = vecs[0].astype("float64")
    cos = {
        d: round(
            float(v.astype("float64") @ q)
            / (
                math.sqrt(float(v.astype("float64") @ v.astype("float64")))
                * math.sqrt(float(q @ q))
            ),
            6,
        )
        for d, v in vecs.items()
    }
    cos_order = sorted(cos, key=lambda d: (-cos[d], d))[:3]
    fused = {}
    for i, d in enumerate(bm_order):
        fused[d] = fused.get(d, 0.0) + 1.0 / (60 + i + 1)
    for i, d in enumerate(cos_order):
        fused[d] = fused.get(d, 0.0) + 1.0 / (60 + i + 1)
    want_order = sorted(fused, key=lambda d: (-fused[d], d))[:5]
    want = [
        (
            d,
            bm_order.index(d) + 1 if d in bm_order else None,
            cos_order.index(d) + 1 if d in cos_order else None,
            round(fused[d], 6),
        )
        for d in want_order
    ]
    assert sorted(got) == sorted(want)


def test_hybrid_rrf_plan_shape(spark) -> None:
    df = RT.hybrid_rrf_topk(
        load(spark, SF, "documents", respread=False),
        load(spark, SF, "embeddings", respread=False),
    )
    plan = _plan(df)
    assert "EvalPython" not in plan
    # each signal narrows with TakeOrdered before any window runs
    assert plan.count("TakeOrderedAndProject") >= 2


# --- token entropy ------------------------------------------------------------


def test_token_entropy_crafted_matches_replay(spark) -> None:
    texts = {
        1: "a a a a",  # one distinct -> entropy 0
        2: "a b c d",  # uniform -> ln(4)
        3: "a a b",  # 2/3*ln(3/2) + 1/3*ln(3)
        4: "x",  # single token -> 0
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_distinct"], r["token_entropy"])
        for r in TS.token_entropy(docs).collect()
    }
    want = {}
    for d, t in texts.items():
        toks = t.split()
        n = len(toks)
        acc = 0
        for tok in sorted(set(toks)):
            c = toks.count(tok)
            acc += int(round(((c / float(n)) * math.log(n / float(c))) * 1e9))
        want[d] = (n, len(set(toks)), round(acc / 1e9, 6))
    assert got == want
    assert got[1][2] == 0.0 and got[4][2] == 0.0


def test_token_entropy_plan_is_map_side_only(spark) -> None:
    plan = _plan(TS.token_entropy(load(spark, SF, "documents", respread=False)))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
