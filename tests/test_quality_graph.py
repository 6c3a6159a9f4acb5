"""Behavioral tests for operators/quality.py and operators/graph.py —
hand-computed fixtures plus plan shape (broadcast dims, no Python UDF).
Oracle conformance at sf0.01 is covered by test_entry.py for all three
query bindings (quality_ppl_buckets, text_tfidf_topk, graph_pagerank)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from don_crawler_spark.operators.graph import NANO, pagerank, synth_host_edges
from don_crawler_spark.operators.quality import ppl_buckets, tfidf_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


# --- pagerank -----------------------------------------------------------------


def test_pagerank_two_node_cycle(spark) -> None:
    """a<->b: symmetric graph, ranks must be equal and stable at the
    fixed point b + 0.85*r (r = NANO//2 survives the integer map)."""
    e = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    out = {r["host"]: r for r in pagerank(e, iters=5).collect()}
    assert set(out) == {0, 1}
    assert out[0]["pagerank_nano"] == out[1]["pagerank_nano"]
    # mass approximately conserved (floor losses < iters * n nanos)
    total = out[0]["pagerank_nano"] + out[1]["pagerank_nano"]
    assert abs(total - NANO) < 100


def test_pagerank_dangling_mass_redistributed(spark) -> None:
    """0->1, 1 dangling: without dangling redistribution node 0 would
    decay to the teleport floor while 1 keeps receiving; with it, 1's
    outflow returns to both nodes equally. Replay the integer recurrence
    in Python and demand bit equality."""
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    out = {r["host"]: r["pagerank_nano"] for r in pagerank(e, iters=5).collect()}

    n = 2
    r = {0: NANO // n, 1: NANO // n}
    for _ in range(5):
        dang = r[1] // n
        base = (15 * NANO) // (100 * n)
        r = {
            0: base + (85 * (0 + dang)) // 100,
            1: base + (85 * (r[0] // 1 + dang)) // 100,
        }
    assert out == r
    assert out[1] > out[0]  # the sink still accumulates more


def test_pagerank_out_degrees(spark) -> None:
    e = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2)], "src long, dst long"
    )
    out = {r["host"]: r["out_deg"] for r in pagerank(e, iters=1).collect()}
    assert out == {0: 2, 1: 1, 2: 0}


def test_synth_host_edges_deterministic_and_loop_free(spark) -> None:
    docs = spark.range(0, 400).select(F.col("id").alias("doc_id"))
    e = synth_host_edges(docs, n_hosts=97)
    rows = {(r["src"], r["dst"]) for r in e.collect()}
    assert rows == {(r["src"], r["dst"]) for r in e.collect()}  # stable
    assert all(s != d for s, d in rows)
    assert all(0 <= s < 97 and 0 <= d < 97 for s, d in rows)
    # high-bit mixing gives varying out-degrees (not a pure permutation)
    degs = e.groupBy("src").count()
    assert degs.select(F.countDistinct("count")).first()[0] > 1


def test_pagerank_plan_reuses_src_partitioning(spark) -> None:
    """The static edge+degree relation is built once (src layout) and
    lazily localCheckpoint-ed; the per-iteration rank joins must not
    introduce a Python UDF, and the plan must reference a pinned
    relation (checkpoint RDD scan or cached InMemoryRelation) rather
    than re-deriving the edge subtree per iteration."""
    e = synth_host_edges(
        spark.range(0, 300).select(F.col("id").alias("doc_id")), n_hosts=53
    )
    plan = pagerank(e, iters=2)._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan or "InMemoryTableScan" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- ppl buckets --------------------------------------------------------------


def test_ppl_buckets_reference_docs_score_lower(spark) -> None:
    """Docs made of reference-slice vocabulary must land in a lower (or
    equal) bucket than a doc of tokens the reference never saw."""
    rows = [
        (0, "en", "alpha beta gamma alpha beta"),  # reference (0 % 10 == 0)
        (10, "en", "alpha beta alpha beta gamma"),  # reference
        (1, "en", "alpha beta gamma"),  # in-vocab
        (2, "en", "zzz qqq xxx"),  # fully OOV
        (3, "en", "alpha alpha alpha"),  # most common token
    ]
    out = {r["doc_id"]: r for r in ppl_buckets(_docs(spark, rows)).collect()}
    assert len(out) == 5
    assert out[3]["avg_nll"] < out[2]["avg_nll"]
    assert out[1]["avg_nll"] < out[2]["avg_nll"]
    assert out[2]["bucket"] == 3  # OOV doc is the tail of its language
    # hand-check doc 3: p(alpha) = (c+1)/(N+V+1); refs have N=10 tokens,
    # V=3 distinct, alpha count 4
    expect = -math.log((4 + 1) / (10 + 3 + 1))
    assert abs(out[3]["avg_nll"] - round(expect, 6)) <= 1e-6


def test_ppl_buckets_terciles_per_language(spark) -> None:
    rows = [(i, "en" if i % 2 else "nl", "w%d tok" % (i % 4)) for i in range(24)]
    out = ppl_buckets(_docs(spark, rows))
    per = (
        out.groupBy("lang", "bucket").count().collect()
    )
    # ntile(3) over 12 docs per lang -> 4/4/4
    assert {(r["lang"], r["bucket"]): r["count"] for r in per} == {
        (lang, b): 4 for lang in ("en", "nl") for b in (1, 2, 3)
    }


def test_ppl_buckets_plan_broadcasts_vocab(spark) -> None:
    docs = _docs(spark, [(i, "en", "a b c") for i in range(30)])
    plan = ppl_buckets(docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- length quantiles ---------------------------------------------------------


def test_length_quantiles_interpolation(spark) -> None:
    """4 values 10,20,30,40: p50 = 25 (interpolated), p25 = 17.5,
    p75 = 32.5, p95 = 38.5 — the (1-g)*lo + g*hi definition shared with
    the DuckDB oracle."""
    from don_crawler_spark.operators.quality import length_quantiles

    docs = spark.createDataFrame(
        [(i, "en", n) for i, n in enumerate([10, 20, 30, 40])],
        "doc_id long, lang string, n_chars long",
    )
    r = length_quantiles(docs).collect()[0]
    assert (r["p25"], r["p50"], r["p75"], r["p95"]) == (17.5, 25.0, 32.5, 38.5)
    assert r["n_docs"] == 4


# --- tfidf --------------------------------------------------------------------


def test_tfidf_ranks_distinctive_term_first(spark) -> None:
    rows = [
        (1, "en", "common rare1 common"),
        (2, "en", "common rare2"),
        (3, "en", "common rare3"),
    ]
    out = tfidf_topk(_docs(spark, rows), k=2).collect()
    top = {r["doc_id"]: r["term"] for r in out if r["rank"] == 1}
    # 'common' appears in every doc -> idf 0 -> the rare term wins
    assert top == {1: "rare1", 2: "rare2", 3: "rare3"}
    z = [r for r in out if r["term"] == "common"]
    assert all(r["tfidf"] == 0.0 for r in z)


def test_tfidf_tie_breaks_on_term(spark) -> None:
    rows = [(1, "en", "bbb aaa"), (2, "en", "ccc")]
    out = [r for r in tfidf_topk(_docs(spark, rows), k=2).collect() if r["doc_id"] == 1]
    assert [r["term"] for r in sorted(out, key=lambda r: r["rank"])] == ["aaa", "bbb"]


def test_tfidf_respects_k(spark) -> None:
    rows = [(1, "en", "a b c d e f g h")]
    out = tfidf_topk(_docs(spark, rows), k=3).collect()
    assert len(out) == 3 and sorted(r["rank"] for r in out) == [1, 2, 3]


# --- hashed linear quality scorer ---------------------------------------------


def test_linear_score_matches_md5_replay(spark) -> None:
    """score = ROUND(sum(w)/n/2^31, 6) with w = first 32 md5 bits
    centered; replayed from scratch with hashlib."""
    import hashlib

    from don_crawler_spark.operators.quality import linear_quality_score

    rows = [(1, "en", "alpha beta gamma"), (2, "en", "alpha"), (3, "en", "")]
    out = {
        r["doc_id"]: r
        for r in linear_quality_score(_docs(spark, rows)).collect()
    }

    def w(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) - 2**31

    for doc_id, _, text in rows:
        toks = [t for t in text.split(" ") if t]
        got = out[doc_id]
        assert got["n_tokens"] == len(toks)
        if toks:
            want = round(sum(w(t) for t in toks) / (len(toks) * 2.0**31), 6)
            assert got["score"] == want
        else:
            assert got["score"] == 0.0
            assert got["label"] == "drop"


def test_linear_score_thresholds_label_rounded_score(spark) -> None:
    from don_crawler_spark.operators.quality import linear_quality_score

    rows = [(i, "en", f"tok{i}") for i in range(40)]
    out = linear_quality_score(
        _docs(spark, rows), keep_at=0.5, drop_at=-0.5
    ).collect()
    for r in out:
        if r["score"] >= 0.5:
            assert r["label"] == "keep"
        elif r["score"] < -0.5:
            assert r["label"] == "drop"
        else:
            assert r["label"] == "review"
    # single-token docs span the weight range; all three labels occur
    assert {r["label"] for r in out} == {"keep", "review", "drop"}


def test_linear_score_is_exchange_free(spark) -> None:
    from don_crawler_spark.operators.quality import linear_quality_score

    plan = linear_quality_score(
        _docs(spark, [(1, "en", "a b c")])
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "Python" not in plan


# --- Gopher document rules ------------------------------------------------------


def test_gopher_rules_paper_defaults_each_rule(spark) -> None:
    """Crafted docs, paper-default constants: each doc trips exactly the
    rule it is built to trip."""
    from don_crawler_spark.operators.quality import gopher_rules

    fifty = " ".join(
        ["the quick brown fox jumps over that lazy dog daily"] * 5
    )  # 50 words, has 'the'+'that', mean len in [3,10]
    rows = [
        (1, "en", fifty),                               # passes everything
        (2, "en", "too few words here"),                # word count
        (3, "en", " ".join(["aa"] * 50) + " the that"), # mean word len < 3
        (4, "en", fifty + " " + " ".join(["#"] * 10)),  # symbol ratio > 0.1
        (5, "en", "\n".join(["• " + fifty] * 10)),      # all lines bulleted
        (6, "en", "\n".join([fifty + "..."] * 2 + [fifty])),  # 2/3 ellipsis
        (7, "en", fifty.replace("the", "111").replace("that", "222")),  # no stops
    ]
    out = {
        r["doc_id"]: r
        for r in gopher_rules(_docs(spark, rows)).collect()
    }
    assert out[1]["passes"] is True
    assert out[2]["r_word_count"] is False
    assert out[3]["r_mean_len"] is False and out[3]["mean_word_len"] < 3
    assert out[4]["r_symbols"] is False
    assert out[5]["r_bullets"] is False and out[5]["bullet_frac"] == 1.0
    assert out[6]["r_ellipsis"] is False
    assert out[6]["ellipsis_frac"] == pytest.approx(round(2 / 3, 6))
    assert out[7]["r_stop_words"] is False and out[7]["n_stop_hits"] < 2
    for d in (2, 3, 4, 5, 6, 7):
        assert out[d]["passes"] is False


def test_gopher_rules_stop_hits_are_distinct(spark) -> None:
    """50x 'the' is ONE distinct stop word, not 50 hits."""
    from don_crawler_spark.operators.quality import gopher_rules

    docs = _docs(spark, [(1, "en", " ".join(["the"] * 50))])
    r = gopher_rules(docs).collect()[0]
    assert r["n_stop_hits"] == 1
    assert r["r_stop_words"] is False


def test_gopher_rules_empty_doc_degrades(spark) -> None:
    from don_crawler_spark.operators.quality import gopher_rules

    r = gopher_rules(_docs(spark, [(1, "en", "")])).collect()[0]
    assert r["n_words"] == 0
    assert r["passes"] is False  # word-count rule fails, row survives


def test_gopher_rules_is_exchange_free(spark) -> None:
    from don_crawler_spark.operators.quality import gopher_rules

    plan = gopher_rules(
        _docs(spark, [(1, "en", "a b")])
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "Python" not in plan


def test_hits_star_graph_semantics(spark) -> None:
    """A pure star (0 -> 1..4): node 0 is the sole hub (score NANO),
    spokes are equal authorities (score NANO), node 0 has authority 0
    and spokes hub 0 — the textbook HITS fixture, exact in fixed-point
    because all raw masses are equal so max-normalization is lossless."""
    from don_crawler_spark.operators.graph import NANO, hits

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src int, dst int"
    )
    rows = {r.host: r for r in hits(edges, iters=3).collect()}
    assert rows[0].hub_nano == NANO and rows[0].auth_nano == 0
    assert rows[0].out_deg == 4 and rows[0].in_deg == 0
    for i in range(1, 5):
        assert rows[i].auth_nano == NANO and rows[i].hub_nano == 0
        assert rows[i].in_deg == 1


def test_hits_separates_hub_from_authority(spark) -> None:
    """Two hubs of different fan-out pointing into a shared authority:
    the wider hub must out-rank the narrower, and the shared sink must
    out-rank the exclusive one. Mutual reinforcement, not degree, sets
    the order — the property HITS adds over simple counts."""
    from don_crawler_spark.operators.graph import hits

    # hub 10 -> {1,2,3}; hub 11 -> {1}; nobody links the hubs
    edges = spark.createDataFrame(
        [(10, 1), (10, 2), (10, 3), (11, 1)], "src int, dst int"
    )
    rows = {r.host: r for r in hits(edges, iters=3).collect()}
    assert rows[10].hub_nano > rows[11].hub_nano
    assert rows[1].auth_nano > rows[2].auth_nano  # 2 in-links vs 1
    assert rows[2].auth_nano == rows[3].auth_nano
    assert rows[1].in_deg == 2 and rows[10].out_deg == 3


def test_hits_plan_stays_jvm(spark) -> None:
    from don_crawler_spark.operators.graph import hits

    edges = spark.createDataFrame([(0, 1)], "src int, dst int")
    plan = hits(edges, iters=2)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_opic_hand_computed_round(spark) -> None:
    """One OPIC round on a 3-node graph (1->2, 1->3, 2->1; 3 dangling),
    hand-computed in the same integer floor arithmetic."""
    from don_crawler_spark.operators.graph import opic

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 1)], "src long, dst long"
    )
    rows = {r.host: r for r in opic(edges, iters=1).collect()}
    c0 = 1_000_000_000 // 3  # 333333333
    # every node banks its initial cash
    assert all(rows[h].history_nano == c0 for h in (1, 2, 3))
    # node 1: node 2's full cash + virtual share of node 3's cash
    dshare = c0 // 3
    assert rows[1].cash_nano == c0 + dshare
    # nodes 2 and 3: half of node 1's cash + virtual share
    assert rows[2].cash_nano == c0 // 2 + dshare
    assert rows[3].cash_nano == c0 // 2 + dshare
    assert rows[3].out_deg == 0 and rows[1].out_deg == 2


def test_opic_cash_conservation(spark) -> None:
    """Total cash stays ~NANO per round (floor losses only) and total
    history after k rounds is ~k*NANO — the OPIC invariant."""
    from don_crawler_spark.operators.graph import NANO, opic
    from don_crawler_spark.operators.graph import synth_host_edges

    e = synth_host_edges(
        spark.range(0, 500).select(F.col("id").alias("doc_id")), n_hosts=53
    )
    agg = opic(e, iters=4).agg(
        F.sum("cash_nano").alias("c"), F.sum("history_nano").alias("h")
    ).collect()[0]
    n, n_edges = 53, e.count()
    # floor losses per round: < deg per sharing node (sums to < |E|)
    # plus < n at the virtual node; < n at initialization
    loss = 5 * (n_edges + n) + n
    assert NANO - loss <= agg["c"] <= NANO
    assert 4 * (NANO - loss) <= agg["h"] <= 4 * NANO


def test_opic_plan_stays_jvm(spark) -> None:
    from don_crawler_spark.operators.graph import opic

    edges = spark.createDataFrame([(0, 1)], "src int, dst int")
    plan = opic(edges, iters=2)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_triangles_k4_and_pendant(spark) -> None:
    from don_crawler_spark.operators.graph import triangles

    # triangle {1,2,3} with a pendant 4 hanging off 3 (reversed edge
    # direction + a duplicate to exercise normalization)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 3), (2, 1)], "src long, dst long"
    )
    got = {
        r.host: (r.degree, r.n_triangles, r.clustering_permille)
        for r in triangles(edges).collect()
    }
    assert got == {
        1: (2, 1, 1000),
        2: (2, 1, 1000),
        3: (3, 1, 333),
        4: (1, 0, 0),
    }
    # K4: every vertex has degree 3, sits in 3 triangles, coefficient 1
    k4 = spark.createDataFrame(
        [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b],
        "src long, dst long",
    )
    for r in triangles(k4).collect():
        assert (r.degree, r.n_triangles, r.clustering_permille) == (3, 3, 1000)


def test_seed_distance_chain_cycle_unreachable(spark) -> None:
    from don_crawler_spark.operators.graph import seed_distance

    # cycle 1->2->3->1 seeded at 1; component {4,5} unreachable
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 5)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "host long")
    got = {
        r.host: (r.is_seed, r.hops, r.reached)
        for r in seed_distance(edges, seeds, max_hops=6).collect()
    }
    assert got == {
        1: (True, 0, True),
        2: (False, 1, True),
        3: (False, 2, True),
        4: (False, None, False),
        5: (False, None, False),
    }


def test_seed_distance_hop_cap(spark) -> None:
    from don_crawler_spark.operators.graph import seed_distance

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 8)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "host long")
    got = {
        r.host: r.hops
        for r in seed_distance(chain, seeds, max_hops=3).collect()
    }
    # hosts within 3 hops get exact distances; the rest are pruned
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: None, 6: None, 7: None,
                   8: None}


def test_assortativity_star_is_minus_one(spark) -> None:
    from don_crawler_spark.operators.graph import assortativity

    # star: hub 1 -> leaves 2,3,4. Hand moments over the symmetric
    # pairs: m=6, Sx=12, Sxy=18, Sxx=30 -> r = (108-144)/(180-144) = -1
    star = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "src long, dst long"
    )
    r = assortativity(star).collect()[0]
    assert (r.m_edges, r.sum_x, r.sum_xy, r.sum_xx) == (6, "12", "18", "30")
    assert r.assortativity == -1.0


def test_assortativity_regular_graph_is_null(spark) -> None:
    from don_crawler_spark.operators.graph import assortativity

    # 4-cycle: every degree 2 -> zero degree variance -> undefined r
    cyc = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    r = assortativity(cyc).collect()[0]
    assert r.assortativity is None and r.m_edges == 8


def test_seed_distance_plan_stays_jvm(spark) -> None:
    from don_crawler_spark.operators.graph import seed_distance

    edges = spark.createDataFrame([(0, 1)], "src int, dst int")
    seeds = spark.createDataFrame([(0,)], "host int")
    plan = (
        seed_distance(edges, seeds, max_hops=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Python" not in plan


def test_triangles_plan_stays_jvm(spark) -> None:
    from don_crawler_spark.operators.graph import triangles

    edges = spark.createDataFrame([(0, 1)], "src int, dst int")
    plan = triangles(edges)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_degree_distribution_buckets(spark) -> None:
    from don_crawler_spark.operators.graph import degree_distribution

    # out-degrees: host 1 -> 4 edges (bucket 2), host 2 -> 1 (bucket 0)
    # in-degrees: host 9 <- 3 (bucket 1), hosts 5,6 <- 1 each (bucket 0)
    edges = spark.createDataFrame(
        [(1, 9), (1, 9), (1, 9), (1, 5), (2, 6)], "src long, dst long"
    )
    got = {
        (r["direction"], r["bucket"]): (r["degree_min"], r["n_hosts"])
        for r in degree_distribution(edges).collect()
    }
    assert got == {
        ("out", 2): (4, 1),
        ("out", 0): (1, 1),
        ("in", 1): (2, 1),
        ("in", 0): (1, 2),
    }


def test_degree_distribution_plan_stays_jvm(spark) -> None:
    from don_crawler_spark.operators.graph import degree_distribution, synth_host_edges
    from don_crawler_spark.sources.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents", respread=False)
    plan = (
        degree_distribution(synth_host_edges(docs))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    assert "partial_count" in plan


def test_reciprocity_counts_and_verdict(spark) -> None:
    from don_crawler_spark.operators.graph import reciprocity_score

    # host 1: 4 out-edges, all reciprocated -> farm suspect
    # host 2: 2 out (1 reciprocated: 2->1) -> 500 permille, too few edges
    # host 7: 1 out, none reciprocated -> 0
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 5),
         (2, 1), (3, 1), (4, 1), (5, 1),
         (2, 6), (7, 1)],
        "src long, dst long",
    )
    got = {
        r["host"]: (
            r["out_deg"], r["n_reciprocal"], r["recip_permille"],
            r["is_farm_suspect"],
        )
        for r in reciprocity_score(edges).collect()
    }
    assert got[1] == (4, 4, 1000, True)
    assert got[2] == (2, 1, 500, False)
    assert got[5] == (1, 1, 1000, False)  # high ratio but out_deg < 4
    assert got[7] == (1, 0, 0, False)


def test_reciprocity_duplicate_edges_count_once(spark) -> None:
    from don_crawler_spark.operators.graph import reciprocity_score

    edges = spark.createDataFrame(
        [(1, 2), (1, 2), (2, 1)], "src long, dst long"
    )
    got = {
        r["host"]: (r["out_deg"], r["n_reciprocal"])
        for r in reciprocity_score(edges).collect()
    }
    assert got[1] == (1, 1)
    assert got[2] == (1, 1)


def test_ppr_matches_from_scratch_integer_replay(spark) -> None:
    from don_crawler_spark.operators.graph import NANO, pagerank_personalized

    # 1 (seed) -> 2 -> 3 (dangling); 9 -> 10 disconnected from the seed
    edge_list = [(1, 2), (2, 3), (9, 10)]
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "host long")
    got = {
        r["host"]: (r["is_seed"], r["ppr_nano"])
        for r in pagerank_personalized(edges, seeds, iters=5).collect()
    }
    # exact integer replay of the recurrence from scratch
    hosts = sorted({h for e in edge_list for h in e})
    deg = {h: sum(1 for s, _ in edge_list if s == h) for h in hosts}
    seed_set, s = {1}, 1
    r = {h: (NANO // s if h in seed_set else 0) for h in hosts}
    for _ in range(5):
        agg = {h: 0 for h in hosts}
        for src, dst in edge_list:
            if deg[src] > 0:
                agg[dst] += r[src] // deg[src]
        dsum = sum(r[h] for h in hosts if deg[h] == 0)
        r = {
            h: (15 * NANO // (100 * s) if h in seed_set else 0)
            + (85 * (agg[h] + (dsum // s if h in seed_set else 0))) // 100
            for h in hosts
        }
    assert {h: v[1] for h, v in got.items()} == r
    assert got[1][0] is True and all(not got[h][0] for h in (2, 3, 9, 10))
    assert got[9][1] == 0 and got[10][1] == 0


def test_ppr_dangling_mass_returns_to_seeds_only(spark) -> None:
    from don_crawler_spark.operators.graph import pagerank_personalized

    # seed 1 -> dangling 2; host 5 isolated-ish non-seed sink
    edges = spark.createDataFrame([(1, 2), (3, 5)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "host long")
    got = {
        r["host"]: r["ppr_nano"]
        for r in pagerank_personalized(edges, seeds, iters=3).collect()
    }
    # 2's (dangling) mass cycles back to the seed, not to 5
    assert got[1] > 0 and got[2] > 0
    assert got[5] == 0


def test_ppr_out_of_graph_seeds_do_not_dilute(spark) -> None:
    from don_crawler_spark.operators.graph import pagerank_personalized

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    in_graph = spark.createDataFrame([(1,)], "host long")
    with_ghost = spark.createDataFrame([(1,), (42,)], "host long")
    a = {r["host"]: r["ppr_nano"]
         for r in pagerank_personalized(edges, in_graph, iters=3).collect()}
    b = {r["host"]: r["ppr_nano"]
         for r in pagerank_personalized(edges, with_ghost, iters=3).collect()}
    # the absent seed 42 contributes nothing and dilutes nothing
    assert a == b
    # no seeds in the graph at all: all ranks 0, no division error
    none = spark.createDataFrame([(42,)], "host long")
    assert all(
        r["ppr_nano"] == 0
        for r in pagerank_personalized(edges, none, iters=2).collect()
    )


def test_reciprocity_ignores_self_loops(spark) -> None:
    from don_crawler_spark.operators.graph import reciprocity_score

    edges = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1)], "src long, dst long"
    )
    got = {
        r["host"]: (r["out_deg"], r["n_reciprocal"])
        for r in reciprocity_score(edges).collect()
    }
    # the self-loop is neither an out-edge nor its own reciprocation
    assert got[1] == (1, 1)
    assert got[2] == (1, 1)
