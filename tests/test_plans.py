"""Physical-plan assertions: the optimizations the engine is designed
around must actually appear in the executed plans (broadcasts, pushdowns,
partial aggregation, no corpus-side shuffle in the fetch join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _final_plan(df) -> str:
    """Execute first: under AQE, codegen/join choices only appear in the
    final plan."""
    df.write.mode("overwrite").format("noop").save()
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_j1_broadcasts_the_dimension(spark) -> None:
    import __spark_entry__ as em

    plan = _plan(em.queries()["j1_broadcast_enrichment"](spark, SF))
    assert "BroadcastHashJoin" in plan
    # the dimension (part) side is the build side, never shuffled
    assert "SortMergeJoin" not in plan


def test_range_join_is_broadcast_nested_loop(spark) -> None:
    import __spark_entry__ as em

    plan = _plan(em.queries()["a6_range_scoring"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan


def test_filter_pushdown_reaches_parquet(spark) -> None:
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .filter(F.col("l_quantity") > 45.0)
        .select("l_orderkey", "l_quantity")
    )
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity" in plan
    # column pruning: only the 2 projected columns are read
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_aggregation_is_partial_then_final(spark) -> None:
    df = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"))
    )
    plan = _plan(df)
    # map-side combine before the exchange (two HashAggregate operators)
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan


def test_fetch_join_never_shuffles_pages(spark, tmp_path) -> None:
    """The round DAG's contract: the pages table appears below a
    broadcast-semi join (map-side prune), never below a shuffle exchange
    that carries html payloads."""
    from don_crawler_spark.functions.bloom import BLOOM_SCHEMA
    from don_crawler_spark.plans.config import CrawlConfig
    from don_crawler_spark.plans.driver import _empty_seen
    from don_crawler_spark.plans.round import frontier_from_seeds, run_round
    from don_crawler_spark.sources.synth import generate_corpus

    corpus = str(tmp_path / "c")
    generate_corpus(corpus, n_pages=150, n_hosts=6, seed=21, n_publishers=3)
    pages = spark.read.parquet(f"{corpus}/pages.parquet")
    robots = spark.read.parquet(f"{corpus}/robots.parquet")
    budgets = spark.read.parquet(f"{corpus}/host_budgets.parquet")
    seeds = spark.read.parquet(f"{corpus}/seeds.parquet")
    out = run_round(
        CrawlConfig(),
        1,
        frontier_from_seeds(seeds),
        _empty_seen(spark),
        pages,
        robots,
        budgets,
        bloom=spark.createDataFrame([], BLOOM_SCHEMA),
        persist=False,
    )
    plan = _optimized(out.fetched_full)
    # the semi prune exists and is hinted broadcast
    assert "LeftSemi" in plan
    # html is pruned out of every post-extraction operator: the column
    # survives only inside the scan->extract segment
    final = _plan(out.fetched_full)
    assert "html" in final  # read at the scan...
    seg = final.split("Exchange")[0]  # ...but never above the last exchange
    assert "html" not in seg


def test_fetch_join_degrades_to_shuffle_hash_over_threshold(spark, tmp_path) -> None:
    """GUARD (r2 finding): above cfg.fetch_broadcast_limit the selected
    set must NOT be broadcast — the fetch join flips to a shuffle-hash on
    url_hash, with extraction still map-side (html below the exchange)."""
    import dataclasses

    from don_crawler_spark.plans.checkpoint import CheckpointStore
    from don_crawler_spark.plans.config import CrawlConfig
    from don_crawler_spark.plans.driver import _choose_fetch_join, _empty_seen
    from don_crawler_spark.plans.round import frontier_from_seeds, run_round
    from don_crawler_spark.sources.synth import generate_corpus

    corpus = str(tmp_path / "c")
    generate_corpus(corpus, n_pages=150, n_hosts=6, seed=21, n_publishers=3)
    pages = spark.read.parquet(f"{corpus}/pages.parquet")
    robots = spark.read.parquet(f"{corpus}/robots.parquet")
    budgets = spark.read.parquet(f"{corpus}/host_budgets.parquet")
    frontier = frontier_from_seeds(spark.read.parquet(f"{corpus}/seeds.parquet"))

    # the chooser's frontier size comes from checkpoint parquet FOOTERS
    # (no Spark job) — must agree with the DataFrame count exactly
    store = CheckpointStore(str(tmp_path / "ckpt"))
    store.write_table(frontier, 0, "frontier")
    n_frontier = store.row_count(0, "frontier")
    assert n_frontier == frontier.count()

    # the driver's chooser flips with the threshold; the bound is the
    # exact frontier size, NOT the budgets sum (r3 ADVICE: uncovered
    # hosts made the budget bound fail open)
    lean = CrawlConfig()
    saturated = dataclasses.replace(
        lean, default_max_per_round=10_000_000, round_budget_ms=60_000_000,
        fetch_broadcast_limit=2,
    )
    assert _choose_fetch_join(n_frontier, lean) == "broadcast"
    assert _choose_fetch_join(n_frontier, saturated) == "shuffle"
    assert _choose_fetch_join(10**9, dataclasses.replace(
        lean, fetch_broadcast_limit=None)) == "broadcast"

    out = run_round(
        saturated, 1, frontier, _empty_seen(spark), pages, robots, budgets,
        persist=False, fetch_join="shuffle",
    )
    plan = _plan(out.fetched_full)
    assert "ShuffledHashJoin" in plan
    # no broadcast-semi prune of pages in shuffle mode (the broadcasts
    # that remain are the small dimensions: robots rules, host budgets,
    # seq offsets)
    assert "LeftSemi, BuildRight" not in plan
    # html still never crosses an exchange: extraction stays map-side
    seg = plan.split("Exchange")[0]
    assert "html" not in seg
    # r4 (VERDICT #3): the corpus scan is bloom-pruned by the selected
    # keys BEFORE extraction — extraction cost is O(selected), not
    # O(corpus), in the mid-regime. The might_contain filter must sit
    # BELOW the link-extraction projection (deeper in the printed tree).
    assert "might_contain" in plan
    assert plan.index("regexp_extract_all") < plan.index("might_contain")

    # and the pruned plan returns the same rows as broadcast mode
    out_b = run_round(
        saturated, 1, frontier, _empty_seen(spark), pages, robots, budgets,
        persist=False, fetch_join="broadcast",
    )
    cols = ["url", "status", "seq_in_round"]
    got_s = sorted(map(tuple, out.fetched_full.select(*cols).collect()))
    got_b = sorted(map(tuple, out_b.fetched_full.select(*cols).collect()))
    assert got_s == got_b and len(got_s) > 0


def test_robots_filter_is_shuffle_free(spark) -> None:
    from don_crawler_spark.functions.robots import apply_robots_filter

    frontier = spark.createDataFrame(
        [(1, "https://a.example/x", "a.example", "/x", 0, "", 0)],
        "url_hash long, url string, host string, path string, depth int, src_url string, attempts int",
    )
    robots = spark.createDataFrame(
        [("a.example", "/", True)], "host string, path_prefix string, allow boolean"
    )
    allowed, _denied = apply_robots_filter(frontier, robots)
    plan = _plan(allowed)
    # broadcast join; the frontier (streamed) side sits directly under it
    # with no exchange — the only shuffle is the tiny per-host rule agg
    assert "BroadcastHashJoin" in plan
    streamed = plan.split("BroadcastHashJoin")[1].split("BroadcastExchange")[0]
    assert "Exchange" not in streamed
    assert "Scan" in streamed


def test_no_python_udf_in_native_queries(spark) -> None:
    """Queries documented as JVM-only must stay whole-stage-codegen'd."""
    import __spark_entry__ as em

    for name in ["t5_budget_rank", "j1_broadcast_enrichment", "text_fingerprint",
                 "text_quality_score", "a7_vitality_index"]:
        plan = _plan(em.queries()[name](spark, SF))
        assert "EvalPython" not in plan, name


def test_enriched_round_plan_has_no_python_udf(spark, tmp_path) -> None:
    """With enrich_fetched=True the page-processing DAG (extract + links
    + simhash_v2 + quality stats) must be JVM-native (r2 finding: the v1
    simhash pandas UDF sat on this path). The ONLY Python nodes allowed
    anywhere in the round plan are the URL-canonicalization slow-path
    fallbacks for rare complex shapes (functions/urls.py hybrid split) —
    seeds feeding the frontier, and new-link resolution."""
    from don_crawler_spark.plans.config import CrawlConfig
    from don_crawler_spark.plans.driver import _empty_seen
    from don_crawler_spark.plans.round import frontier_from_seeds, run_round
    from don_crawler_spark.sources.synth import generate_corpus

    corpus = str(tmp_path / "c")
    generate_corpus(corpus, n_pages=150, n_hosts=6, seed=21, n_publishers=3)
    out = run_round(
        CrawlConfig(enrich_fetched=True),
        1,
        frontier_from_seeds(spark.read.parquet(f"{corpus}/seeds.parquet")),
        _empty_seen(spark),
        spark.read.parquet(f"{corpus}/pages.parquet"),
        spark.read.parquet(f"{corpus}/robots.parquet"),
        spark.read.parquet(f"{corpus}/host_budgets.parquet"),
        persist=False,
    )
    for df in (out.fetched_full, out.new_frontier):
        plan = _plan(df)
        for line in plan.splitlines():
            if "EvalPython" in line:
                assert "canonicalize" in line, f"non-canonicalization UDF: {line}"
        assert "simhash_udf" not in plan


def test_topk_uses_window_group_limit(spark) -> None:
    """Catalyst pushes the rank<=k filter into a WindowGroupLimit
    (partial+final top-k, the T1/T5 'PerPage: 1' pushdown analogue —
    scanner/github.go:276-278)."""
    import __spark_entry__ as em

    plan = _plan(em.queries()["t5_budget_rank"](spark, SF))
    assert "WindowGroupLimit" in plan
    assert plan.count("WindowGroupLimit") == 2  # Partial + Final


def test_gemm_near_dup_is_distributed_no_collect(spark) -> None:
    """The embedding near-dup GEMM must be a cogrouped distributed plan:
    building the DataFrame runs at most the one block-sizing count job,
    and the plan is FlatMapCoGroupsInPandas over the block-pair key —
    no driver-side materialization of vectors (r01: .collect + broadcast)."""
    from don_crawler_spark.operators.similarity import (
        embedding_near_dup_pairs_gemm,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    # pass n_vectors so construction runs ZERO jobs
    tracker = spark.sparkContext.statusTracker()
    before = tracker.getJobIdsForGroup(None)
    df = embedding_near_dup_pairs_gemm(emb, threshold=0.5, n_vectors=500)
    after = tracker.getJobIdsForGroup(None)
    assert before == after, "building the GEMM plan must not run jobs"
    plan = _plan(df)
    assert "FlatMapCoGroupsInPandas" in plan
    # and it matches the exact expression-only baseline
    from don_crawler_spark.operators.similarity import embedding_near_dup_pairs

    got = sorted(tuple(r) for r in df.collect())
    want = sorted(tuple(r) for r in embedding_near_dup_pairs(emb, 0.5).collect())
    assert got == want


def test_round_plan_has_no_unpartitioned_window(spark) -> None:
    """The per-round sequence number is arithmetic (offset join + per-level
    rank): every Window node anywhere in the round DAG must have a
    non-empty partition spec (a global sort would serialize the round at
    scale — r01 finding)."""
    import json
    import tempfile

    from don_crawler_spark.plans.config import CrawlConfig
    from don_crawler_spark.plans.round import frontier_from_seeds, run_round
    from don_crawler_spark.sources.synth import corpus_dir_for

    base = tempfile.mkdtemp(prefix="plan_corpus_")
    corpus = corpus_dir_for(base, n_pages=300)
    pages = spark.read.parquet(f"{corpus}/pages.parquet")
    robots = spark.read.parquet(f"{corpus}/robots.parquet")
    budgets = spark.read.parquet(f"{corpus}/host_budgets.parquet")
    seeds = spark.read.parquet(f"{corpus}/seeds.parquet")
    frontier = frontier_from_seeds(seeds)
    seen = spark.createDataFrame([], "url_hash long, url string, first_round int")
    out = run_round(CrawlConfig(), 1, frontier, seen, pages, robots, budgets,
                    persist=False)
    n_windows = 0
    for df in (out.fetched_full, out.new_frontier):
        nodes = json.loads(df._jdf.queryExecution().optimizedPlan().toJSON())
        for node in nodes:
            if node.get("class", "").endswith(".Window"):
                n_windows += 1
                spec = node.get("partitionSpec")
                assert spec, f"unpartitioned Window: {node}"
                # the within-level seq window must carry the host-salt
                # sub-key too: level 1 holds one row per host, so a
                # level-only partition would sort every frontier host in
                # one task (r2 finding)
                if "rank_in_host" in json.dumps(spec):
                    assert len(spec) >= 2, f"unsalted seq Window: {spec}"
    assert n_windows > 0, "expected windowed ranks in the round plan"


def test_pq_plans_broadcast_and_stay_jvm(spark) -> None:
    """The PQ rows' scale contract in the physical plan: the corpus side
    streams through BROADCAST joins only (codebook + queries are the
    build sides — a SortMergeJoin would mean vectors shuffled), codes
    are computed without Python, and the only required exchange is the
    final per-query top-k window (WindowGroupLimit present)."""
    import __spark_entry__ as em

    for name in ["ann_pq_adc", "ann_ivf_pq"]:
        plan = _plan(em.queries()[name](spark, SF))
        assert "EvalPython" not in plan, name
        assert "Broadcast" in plan, name
        assert "SortMergeJoin" not in plan, name
        assert "WindowGroupLimit" in plan, name
