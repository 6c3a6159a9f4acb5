"""Checkpoint-store behaviors not covered by the parity suite."""

from __future__ import annotations

def test_terminal_empty_round_still_writes_metrics(spark, tmp_path) -> None:
    """r2 ADVICE fix, now pinned (r3 VERDICT #7): when the frontier
    drains, the terminal (empty, uncommitted) round must STILL leave a
    metrics table — tooling reads per-round metrics for the terminal
    round too. It is empty (no partitions fetched anything) and its
    round has no manifest (empty rounds never commit)."""
    import os

    from don_crawler_spark.plans.checkpoint import CheckpointStore
    from don_crawler_spark.plans.config import CrawlConfig
    from don_crawler_spark.plans.driver import run_crawl
    from don_crawler_spark.sources.synth import generate_corpus

    corpus = str(tmp_path / "c")
    generate_corpus(corpus, n_pages=120, n_hosts=4, seed=11, n_publishers=2)
    ck = str(tmp_path / "ck")
    cfg = CrawlConfig(max_rounds=50)  # far more rounds than the corpus has
    summary = run_crawl(spark, corpus, ck, cfg)
    store = CheckpointStore(ck)
    terminal = summary.rounds + 1
    # the crawl drained before max_rounds (the break path ran)
    assert terminal <= cfg.max_rounds
    mpath = store.table_path(terminal, "metrics")
    assert os.path.exists(mpath)
    mdf = spark.read.parquet(mpath)
    assert mdf.count() == 0
    assert "urls_fetched" in mdf.columns
    # and the terminal round is NOT committed
    assert store.latest_round() == summary.rounds
