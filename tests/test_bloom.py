"""Partitioned Bloom filter: no false negatives (the exactness invariant),
plausible FP rate, merge semantics, and bloom-on == bloom-off crawls."""

from __future__ import annotations

import numpy as np
import pytest

from don_crawler_spark.functions.bloom import (
    empty_bits,
    might_contain,
    set_bits,
)

M_BITS = 1 << 16
K = 7


def test_no_false_negatives() -> None:
    rng = np.random.default_rng(42)
    keys = rng.integers(-(2**63), 2**63 - 1, size=2000, dtype=np.int64)
    bits = empty_bits(M_BITS)
    set_bits(bits, keys, M_BITS, K)
    assert might_contain(bits, keys, M_BITS, K).all()


def test_false_positive_rate_reasonable() -> None:
    rng = np.random.default_rng(1)
    keys = rng.integers(-(2**63), 2**63 - 1, size=2000, dtype=np.int64)
    others = rng.integers(-(2**63), 2**63 - 1, size=20000, dtype=np.int64)
    others = np.setdiff1d(others, keys)
    bits = empty_bits(M_BITS)
    set_bits(bits, keys, M_BITS, K)
    fp = might_contain(bits, others, M_BITS, K).mean()
    # n=2000, m=65536, k=7 -> theoretical fp ~ (1-e^{-kn/m})^k ~ 0.5%
    assert fp < 0.05, fp


def test_incremental_set_equals_bulk() -> None:
    rng = np.random.default_rng(2)
    keys = rng.integers(-(2**63), 2**63 - 1, size=1000, dtype=np.int64)
    bulk = empty_bits(M_BITS)
    set_bits(bulk, keys, M_BITS, K)
    inc = empty_bits(M_BITS)
    for chunk in np.array_split(keys, 7):
        set_bits(inc, chunk, M_BITS, K)
    assert np.array_equal(bulk, inc)


def test_empty_probe() -> None:
    bits = empty_bits(M_BITS)
    assert might_contain(bits, np.array([], dtype=np.int64), M_BITS, K).shape == (0,)
    some = np.array([1, 2, 3], dtype=np.int64)
    assert not might_contain(bits, some, M_BITS, K).any()


@pytest.mark.slow
def test_crawl_identical_with_and_without_bloom(spark, tmp_path) -> None:
    """The Bloom prefilter is an optimization only: trace and seen-set are
    bit-identical with it enabled or disabled."""
    from don_crawler_spark.plans.checkpoint import CheckpointStore
    from don_crawler_spark.plans.config import CrawlConfig
    from don_crawler_spark.plans.driver import run_crawl
    from don_crawler_spark.sources.synth import generate_corpus

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_pages=150, n_hosts=8, seed=11, n_publishers=3)

    results = {}
    for label, enabled in [("on", True), ("off", False)]:
        ckpt = str(tmp_path / f"ckpt_{label}")
        cfg = CrawlConfig(max_rounds=4, bloom_enabled=enabled)
        s = run_crawl(spark, corpus, ckpt, cfg)
        store = CheckpointStore(ckpt)
        trace = sorted(
            (r["round"], r["seq_in_round"], r["host"], r["url"], r["status"])
            for r in store.read_all(spark, "trace", s.rounds).collect()
        )
        seen = sorted(
            (r["url_hash"], r["url"], r["first_round"])
            for r in store.read_seen(spark, s.rounds).collect()
        )
        results[label] = (s.rounds, trace, seen)

    assert results["on"] == results["off"]
