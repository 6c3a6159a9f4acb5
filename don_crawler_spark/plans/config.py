"""Crawl configuration shared verbatim by the Spark engine and the oracle.

The politeness-in-batch mapping (SURVEY.md §7 risk 3): the reference's
continuous delay budgets (scanner/github.go:26-29, scanner/gitlab.go:22)
become a per-round per-host quota

    budget(host) = min(max_per_round, floor(round_budget_ms / crawl_delay_ms))

computed by THIS function in both implementations, so ordering cannot
diverge. Ordering within a host is (depth asc, url_hash asc) — depth is
the frontier priority (BFS from the seed list, the reference's logical
publisher->listing order), url_hash breaks ties reproducibly on any
cluster size (no task-order dependence).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class CrawlConfig:
    max_rounds: int = 20
    round_budget_ms: int = 60_000
    max_depth: int = 50
    default_crawl_delay_ms: int = 1_000
    default_max_per_round: int = 100
    # partitioned-Bloom prefilter for the seen anti-join. m_bits is per
    # BUCKET and fixed so round deltas OR-merge; at 10^10 URLs you scale
    # n_buckets (shards), not the per-shard size.
    bloom_enabled: bool = True
    bloom_buckets: int = 32
    bloom_m_bits: int = 1 << 20
    bloom_num_hashes: int = 7
    # per-page enrichment of the fetched table (simhash fingerprint +
    # token/quality stats) — the dedup-ready outputs a training-data
    # crawl pipeline produces; off by default (parity suites pin the
    # lean schema), on in the throughput bench
    enrich_fetched: bool = False

    def host_budget(self, crawl_delay_ms: int | None, max_per_round: int | None) -> int:
        delay = crawl_delay_ms if crawl_delay_ms else self.default_crawl_delay_ms
        cap = max_per_round if max_per_round else self.default_max_per_round
        return min(cap, self.round_budget_ms // delay)
