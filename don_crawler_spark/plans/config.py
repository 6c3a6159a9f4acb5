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

import datetime as dt
from dataclasses import dataclass

# the crawl clock: round r spans [epoch + (r-1)*round_budget_ms, ...) —
# a deterministic stand-in for wall time, shared by engine and oracle
CRAWL_EPOCH = dt.datetime(2026, 1, 1, 0, 0, 0)


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
    # bounded retry of transient (503) fetches — P6/P7: the reference
    # retries rate-limited requests up to 5 times then gives up
    # (scanner/gitlab.go:23-26, crawler/crawler.go:27-29). A failed
    # attempt requeues with attempts+1; past the budget the URL is
    # abandoned (enters the seen-set so it is never retried).
    max_retries: int = 5
    # per-page enrichment of the fetched table (simhash fingerprint +
    # token/quality stats) — the dedup-ready outputs a training-data
    # crawl pipeline produces; off by default (parity suites pin the
    # lean schema), on in the throughput bench
    enrich_fetched: bool = False
    # fetch-join strategy guard: the round's selected set is broadcast
    # (as a semi-join prune of the pages corpus) only while its size
    # bound stays under this row count (~60 B/row -> 1M rows ≈ the
    # session's 64 MB broadcast envelope). Above it — production-scale
    # budgets over a 10^7+-row frontier, where the broadcast would be
    # multi-GB — the round degrades to a shuffle-hash join on url_hash
    # (plans/round.py, fetch_join="shuffle"). None = always broadcast.
    fetch_broadcast_limit: int | None = 1_000_000
    # shuffle-mode scan prune (plans/round.py + functions/native_bloom):
    # sizing of the Catalyst Bloom built over the selected keys. Defaults
    # sit at Spark's runtime-bloom conf caps (4M items / 64M bits = 8 MB,
    # fpp ~5e-4); for 10^7-10^8-row selected sets raise these together
    # with spark.sql.optimizer.runtime.bloomFilter.{maxNumItems,maxNumBits}
    # — bits ≈ 16 x items keeps extraction overhead ~fpp*corpus tiny.
    fetch_bloom_items: int = 4_000_000
    fetch_bloom_bits: int = 64 * 1024 * 1024

    def round_ts(self, rnd: int) -> dt.datetime:
        """Start instant of round ``rnd`` (1-based) on the crawl clock."""
        return CRAWL_EPOCH + dt.timedelta(milliseconds=(rnd - 1) * self.round_budget_ms)

    def host_budget(
        self,
        crawl_delay_ms: int | None,
        max_per_round: int | None,
        not_before_ts: dt.datetime | None = None,
        rnd: int = 1,
    ) -> int:
        """Per-round quota; 0 while the host is backing off (P2/P4/P10 —
        the reference's shared rate-limit reset state,
        scanner/github.go:26-29,329-357: once a reset hint is recorded,
        every worker skips the host until it passes)."""
        if not_before_ts is not None and not_before_ts > self.round_ts(rnd):
            return 0
        delay = crawl_delay_ms if crawl_delay_ms else self.default_crawl_delay_ms
        cap = max_per_round if max_per_round else self.default_max_per_round
        return min(cap, self.round_budget_ms // delay)
