"""Multi-round crawl driver — the batch-iterative loop.

The reference runs one continuous pipeline until its channels drain
(crawler/crawler.go:642-669); the engine runs discrete rounds, each a
single Spark job whose outputs are checkpointed before the next round
plans (truncating lineage — iterative DataFrame graphs otherwise grow
unboundedly). The driver touches only counters, never row data: per-round
state flows parquet -> plan -> parquet on the executors.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from don_crawler_spark.functions.bloom import BLOOM_SCHEMA, make_merge_fn
from don_crawler_spark.plans.checkpoint import CheckpointStore
from don_crawler_spark.plans.config import CrawlConfig
from don_crawler_spark.plans.round import frontier_from_seeds, run_round

SEEN_SCHEMA = "url_hash long, url string, first_round int"


def _choose_fetch_join(n_frontier: int, cfg: CrawlConfig) -> str:
    """Pick the round's selected-set x pages join strategy (see the GUARD
    note in plans/round.py). ``n_frontier`` is the EXACT row count of the
    round's input frontier, read from the checkpoint's parquet footers
    (CheckpointStore.row_count — driver-side metadata, zero Spark jobs
    per round). It soundly bounds the selected set (selected ⊆ deduped
    frontier ⊆ frontier rows); broadcast only under
    cfg.fetch_broadcast_limit.

    The previous budgets-dimension bound (Σ host budgets) was UNSOUND —
    frontier hosts absent from the dimension each get the default cap via
    the coalesce in round.py, so with many uncovered hosts (the normal
    case for newly discovered hosts at production scale) the bound read
    small and the guard failed open onto a multi-GB broadcast (r3 ADVICE
    high). The frontier count errs only toward "shuffle", which the
    bloom-pruned shuffle path keeps O(selected), never toward an OOM.
    """
    if cfg.fetch_broadcast_limit is None:
        return "broadcast"
    return "broadcast" if n_frontier <= cfg.fetch_broadcast_limit else "shuffle"


@dataclass
class CrawlSummary:
    rounds: int = 0
    urls_fetched: int = 0
    urls_200: int = 0
    resumed_from: int = 0
    wall_ms_per_round: list[int] = field(default_factory=list)


def _empty_seen(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], SEEN_SCHEMA)


def run_crawl(
    spark: SparkSession,
    corpus_dir: str,
    checkpoint_dir: str,
    config: CrawlConfig | None = None,
    seed_urls: DataFrame | None = None,
) -> CrawlSummary:
    """Run (or resume) a crawl over a synth corpus directory.

    Resume: the checkpoint store's latest committed manifest defines the
    restart point; an interrupted round leaves no manifest and is redone
    from its predecessor's state — "a killed job resumes mid-crawl losing
    at most one round".
    """
    cfg = config or CrawlConfig()
    store = CheckpointStore(checkpoint_dir)

    import os

    pages = spark.read.parquet(f"{corpus_dir}/pages.parquet")
    robots = spark.read.parquet(f"{corpus_dir}/robots.parquet")
    budgets = spark.read.parquet(f"{corpus_dir}/host_budgets.parquet")
    transient = None
    if os.path.exists(f"{corpus_dir}/transient.parquet"):
        transient = spark.read.parquet(f"{corpus_dir}/transient.parquet")
    redirects = None
    if os.path.exists(f"{corpus_dir}/redirects.parquet"):
        redirects = spark.read.parquet(f"{corpus_dir}/redirects.parquet")
        # tolerate pre-redirect cached corpora AND empty tables alike
        if redirects.isEmpty():
            redirects = None

    summary = CrawlSummary()
    start_round = store.latest_round()
    summary.resumed_from = start_round

    if start_round == 0:
        if seed_urls is not None:
            # caller-provided seed URL column (e.g. the saturation bench
            # seeds the whole corpus at depth 0)
            frontier = frontier_from_seeds(
                seed_urls.select(
                    F.col("url").alias("org_url"),
                    F.array().cast("array<string>").alias("repo_urls"),
                )
            )
        else:
            seeds = spark.read.parquet(f"{corpus_dir}/seeds.parquet")
            frontier = frontier_from_seeds(seeds)
        # round 0 checkpoint: the seeded frontier (so round 1 is replayable)
        store.write_table(frontier, 0, "frontier")
        store.commit_round(0, {"seeded": True})
    frontier = store.read_table(spark, start_round, "frontier")
    seen = store.read_seen(spark, start_round) or _empty_seen(spark)

    def _read_bloom(rnd_: int) -> DataFrame | None:
        if not cfg.bloom_enabled:
            return None
        import os

        path = store.table_path(rnd_, "seen_bloom")
        if os.path.exists(path):
            return spark.read.parquet(path)
        # INVARIANT: the Bloom table must be a superset of the seen-set
        # (false negatives would let seen URLs bypass the exact anti-join).
        # Missing table (fresh crawl, or resume from a non-Bloom run) ->
        # rebuild from the exact seen deltas.
        seen_all = store.read_seen(spark, rnd_)
        if seen_all is None:
            return spark.createDataFrame([], BLOOM_SCHEMA)
        delta_b = seen_all.select(
            F.pmod(F.col("url_hash"), F.lit(cfg.bloom_buckets))
            .cast("int")
            .alias("bucket"),
            "url_hash",
        )
        return (
            delta_b.groupBy("bucket")
            .cogroup(spark.createDataFrame([], BLOOM_SCHEMA).groupBy("bucket"))
            .applyInPandas(
                make_merge_fn(cfg.bloom_m_bits, cfg.bloom_num_hashes), BLOOM_SCHEMA
            )
        )

    bloom = _read_bloom(start_round)
    n_frontier = store.row_count(start_round, "frontier")

    # Smallest possible per-host budget a given round can produce
    # (driver-side metadata, read once): when a round's WHOLE frontier
    # is no larger than this floor, no host can exceed its budget and
    # the salted pre-cut window in run_round cannot prune anything —
    # the driver disables it for such rounds (same
    # driver-side-metadata decision pattern as _choose_fetch_join).
    # A host with a back-off timestamp reads budget 0 until its round
    # start passes the stamp, so the floor is 0 for rounds that begin
    # before the LATEST not_before_ts and the static minimum after.
    def _static_min_budget_and_backoff():
        import pyarrow.parquet as pq

        path = f"{corpus_dir}/host_budgets.parquet"
        default_b = cfg.host_budget(None, None)
        try:
            tbl = pq.read_table(path)
        except OSError:
            return default_b, None
        cols = set(tbl.column_names)
        latest_nb = None
        if "not_before_ts" in cols:
            nbs = [
                v for v in tbl.column("not_before_ts").to_pylist()
                if v is not None
            ]
            latest_nb = max(nbs) if nbs else None
        delays = (
            tbl.column("crawl_delay_ms").to_pylist()
            if "crawl_delay_ms" in cols
            else []
        )
        caps = (
            tbl.column("max_per_round").to_pylist()
            if "max_per_round" in cols
            else [None] * len(delays)
        )
        budgets = [default_b] + [
            cfg.host_budget(d, c) for d, c in zip(delays, caps)
        ]
        return min(budgets), latest_nb

    static_min_budget, latest_not_before = _static_min_budget_and_backoff()

    def _min_budget(rnd_: int) -> int:
        if latest_not_before is not None and latest_not_before > cfg.round_ts(
            rnd_
        ):
            return 0
        return static_min_budget

    def _max_host_rows(frontier_df: DataFrame) -> int:
        """Largest per-host candidate count in the round's input
        frontier — one tiny column-pruned aggregate (host only), its
        1-row result collected like the metrics counters. Per-host
        DEDUPED candidates are bounded by per-host raw frontier rows,
        so ``max_host_rows <= min_budget`` proves no host can exceed
        its budget this round and the pre-cut window cannot prune."""
        row = (
            frontier_df.groupBy("host")
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.max("c").alias("m"))
            .collect()
        )
        return int(row[0]["m"] or 0)

    for rnd in range(start_round + 1, cfg.max_rounds + 1):
        t0 = time.monotonic()
        out = run_round(
            cfg, rnd, frontier, seen, pages, robots, budgets,
            bloom=bloom, transient=transient, redirects=redirects,
            fetch_join=_choose_fetch_join(n_frontier, cfg),
            precut=_max_host_rows(frontier) > _min_budget(rnd),
        )

        # Materialize in dependency order; manifest commit is the txn point.
        # The fetched_full write runs FIRST and alone: it populates the
        # round's persisted frames (selected / enriched), which every
        # other output reads. The remaining three outputs — frontier
        # write, bloom fold+write, metrics aggregate — only consume
        # those caches and are mutually independent, so they run as
        # CONCURRENT jobs from a small thread pool (guide §2.6: actions
        # are only sequential because the driver calls them
        # sequentially); the next job's tasks back-fill executors freed
        # by the previous job's straggler tail. The commit point is
        # unchanged: all writes complete before the manifest appears, so
        # a crash mid-round still resumes from the previous round.
        store.write_table(out.fetched_full, rnd, "fetched_full")

        def _write_frontier() -> None:
            store.write_table(out.new_frontier, rnd, "frontier")

        def _write_bloom() -> None:
            if not cfg.bloom_enabled:
                return
            # fold this round's new hashes into the bucket-sharded
            # filters — from the PERSISTED round output, not a parquet
            # re-read (each avoided re-scan is one less full job per
            # round)
            delta_b = out.fetched_full.filter(F.col("__seen_eligible")).select(
                F.pmod(F.col("url_hash"), F.lit(cfg.bloom_buckets))
                .cast("int")
                .alias("bucket"),
                "url_hash",
            )
            bloom_new = (
                delta_b.groupBy("bucket")
                .cogroup(bloom.groupBy("bucket"))
                .applyInPandas(
                    make_merge_fn(cfg.bloom_m_bits, cfg.bloom_num_hashes),
                    BLOOM_SCHEMA,
                )
            )
            store.write_table(bloom_new, rnd, "seen_bloom")

        def _metrics() -> list:
            # per-partition lineage/counters (metrics table): ONE
            # aggregation job over the persisted round output (no
            # parquet re-read), its tiny result collected once and
            # re-written as the metrics table from the driver (a
            # sub-second 1-partition write)
            return (
                out.fetched_full
                .groupBy(F.spark_partition_id().alias("partition_id"))
                .agg(
                    F.count(F.lit(1)).alias("urls_fetched"),
                    F.sum((F.col("status") == 200).cast("long")).alias(
                        "urls_200"
                    ),
                    F.sum("n_links").alias("links_emitted"),
                )
                .withColumn("round", F.lit(rnd))
                .withColumn(
                    "wall_ms", F.lit(int((time.monotonic() - t0) * 1000))
                )
            ).collect()

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as pool:
            f_frontier = pool.submit(_write_frontier)
            f_bloom = pool.submit(_write_bloom)
            f_metrics = pool.submit(_metrics)
            f_frontier.result()
            f_bloom.result()
            mrows = f_metrics.result()
        # write even when empty: tooling reads metrics for the terminal
        # round too (an empty round still leaves an empty metrics table)
        store.write_table(
            spark.createDataFrame(
                mrows,
                "partition_id int, urls_fetched bigint, urls_200 bigint, "
                "links_emitted bigint, round int, wall_ms bigint",
            ),
            rnd,
            "metrics",
        )
        n_selected = sum(r["urls_fetched"] for r in mrows)
        n_200 = sum(r["urls_200"] for r in mrows)
        if n_selected == 0:
            # empty round: don't commit, don't continue (oracle breaks
            # before emitting anything for an empty selection)
            break

        wall_ms = int((time.monotonic() - t0) * 1000)
        store.commit_round(
            rnd,
            {
                "selected": n_selected,
                "fetched_200": n_200,
                "wall_ms": wall_ms,
            },
        )
        summary.rounds = rnd
        summary.urls_fetched += n_selected
        summary.urls_200 += n_200
        summary.wall_ms_per_round.append(wall_ms)

        # round state is checkpointed; drop the round's persisted frames
        spark.catalog.clearCache()

        frontier = store.read_table(spark, rnd, "frontier")
        n_frontier = store.row_count(rnd, "frontier")
        seen = store.read_seen(spark, rnd)
        bloom = _read_bloom(rnd)

    return summary
