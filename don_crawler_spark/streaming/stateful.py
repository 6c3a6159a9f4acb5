"""Custom stateful streaming operator: per-host first-seen URL dedup.

The batch crawl's seen-set is an anti-join against checkpointed deltas
(plans/round.py); when page captures arrive as a continuous feed instead,
the same "emit each URL once, in order, per host" contract becomes a
keyed-state streaming problem. This is the `applyInPandasWithState`
shape: group by host (one shuffle), keep the per-host seen-hash set and a
running sequence counter as group state, emit only first sightings.

Scale notes (the design the API forces is the right one at 10^10 URLs):

- State is partitioned by host, so state size and per-batch work follow
  the same per-host skew profile the batch path already salts for; a
  production deployment would swap the exact in-state hash set for the
  bucket-sharded Bloom digests of functions/bloom.py once a host's set
  exceeds ``max_state_hashes`` — here we cap and document rather than
  silently grow (the cap trips a WARNING row so truncation is never
  silent).
- The kernel is vectorized pandas (concat -> sort -> drop_duplicates ->
  isin), never per-row Python.
- Batches are bounded by the file-source's ``maxFilesPerTrigger``
  upstream, so state updates stay O(batch) per trigger.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEEN_OUT_SCHEMA = (
    "host string, url string, url_hash long, warc_ts timestamp, "
    "seq_in_host long, state_truncated boolean"
)
SEEN_STATE_SCHEMA = "hashes array<long>, n_seen long, truncated boolean"

OUT_COLS = [
    "host", "url", "url_hash", "warc_ts", "seq_in_host", "state_truncated",
]


def _dedup_kernel_factory(max_state_hashes: int):
    def dedup_fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: Any
    ) -> Iterator[pd.DataFrame]:
        host = key[0]
        if state.exists:
            hashes, n_seen, truncated = state.get
            seen = set(hashes)
        else:
            seen, n_seen, truncated = set(), 0, False

        batch = pd.concat(list(pdfs), ignore_index=True)
        # deterministic first-sighting order: event time, hash tiebreak
        batch = batch.sort_values(
            ["warc_ts", "url_hash"], kind="stable"
        ).drop_duplicates("url_hash", keep="first")
        new = batch[~batch["url_hash"].isin(seen)]

        out = new[["url", "url_hash", "warc_ts"]].copy()
        out.insert(0, "host", host)
        out["seq_in_host"] = range(n_seen + 1, n_seen + 1 + len(new))
        out["state_truncated"] = truncated

        seen.update(int(h) for h in new["url_hash"])
        n_seen += len(new)
        if len(seen) > max_state_hashes:
            # cap state, loudly: once truncated, downstream consumers know
            # re-emission of very old URLs is possible for this host (the
            # production fix is the Bloom digest, not a bigger array)
            seen = set(sorted(seen)[:max_state_hashes])
            truncated = True
        state.update((sorted(seen), n_seen, truncated))
        yield out[OUT_COLS]

    return dedup_fn


def streaming_seen_filter(
    pages: DataFrame, max_state_hashes: int = 1_000_000
) -> DataFrame:
    """First-seen URLs per host over a (streaming or batch) pages frame.

    Returns (host, url, url_hash, warc_ts, seq_in_host, state_truncated):
    one row per URL's first sighting, sequence-numbered per host in event
    time; duplicates inside a batch and across batches/restarts (via the
    stream checkpoint's state store) are dropped.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = pages.select(
        F.coalesce(
            F.parse_url("url", F.lit("HOST")), F.lit("(no-host)")
        ).alias("host"),
        "url",
        F.xxhash64("url").alias("url_hash"),
        "warc_ts",
    )
    return keyed.groupBy("host").applyInPandasWithState(
        _dedup_kernel_factory(max_state_hashes),
        outputStructType=SEEN_OUT_SCHEMA,
        stateStructType=SEEN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_seen_filter_available(
    spark, drop_dir: str, target_dir: str, checkpoint_dir: str
) -> None:
    """Drain available drops through the stateful dedup into parquet.
    State lives in the stream checkpoint: a later invocation with the same
    checkpoint resumes the per-host seen sets and sequence counters."""
    from don_crawler_spark.streaming.ingest import pages_stream

    stream = streaming_seen_filter(pages_stream(spark, drop_dir))
    (
        stream.writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
