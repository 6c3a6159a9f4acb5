"""Event sessionization: gap-based session windows over the events
stream.

The classic clickstream/telemetry operator: group each user's events
into sessions separated by >= ``gap`` of inactivity, and aggregate per
session. Implemented with Spark's native ``session_window`` — the
dedicated dynamic-gap window operator — rather than the
lag/flag/cumsum "islands" rewrite, because session_window:

- needs ONE shuffle on the grouping key (user_id), after which sessions
  form via an in-partition sort-merge; the islands rewrite costs a
  window sort + a second aggregation over the same shuffle;
- is the exact operator that carries over to Structured Streaming
  (``withWatermark`` + the same groupBy merges late/out-of-order events
  into open sessions with bounded state) — batch and streaming share
  this plan shape, so the batch oracle-checked semantics pin the
  streaming behavior too.

BOUNDARY SEMANTICS (oracle-pinned in tests/test_sessions.py): a session
window spans [first_event, last_event + gap], MERGE-INCLUSIVE at the
boundary — an event at exactly ``prev + gap`` JOINS the session. This
is Spark's native ``session_window`` behavior (windows merge whenever
the next event's start is <= the open window's end), verified by the
boundary test; the DuckDB oracle in __spark_entry__.py therefore breaks
on ``ts - lag(ts) > gap``, and ``session_end = max(ts) + gap``.

The per-session value sum goes through DECIMAL(18,4) (the repo-wide
convention) so the distributed sum is exact and engine-identical.

At 100 TB: one hash exchange on user_id (10^8-10^9 keys — no skew
cliff), partial aggregation does not apply to session merging itself but
per-session aggregates collapse in the same pass; with event-time-sorted
ingest (kafka/warc order) AQE coalesces the post-shuffle partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    ts: str = "ts",
    key: str = "user_id",
    value: str = "value",
) -> DataFrame:
    """Per-key gap sessions with count and exact value sum."""
    win = F.session_window(F.col(ts), f"{gap_minutes} minutes")
    return (
        events.groupBy(F.col(key), win)
        .agg(
            F.count("*").cast("int").alias("n_events"),
            F.sum(F.col(value).cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            key,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
