"""Sessionization semantics (operators/sessions.py): gap-boundary
behavior, merging, aggregation exactness, and plan shape. The sf0.01
oracle row (events_sessionize) is exercised by test_entry.py."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from don_crawler_spark.operators.sessions import sessionize

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, T0 + dt.timedelta(minutes=m), v) for (u, m, v) in rows],
        "user_id long, ts timestamp, value double",
    )


def test_gap_boundary_merges_inclusively(spark) -> None:
    """An event at exactly prev + gap JOINS the session (Spark's native
    session_window merges when next.start <= open.end) — the DuckDB
    oracle mirrors this by breaking only on `> INTERVAL 30 MINUTE`."""
    out = sessionize(_ev(spark, [(1, 0, 1.0), (1, 30, 1.0)]), 30).collect()
    assert len(out) == 1
    out = sessionize(_ev(spark, [(1, 0, 1.0), (1, 31, 1.0)]), 30).collect()
    assert len(out) == 2


def test_sessions_merge_chained_events(spark) -> None:
    """0, 20, 40min: each pair within gap -> one session spanning all
    three even though first and last are > gap apart."""
    rows = sessionize(_ev(spark, [(1, 0, 1.0), (1, 20, 2.0), (1, 40, 4.0)]), 30).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["session_start"] == T0
    assert r["session_end"] == T0 + dt.timedelta(minutes=70)  # last + gap
    assert r["n_events"] == 3 and r["sum_value"] == 7.0


def test_sessions_are_per_user(spark) -> None:
    out = sessionize(_ev(spark, [(1, 0, 1.0), (2, 5, 1.0), (1, 90, 1.0)]), 30)
    per = {(r["user_id"], r["session_start"]) for r in out.collect()}
    assert len(per) == 3


def test_session_plan_single_exchange(spark) -> None:
    ev = _ev(spark, [(i % 7, i, float(i)) for i in range(200)])
    plan = sessionize(ev)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # input parallelize + the user_id hash
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
