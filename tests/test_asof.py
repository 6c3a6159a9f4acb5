"""As-of join (operators/asof.py): crafted-input exactness — inclusive
at-or-before matching, same-timestamp tiebreaks, missing-reference nulls —
plus the plan-shape guarantee (one hash exchange, partitioned window, no
range join)."""

from __future__ import annotations

import datetime as dt

from don_crawler_spark.operators.asof import asof_join


def _ts(sec: int) -> dt.datetime:
    return dt.datetime(2026, 1, 1) + dt.timedelta(seconds=sec)


def test_asof_crafted(spark) -> None:
    probe = spark.createDataFrame(
        [
            (1, 10, _ts(100)),  # after refs at 50 and 90 -> matches 90
            (2, 10, _ts(50)),   # exactly at ref ts 50 -> inclusive match
            (3, 10, _ts(10)),   # before every ref -> null
            (4, 20, _ts(500)),  # key with no refs at all -> null
            (5, 30, _ts(70)),   # two refs tie at ts 60 -> max ref_id wins
        ],
        "pid long, k long, ts timestamp",
    )
    ref = spark.createDataFrame(
        [
            (101, 10, _ts(50)),
            (102, 10, _ts(90)),
            (103, 10, _ts(101)),  # after every probe: never matched
            (201, 30, _ts(60)),
            (202, 30, _ts(60)),   # same ts as 201 -> wins (greater id)
        ],
        "rid long, k long, ts timestamp",
    )
    out = {
        r["pid"]: r["ref_rid"]
        for r in asof_join(probe, ref, on="k", ts="ts", ref_order="rid").collect()
    }
    assert out == {1: 102, 2: 101, 3: None, 4: None, 5: 202}


def test_asof_plan_shape(spark) -> None:
    probe = spark.range(10).selectExpr(
        "id AS pid", "id % 3 AS k", "timestamp'2026-01-01' + make_interval(0,0,0,0,0,0,id) AS ts"
    )
    ref = spark.range(10).selectExpr(
        "id AS rid", "id % 3 AS k", "timestamp'2026-01-01' AS ts"
    )
    plan = (
        asof_join(probe, ref, on="k", ts="ts", ref_order="rid")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # union -> ONE hash exchange on the key -> partitioned window; an
    # as-of via range join would show a join node and a blowup instead
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(__k" in plan
    assert "Join" not in plan
    assert "rangepartitioning" not in plan
