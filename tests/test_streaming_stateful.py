"""Stateful-streaming seen-filter tests: in-batch dedup, cross-restart
state (the second availableNow drain must remember the first's URLs via
the stream checkpoint), and per-host sequence continuity."""

from __future__ import annotations

import datetime as dt

import pytest

from don_crawler_spark.streaming.stateful import run_seen_filter_available

TS0 = dt.datetime(2026, 1, 1, 12, 0, 0)


def _write_drop(spark, drop_dir: str, rows: list[tuple], name: str) -> None:
    import glob
    import shutil
    import tempfile

    df = spark.createDataFrame(
        [
            (url, TS0 + dt.timedelta(seconds=sec), None, f"text {url}", "en")
            for url, sec in rows
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    # the file-source stream lists the drop dir FLAT (no recursive lookup,
    # like a WARC landing prefix): move the part file in as one drop file
    with tempfile.TemporaryDirectory() as tmp:
        df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/d")
        part = glob.glob(f"{tmp}/d/part-*.parquet")[0]
        shutil.move(part, f"{drop_dir}/{name}.parquet")


@pytest.fixture()
def dirs(tmp_path):
    d = tmp_path / "drops"
    t = tmp_path / "out"
    c = tmp_path / "ckpt"
    d.mkdir()
    return str(d), str(t), str(c)


def test_seen_filter_dedups_and_resumes(spark, dirs) -> None:
    drop_dir, target, ckpt = dirs

    # batch A: two hosts, one in-batch duplicate on a.com
    _write_drop(
        spark,
        drop_dir,
        [
            ("https://a.com/1", 0),
            ("https://a.com/2", 1),
            ("https://a.com/1", 2),  # dup within the batch
            ("https://b.com/x", 0),
        ],
        "dropA",
    )
    run_seen_filter_available(spark, drop_dir, target, ckpt)
    outA = spark.read.parquet(target).collect()
    got = {(r["host"], r["url"]): r["seq_in_host"] for r in outA}
    assert got == {
        ("a.com", "https://a.com/1"): 1,
        ("a.com", "https://a.com/2"): 2,
        ("b.com", "https://b.com/x"): 1,
    }
    assert not any(r["state_truncated"] for r in outA)

    # batch B: replays of A's URLs (must be suppressed by checkpointed
    # state) plus genuinely new ones (sequence continues)
    _write_drop(
        spark,
        drop_dir,
        [
            ("https://a.com/1", 10),  # already seen in batch A
            ("https://a.com/3", 11),
            ("https://b.com/x", 10),  # already seen
            ("https://c.com/zzz", 0),
        ],
        "dropB",
    )
    run_seen_filter_available(spark, drop_dir, target, ckpt)
    outB = spark.read.parquet(target).collect()
    got = {(r["host"], r["url"]): r["seq_in_host"] for r in outB}
    assert got == {
        ("a.com", "https://a.com/1"): 1,
        ("a.com", "https://a.com/2"): 2,
        ("a.com", "https://a.com/3"): 3,  # continued, not restarted
        ("b.com", "https://b.com/x"): 1,
        ("c.com", "https://c.com/zzz"): 1,
    }


def test_event_time_orders_first_sighting(spark, dirs) -> None:
    drop_dir, target, ckpt = dirs
    # same host, urls arriving "out of order" inside one batch: sequence
    # follows event time, not file order
    _write_drop(
        spark,
        drop_dir,
        [
            ("https://h.com/late", 100),
            ("https://h.com/early", 1),
            ("https://h.com/mid", 50),
        ],
        "drop1",
    )
    run_seen_filter_available(spark, drop_dir, target, ckpt)
    rows = sorted(
        spark.read.parquet(target).collect(), key=lambda r: r["seq_in_host"]
    )
    assert [r["url"].rsplit("/", 1)[1] for r in rows] == ["early", "mid", "late"]
