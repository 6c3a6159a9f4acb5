"""Vitality scoring (A1-A7, J3) — Spark pipeline vs a pure-Python oracle
that executes the reference's algorithm (git/repo_activity.go:38-108)
step by step on the same rows."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from don_crawler_spark.operators.vitality import (
    GIT_EPOCH,
    RANGES_DATA,
    vitality_index,
)

NOW = dt.datetime(2024, 3, 1, 0, 0, 0)
DAYS = 60


def range_points_py(name: str, value: float) -> float:
    """git/repo_activity.go:260-274."""
    for n, lo, hi, pts in RANGES_DATA:
        if n == name and lo <= value < hi:
            return pts
    return 0.0


def vitality_py(
    commits: list[tuple[str, str, dt.datetime, int]],
    tags: list[tuple[str, dt.datetime]],
    days: int = DAYS,
    now: dt.datetime = NOW,
) -> dict[str, float]:
    """Single-threaded oracle for CalculateRepoActivity."""
    repos = sorted({c[0] for c in commits})
    out: dict[str, float] = {}
    for repo in repos:
        cutoffs = [now - dt.timedelta(days=i) for i in range(days)]
        day_index = {c.date(): i for i, c in enumerate(cutoffs)}
        daily_activity = [0.0] * days
        daily_tags = [0.0] * days
        first_commit: dict[str, dt.datetime] = {}
        oldest: dt.datetime | None = None
        for r, email, ts, n_parents in commits:
            if r != repo:
                continue
            if oldest is None or ts < oldest:
                oldest = ts
            if email and (email not in first_commit or ts < first_commit[email]):
                first_commit[email] = ts
            idx = day_index.get(ts.date())
            if idx is not None:
                daily_activity[idx] += 1
                if n_parents > 1:
                    daily_activity[idx] += 1
        for r, ts in tags:
            if r != repo:
                continue
            idx = day_index.get(ts.date())
            if idx is not None:
                daily_tags[idx] += 1
        if oldest is None:
            longevity = 0.0
        elif oldest < GIT_EPOCH:
            longevity = -1.0
        else:
            longevity = (now - oldest).total_seconds() / 86400.0
        total = 0.0
        for i in range(days):
            community = sum(1.0 for fc in first_commit.values() if fc < cutoffs[i])
            score = (
                range_points_py("userCommunity", community)
                + range_points_py("codeActivity", daily_activity[i])
                + range_points_py("releaseHistory", daily_tags[i])
                + range_points_py("longevity", longevity)
            )
            total += min(score, 100.0)
        out[repo] = float(int(min(total / days, 100.0)))
    return out


@pytest.fixture(scope="module")
def synthetic_commits():
    rng = random.Random(42)
    repos = [f"org/repo{i}" for i in range(12)]
    commits = []
    tags = []
    for repo in repos:
        n = rng.randint(1, 400)
        start = NOW - dt.timedelta(days=rng.randint(10, 3000))
        for _ in range(n):
            ts = start + dt.timedelta(
                seconds=rng.randint(0, int((NOW - start).total_seconds()) + 86400)
            )
            email = f"dev{rng.randint(0, 20)}@example.org" if rng.random() > 0.05 else ""
            n_parents = 2 if rng.random() < 0.2 else 1
            commits.append((repo, email, ts, n_parents))
        for _ in range(rng.randint(0, 12)):
            ts = NOW - dt.timedelta(days=rng.randint(0, 90), seconds=rng.randint(0, 86399))
            tags.append((repo, ts))
    # edge cases: repo with a pre-2005 first commit; repo with merge-heavy days
    commits.append(("org/ancient", "old@example.org", dt.datetime(2004, 6, 1), 1))
    commits.append(("org/ancient", "old@example.org", NOW - dt.timedelta(days=3), 1))
    return commits, tags


def test_vitality_matches_oracle(spark, synthetic_commits) -> None:
    commits, tags = synthetic_commits
    cdf = spark.createDataFrame(
        commits, "repo string, author_email string, ts timestamp, n_parents int"
    )
    tdf = spark.createDataFrame(tags, "repo string, ts timestamp")
    got = {
        r["repo"]: r["vitality"]
        for r in vitality_index(spark, cdf, tdf, DAYS, NOW).collect()
    }
    want = vitality_py(commits, tags)
    assert set(got) == set(want)
    for repo in want:
        assert got[repo] == pytest.approx(want[repo]), repo


def test_vitality_empty_repo_scores_46(spark) -> None:
    """A repo with no commits in-window and no history still scores:
    0 falls in the lowest band of every dimension -> 4+2+20+20 = 46
    (quirk of rangePoints + zero-filled snapshot)."""
    cdf = spark.createDataFrame(
        [("org/empty", "a@b.c", dt.datetime(2023, 1, 1), 1)],
        "repo string, author_email string, ts timestamp, n_parents int",
    )
    tdf = spark.createDataFrame([], "repo string, ts timestamp")
    got = vitality_index(spark, cdf, tdf, DAYS, NOW).collect()[0]["vitality"]
    # one author (community=1 -> 4), no activity in window (2), no tags (20),
    # longevity 425 days (30) => 56
    assert got == 56.0
