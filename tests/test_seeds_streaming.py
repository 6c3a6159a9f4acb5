"""YAML seed I/O (S2/K2/J2 — mirrors common/lists_test.go and
cmd/download_publishers.go semantics) and the streaming ingest surface."""

from __future__ import annotations

import os

from don_crawler_spark.sources.seeds_yaml import (
    load_publishers,
    merge_publishers,
    parse_publishers_yaml,
    write_publishers,
)

YAML_A = """
- id: pub001
  name: Publisher One
  organization: https://git01.example.nl/org1
  repositories:
    - https://git01.example.nl/org1/repo1
    - https://git01.example.nl/org1/repo2
- id: pub002
  name: Publisher Two
  organization: https://git02.example.nl/org2
"""

YAML_B = """
- id: pub003
  name: Publisher Three
  organization: https://git03.example.nl/org3
"""


def test_parse_publishers() -> None:
    rows = parse_publishers_yaml(YAML_A)
    assert [r["publisher_id"] for r in rows] == ["pub001", "pub002"]
    assert rows[0]["repo_urls"] == [
        "https://git01.example.nl/org1/repo1",
        "https://git01.example.nl/org1/repo2",
    ]
    assert rows[1]["repo_urls"] == []
    assert parse_publishers_yaml("") == []


def test_load_publishers_multi_file(spark, tmp_path) -> None:
    a, b = tmp_path / "a.yml", tmp_path / "b.yml"
    a.write_text(YAML_A)
    b.write_text(YAML_B)
    df = load_publishers(spark, str(a), str(b))
    assert df.count() == 3
    assert {r["publisher_id"] for r in df.collect()} == {"pub001", "pub002", "pub003"}
    # seeds feed the frontier directly
    from don_crawler_spark.plans.round import frontier_from_seeds

    frontier = frontier_from_seeds(df)
    urls = {r["url"] for r in frontier.collect()}
    assert "https://git01.example.nl/org1/repo1" in urls
    assert all(r["depth"] == 0 for r in frontier.collect())


def test_merge_upsert_roundtrip(tmp_path) -> None:
    existing = parse_publishers_yaml(YAML_A)
    incoming = [
        {  # update pub002's org URL (matched on id == ipa)
            "publisher_id": "pub002",
            "publisher_name": "ignored",
            "org_url": "https://new.example.nl/org2",
            "repo_urls": [],
            "organisation_url": "",
        },
        {  # brand new entry -> append
            "publisher_id": "pub009",
            "publisher_name": "Nine",
            "org_url": "https://git09.example.nl/org9",
            "repo_urls": [],
            "organisation_url": "",
        },
    ]
    merged = merge_publishers(existing, incoming)
    assert [p["publisher_id"] for p in merged] == ["pub001", "pub002", "pub009"]
    assert merged[1]["org_url"] == "https://new.example.nl/org2"
    assert merged[1]["publisher_name"] == "Publisher Two"  # name kept

    out = tmp_path / "merged.yml"
    write_publishers(merged, str(out))
    again = parse_publishers_yaml(out.read_text())
    assert [p["publisher_id"] for p in again] == ["pub001", "pub002", "pub009"]


def test_streaming_ingest_exactly_once(spark, tmp_path) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq
    import datetime as dt

    from don_crawler_spark.streaming.ingest import capture_rate, ingest_available

    drop = tmp_path / "drops"
    drop.mkdir()
    target = str(tmp_path / "pages")
    ckpt = str(tmp_path / "ckpt")

    def write_drop(name: str, n: int, start: int) -> None:
        tbl = pa.table(
            {
                "url": pa.array([f"https://h.example.nl/p{start + i}" for i in range(n)]),
                "warc_ts": pa.array(
                    [
                        dt.datetime(2026, 1, 1) + dt.timedelta(seconds=start + i)
                        for i in range(n)
                    ],
                    pa.timestamp("us"),
                ),
                "html": pa.array([b"x"] * n, pa.binary()),
                "text": pa.array(["x"] * n),
                "lang": pa.array(["nl"] * n),
            }
        )
        pq.write_table(tbl, str(drop / name))

    write_drop("d1.parquet", 5, 0)
    ingest_available(spark, str(drop), target, ckpt)
    assert spark.read.parquet(target).count() == 5

    # second drop arrives; re-run drains ONLY the new file (exactly-once)
    write_drop("d2.parquet", 3, 100)
    ingest_available(spark, str(drop), target, ckpt)
    assert spark.read.parquet(target).count() == 8
    # third run with nothing new is a no-op
    ingest_available(spark, str(drop), target, ckpt)
    assert spark.read.parquet(target).count() == 8

    # the event-time metric works on the batch view too
    rate = capture_rate(spark.read.parquet(target), window="1 minute")
    rows = {(r["window_start"].minute, r["n_pages"]) for r in rate.collect()}
    assert (0, 5) in rows and (1, 3) in rows


def test_host_backoff_defers_rounds(spark, tmp_path) -> None:
    """P2/P4/P10 — hosts with a future not_before_ts contribute nothing
    until the hint passes; engine and oracle agree exactly."""
    from don_crawler_spark.plans.checkpoint import CheckpointStore
    from don_crawler_spark.plans.config import CrawlConfig
    from don_crawler_spark.plans.driver import run_crawl
    from don_crawler_spark.plans.oracle import crawl_oracle
    from don_crawler_spark.sources.synth import generate_corpus

    corpus = str(tmp_path / "corpus")
    generate_corpus(corpus, n_pages=200, n_hosts=8, seed=5, n_publishers=4)
    cfg = CrawlConfig(max_rounds=6)

    oracle = crawl_oracle(corpus, cfg)
    # synth puts hosts[3:5] in backoff until epoch+150s -> round 4
    backoff = {"git03.example.nl", "git04.example.nl"}
    first_round = {}
    for rnd, _seq, host, _url, _st in oracle.trace:
        first_round.setdefault(host, rnd)
    touched = backoff & set(first_round)
    assert touched, "backoff hosts never crawled — corpus too small"
    assert all(first_round[h] >= 4 for h in touched), first_round

    ckpt = str(tmp_path / "ckpt")
    summary = run_crawl(spark, corpus, ckpt, cfg)
    store = CheckpointStore(ckpt)
    got = sorted(
        (r["round"], r["seq_in_round"], r["host"], r["url"], r["status"])
        for r in store.read_all(spark, "trace", summary.rounds).collect()
    )
    assert got == sorted(oracle.trace)
