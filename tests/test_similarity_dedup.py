"""Dedup + similarity operator properties beyond the DuckDB conformance:
LSH recall vs brute force, simhash determinism, exact-dedup semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


def test_lsh_recall_vs_brute_force(spark, emb) -> None:
    from don_crawler_spark.operators.similarity import brute_force_topk, lsh_topk

    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    # near-random embeddings are LSH's worst case (neighbors barely closer
    # than random points) — coarse buckets (4 bits) + 8 tables still must
    # recover most true neighbors
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(emb, queries, k=5, n_tables=8, n_bits=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH recall too low: {recall}"


def test_lsh_deterministic(spark, emb) -> None:
    from don_crawler_spark.operators.similarity import lsh_bucket_ids

    a = sorted(map(tuple, lsh_bucket_ids(emb, 2, 8).collect()))
    b = sorted(map(tuple, lsh_bucket_ids(emb, 2, 8).collect()))
    assert a == b


def test_simhash_properties(spark) -> None:
    from don_crawler_spark.operators.dedup import simhash_near_dup_pairs

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # identical
        (3, "the quick brown fox jumps over the lazy cat"),  # 1 token off
        (4, "completely different words entirely unrelated payload here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_dup_pairs(docs, max_hamming=15).collect()
    }
    assert pairs.get((1, 2)) == 0  # identical text -> identical fingerprint
    assert (1, 3) in pairs  # near-identical within banding distance
    assert (1, 4) not in pairs or pairs[(1, 4)] > pairs[(1, 3)]


def test_simhash_v1_golden_fingerprints(spark) -> None:
    """Literal bit-level pin of the v1 (md5) kernel — the same values the
    DuckDB oracle (dedup_simhash CORRECTNESS row) replays hex-digit-wise."""
    import pandas as pd

    from don_crawler_spark.operators.dedup import _simhash_batch, simhash_udf

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "frontier fetch schedule extract",
    ]
    golden = [1140598971862558276, 8669435089488450560]
    assert list(_simhash_batch(pd.Series(texts))) == golden
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [r["s"] for r in df.select(simhash_udf(F.col("text")).alias("s")).collect()]
    assert got == golden


def test_simhash_v2_native_parity(spark) -> None:
    """simhash_v2 (JVM-native xxhash64 kernel, the crawl-path default)
    must match a from-scratch Python XXH64 replay bit-for-bit — including
    null/empty/whitespace and non-ASCII edges — and carry a literal golden
    pin of its own."""
    from don_crawler_spark.functions.hashing import xxhash64_bytes
    from don_crawler_spark.operators.dedup import simhash_native_col

    def replay(t: str | None) -> int:
        if not t:
            return 0
        toks = {x for x in t.split(" ") if x}
        if not toks:
            return 0
        votes = [0] * 64
        for w in toks:
            h = xxhash64_bytes(w.encode("utf-8")) & ((1 << 64) - 1)
            for j in range(64):
                votes[j] += 1 if (h >> j) & 1 else -1
        v = sum(1 << j for j in range(64) if votes[j] > 0)
        return v - (1 << 64) if v >= (1 << 63) else v

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "frontier fetch schedule extract",
        "",
        None,
        "   ",
        "tøken ünïcode ascii",
        " ".join(f"w{i % 37}" for i in range(400)),
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        r["s"] for r in df.select(simhash_native_col(F.col("text")).alias("s")).collect()
    ]
    assert got == [replay(t) for t in texts]
    # v2 golden literals (differ from v1's by design: versioned kernels)
    assert got[0] == 1649482817916862672
    assert got[1] == -9182236823180475388


def test_simhash_tokenless_docs_emit_no_pairs(spark) -> None:
    """Null/empty/whitespace-only docs all fingerprint to 0; they must be
    excluded from the band join (the oracle's token explode drops them),
    not emitted as C(k,2) Hamming-0 pairs."""
    from don_crawler_spark.operators.dedup import simhash_near_dup_pairs

    rows = [
        (1, "real content words here"),
        (2, "real content words here"),
        (3, ""),
        (4, None),
        (5, "   "),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in simhash_near_dup_pairs(docs, max_hamming=3).collect()
    }
    assert pairs == {(1, 2)}


def test_exact_dedup_keep_first(spark) -> None:
    from don_crawler_spark.operators.dedup import dedup_exact_keep_first

    rows = [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "aaa"), (5, "ccc")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in dedup_exact_keep_first(docs).collect())
    assert kept == [1, 2, 5]


def test_multimodal_features_plumbing(spark) -> None:
    from don_crawler_spark.operators.multimodal import (
        FEATURE_DIM,
        extract_features,
        make_fake_media,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    media = make_fake_media(docs)
    feats = extract_features(media).collect()
    assert len(feats) == 20
    for r in feats:
        assert r["n_bytes"] > 0
        assert len(r["features"]) == FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r["features"])
    # deterministic across runs
    again = extract_features(media).collect()
    assert sorted(map(tuple, feats)) == sorted(
        (r["media_id"], r["n_bytes"], r["features"]) for r in again
    )
