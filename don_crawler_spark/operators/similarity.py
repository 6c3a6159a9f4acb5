"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k, expressed natively (F.aggregate /
F.zip_with dot products in whole-stage codegen — no Python). Scale path:
random-hyperplane LSH bucketing so each query only scores its bucket's
candidates; recall traded via number of tables. Both deterministic:
hyperplanes derive from splitmix64(seed, table, dim) — no rand().

Scale notes: brute force is a cartesian join — O(Q x N); fine for Q small
(it broadcasts the queries), impossible for all-pairs at 10^10. The LSH
variant shuffles once on (table, bucket) and scores within buckets only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_col(a, b):
    """Cosine similarity of two array<float> columns, computed in double
    with left-to-right summation (matches DuckDB's list_* fold order, so
    oracle hashes agree bit-for-bit)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine. The query side is
    broadcast (small by contract); candidates stream through codegen.
    Deterministic tie-break on neighbor id."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_col(F.col("q_vec"), F.col("c_vec")))
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
        )
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame, threshold: float = 0.9
) -> DataFrame:
    """All-pairs cosine near-dups (the embedding-space analogue of exact
    content dedup). Expression-only variant — the oracle-checkable
    baseline; 70s at 5k vectors because F.aggregate folds per pair.
    Prefer embedding_near_dup_pairs_gemm."""
    a = embeddings.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea")
    )
    b = embeddings.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb")
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cosine", cosine_col(F.col("ea"), F.col("eb")))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", F.round("cosine", 6).alias("cosine"))
    )


def embedding_near_dup_pairs_gemm(
    embeddings: DataFrame, threshold: float = 0.9, block: int = 4096
) -> DataFrame:
    """All-pairs cosine via blocked BLAS matmul: the candidate side is
    broadcast as one normalized float64 matrix; each Arrow batch multiplies
    against it (25M dots = one GEMM call, ~1000x the per-pair fold).

    Scale path: at 10^8+ vectors the right side is read in blocks from
    storage instead of broadcast (block-nested-loop over bucketed
    vectors) or pre-pruned with lsh_bucket_ids — same kernel, different
    feed. BLAS accumulation order can differ from a sequential fold in
    the last ulp; the 6-decimal rounding absorbs it (verified against
    the DuckDB oracle at sf0.001 and sf0.01).
    """
    import pandas as pd

    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    norms = np.sqrt((mat * mat).sum(axis=1))
    spark = embeddings.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    b_norms = spark.sparkContext.broadcast(norms)

    def kernel(batches):
        all_ids, all_mat, all_norms = b_ids.value, b_mat.value, b_norms.value
        for pdf in batches:
            q_ids = pdf["vec_id"].to_numpy(np.int64)
            q = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            qn = np.sqrt((q * q).sum(axis=1))
            sims = (q @ all_mat.T) / (qn[:, None] * all_norms[None, :])
            ii, jj = np.nonzero((sims >= threshold) & (q_ids[:, None] < all_ids[None, :]))
            yield pd.DataFrame(
                {
                    "vec_a": q_ids[ii],
                    "vec_b": all_ids[jj],
                    "cosine": np.round(sims[ii, jj], 6),
                }
            )

    return embeddings.select("vec_id", "embedding").mapInPandas(
        kernel, "vec_a long, vec_b long, cosine double"
    )


# --- LSH-bucketed ANN (scale path; verified against brute force in tests) --


def _hyperplanes(n_tables: int, n_bits: int, dim: int, seed: int = 42) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes: splitmix64 stream -> uniform
    [-1, 1), shape (n_tables, n_bits, dim). No RNG state, reproducible on
    any executor."""
    idx = np.arange(n_tables * n_bits * dim, dtype=np.uint64) + np.uint64(
        (seed * 0x9E3779B97F4A7C15) % (1 << 64)
    )
    x = idx.copy()
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    u = x.astype(np.float64) / float(2**64)  # [0, 1)
    return (2.0 * u - 1.0).reshape(n_tables, n_bits, dim)


def lsh_bucket_ids(
    embeddings: DataFrame,
    n_tables: int = 4,
    n_bits: int = 12,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, table, bucket) — sign-of-projection LSH, vectorized numpy over
    Arrow batches (the projection is a dense matmul; Python would be per-row,
    numpy is per-batch)."""
    planes = _hyperplanes(n_tables, n_bits, dim, seed)
    weights = np.uint64(1) << np.arange(n_bits, dtype=np.uint64)

    def compute(batches):
        for pdf in batches:
            vecs = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            out_rows = []
            for t in range(n_tables):
                proj = vecs @ planes[t].T  # (n, n_bits)
                buckets = ((proj > 0).astype(np.uint64) * weights).sum(axis=1)
                out_rows.append(
                    pd.DataFrame(
                        {
                            id_col: pdf[id_col].to_numpy(),
                            "table": t,
                            "bucket": buckets.astype(np.int64),
                        }
                    )
                )
            yield pd.concat(out_rows)

    return embeddings.select(id_col, vec_col).mapInPandas(
        compute, f"{id_col} long, table int, bucket long"
    )


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_tables: int = 8,
    n_bits: int = 6,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates = ids sharing any (table, bucket) with
    the query, scored exactly, ranked like brute_force_topk. Recall is
    measured against brute force in tests; tune n_bits to the data's
    cluster structure (fewer bits -> coarser buckets -> higher recall &
    cost — near-uniform embeddings need coarse buckets, clustered real
    embeddings support fine ones)."""
    from pyspark.sql import Window

    cand_buckets = lsh_bucket_ids(embeddings, n_tables, n_bits, dim, seed)
    q_buckets = lsh_bucket_ids(queries, n_tables, n_bits, dim, seed).select(
        F.col("vec_id").alias("query_id"), "table", "bucket"
    )
    pairs = (
        cand_buckets.join(q_buckets, ["table", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(F.col("query_id"), F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec"))
    c = embeddings.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_vec"))
    scored = (
        pairs.join(F.broadcast(q), "query_id")
        .join(c, "neighbor_id")
        .withColumn("cosine", cosine_col(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("cosine", 6).alias("cosine"))
    )
