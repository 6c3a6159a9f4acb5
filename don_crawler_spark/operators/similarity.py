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
    embeddings: DataFrame, threshold: float = 0.9, block: int = 4096,
    n_vectors: int | None = None,
) -> DataFrame:
    """All-pairs cosine via a distributed block-nested-loop of BLAS
    matmuls — EXACT (same result set as the expression baseline), with no
    driver-side materialization of vectors.

    Plan: assign each vector a block id (vec_id-hash mod nblocks, blocks
    sized ~``block`` rows); replicate each side over the upper-triangular
    block-pair grid ((i, j), i <= j) with one explode; cogroup the two
    replicated sides on the pair key; run one numpy GEMM per (i, j) group
    and emit pairs over the threshold with vec_a < vec_b. Pair (x, y)
    lands in exactly one group (min/max of their block ids), so no
    dedup pass is needed.

    Scale: replication factor is (nblocks+1)/2 per side — the intrinsic
    cost of an exact all-pairs scan; the shuffle key is the block pair,
    each task holds 2 x block x dim doubles. At 10^8+ vectors you don't
    want exact all-pairs at all — prune with lsh_bucket_ids first and run
    this same kernel per bucket (ann path); this operator is the exact
    oracle-checkable form. BLAS accumulation order can differ from a
    sequential fold in the last ulp; the 6-decimal rounding absorbs it
    (verified against the DuckDB oracle at sf0.001/sf0.01).

    ``n_vectors``: pass the (approximate) count if known to avoid the one
    count() job used for block sizing.
    """
    import pandas as pd
    from pyspark.sql import types as T

    if n_vectors is None:
        n_vectors = embeddings.count()  # one tiny job: a count, not a collect
    nblocks = max(1, -(-n_vectors // block))

    e = embeddings.select("vec_id", "embedding").withColumn(
        "__blk", F.pmod(F.xxhash64("vec_id"), F.lit(nblocks)).cast("int")
    )
    # left side owns rows of block pairs (ba, bb) with ba = own block,
    # bb >= ba; right side mirrors with bb = own block, ba <= bb
    lhs = e.withColumn(
        "__pair",
        F.explode(F.transform(
            F.sequence(F.col("__blk"), F.lit(nblocks - 1)),
            lambda j: F.concat_ws(":", F.col("__blk").cast("string"), j.cast("string")),
        )),
    )
    rhs = e.withColumn(
        "__pair",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.col("__blk")),
            lambda i: F.concat_ws(":", i.cast("string"), F.col("__blk").cast("string")),
        )),
    )
    # Re-alias every rhs column (fresh attribute ids): both cogroup sides
    # derive from the same relation, and Spark's self-relation dedup
    # rewrites the Python-UDF arg list to the LEFT side's ids — a
    # projection above the cogroup then prunes the right child down to
    # the key and the kernel's right pdf loses vec_id/embedding
    # (observed: `pairs.select("vec_a","vec_b")` KeyError'd in gemm;
    # plan showed right output [__pair, __pair] only). Fresh ids keep the
    # two sides' attributes disjoint so pruning stays per-side-correct.
    rhs = rhs.select([F.col(c).alias(c) for c in rhs.columns])

    out_schema = "vec_a long, vec_b long, cosine double"

    def gemm(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}
            )
        i_blk, j_blk = key[0].split(":")
        a_ids = left["vec_id"].to_numpy(np.int64)
        b_ids = right["vec_id"].to_numpy(np.int64)
        a = np.array(left["embedding"].tolist(), dtype=np.float64)
        b = np.array(right["embedding"].tolist(), dtype=np.float64)
        an = np.sqrt((a * a).sum(axis=1))
        bn = np.sqrt((b * b).sum(axis=1))
        sims = (a @ b.T) / (an[:, None] * bn[None, :])
        if i_blk == j_blk:
            # left set == right set: a<b picks each unordered pair once
            ii, jj = np.nonzero(
                (sims >= threshold) & (a_ids[:, None] < b_ids[None, :])
            )
            va, vb = a_ids[ii], b_ids[jj]
        else:
            # disjoint blocks: every (x, y) crossing appears exactly once
            # in this group — normalize the pair order by id
            ii, jj = np.nonzero(sims >= threshold)
            x, y = a_ids[ii], b_ids[jj]
            va, vb = np.minimum(x, y), np.maximum(x, y)
        return pd.DataFrame(
            {"vec_a": va, "vec_b": vb, "cosine": np.round(sims[ii, jj], 6)}
        )

    return (
        lhs.groupBy("__pair")
        .cogroup(rhs.groupBy("__pair"))
        .applyInPandas(gemm, out_schema)
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


def ivf_assign(
    embeddings: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid by cosine -> (vec_id, cell). Centroids are the first
    ``n_centroids`` data vectors by id — deterministic seed centroids
    (production swaps in k-means means; the partition contract, join
    shape, and this function's output schema are identical, and seed
    centroids keep the whole operator oracle-expressible in SQL).

    Scale: centroids broadcast (tiny by contract); assignment is one
    map-side broadcast join + a per-vector top-1, so the big side
    streams through codegen with no shuffle on vectors. Ties break on
    centroid id (deterministic)."""
    from pyspark.sql import Window

    cent = embeddings.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("cent_vec")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("cos"), F.asc("cell"))
    return (
        embeddings.select(id_col, vec_col)
        .join(F.broadcast(cent))
        .withColumn("cos", cosine_col(F.col(vec_col), F.col("cent_vec")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "cell")
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-Flat approximate top-k: coarse-quantize the corpus into
    ``n_centroids`` cells (ivf_assign), probe each query's ``n_probe``
    nearest cells, score exact cosine only within probed cells. The
    second ANN scale path next to hyperplane LSH (lsh_topk): LSH costs
    n_tables replicas of the corpus relation, IVF costs one assignment
    pass + a candidate join bounded by n_probe/n_centroids of the
    corpus per query. Same output contract as brute_force_topk
    (query_id, rank, neighbor_id, cosine) — recall-only approximation,
    scored cosines are exact.

    Scale: the (query_id, cell, q_vec) probe relation is
    queries x n_probe rows — broadcast; candidates never shuffle until
    the final per-query top-k window (partitioned by query_id). Each
    corpus vector lives in exactly one cell, so no cross-probe dedup
    pass is needed."""
    from pyspark.sql import Window

    cent = embeddings.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("cent_vec")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cell"))
    probes = (
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
        .join(F.broadcast(cent))
        .withColumn("cos", cosine_col(F.col("q_vec"), F.col("cent_vec")))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "cell", "q_vec")
    )
    cand = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    ).join(
        ivf_assign(embeddings, n_centroids, vec_col, id_col).select(
            F.col(id_col).alias("neighbor_id"), "cell"
        ),
        "neighbor_id",
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        cand.join(F.broadcast(probes), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_col(F.col("q_vec"), F.col("c_vec")))
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
        )
    )


def semantic_dedup(
    embeddings: DataFrame,
    n_centroids: int = 16,
    threshold: float = 0.35,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication"): cluster the embedding
    space, then prune near-duplicate pairs WITHIN each cluster only —
    never across — so the pair scan is bounded by the largest cell, not
    the corpus. Among semantic duplicates the member LEAST similar to its
    centroid is kept (the paper's keep-low rule: edge points carry more
    diversity than cluster cores).

    Drop rule, exactly: x is dropped iff some same-cell neighbor y has
    cos(x, y) >= threshold and (cent_cos(y), y_id) < (cent_cos(x), x_id)
    lexicographically — a deterministic dominance rule (no cascade: a
    kept survivor is one with no strictly-lower-ranked near-dup, which
    can legitimately retain two mutually-dissimilar docs from one dup
    chain). Centroids are the first ``n_centroids`` vectors by id — the
    same deterministic seed-centroid contract as ivf_assign/ivf_topk
    (production swaps in k-means means; plan shape identical).

    Plan / scale: one broadcast of the centroid set + a per-vector top-1
    window (shuffle on id) for assignment; ONE shuffle on cell for the
    within-cell pair join; a final left anti-style join on id for the
    verdict. The pair join is quadratic per cell — that is SemDeDup's own
    contract (n_centroids grows with the corpus so cells stay bounded,
    ~corpus/n_centroids members each). Returns one row per input vector:
    (vec_id, cell, cent_cos, keep).
    """
    from pyspark.sql import Window

    cent = embeddings.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("cent_vec")
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("cc"), F.asc("cell"))
    members = (
        embeddings.select(id_col, vec_col)
        .join(F.broadcast(cent))
        .withColumn("cc", cosine_col(F.col(vec_col), F.col("cent_vec")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, "cell", F.col("cc").alias("cent_cos"), vec_col)
    )
    a = members.select(
        F.col(id_col).alias("id_a"),
        "cell",
        F.col("cent_cos").alias("cc_a"),
        F.col(vec_col).alias("va"),
    )
    b = members.select(
        F.col(id_col).alias("id_b"),
        F.col("cell").alias("cell_b"),
        F.col("cent_cos").alias("cc_b"),
        F.col(vec_col).alias("vb"),
    )
    dropped = (
        a.join(
            b,
            (F.col("cell") == F.col("cell_b"))
            & (F.col("id_a") != F.col("id_b")),
        )
        .filter(cosine_col(F.col("va"), F.col("vb")) >= threshold)
        .filter(
            (F.col("cc_b") < F.col("cc_a"))
            | (
                (F.col("cc_b") == F.col("cc_a"))
                & (F.col("id_b") < F.col("id_a"))
            )
        )
        .select(F.col("id_a").alias(id_col))
        .distinct()
        .withColumn("__dropped", F.lit(True))
    )
    return (
        members.join(dropped, id_col, "left")
        .select(
            id_col,
            "cell",
            F.round("cent_cos", 6).alias("cent_cos"),
            F.col("__dropped").isNull().alias("keep"),
        )
    )


# --- product quantization (PQ-ADC) -------------------------------------------

_PQ_SCALE = 1_000_000_000  # nano-unit integer scale for order-free ADC sums


def _sub_l2(a, b):
    """Squared L2 distance of two (sliced) array<float> columns, computed
    as (a.a - 2*a.b) + b.b from three left-to-right dot-product folds —
    the exact operation sequence the DuckDB oracle spells with
    list_dot_product, so argmin comparisons agree bit-for-bit."""
    return (_dot(a, a) - 2.0 * _dot(a, b)) + _dot(b, b)


def pq_codebook(
    embeddings: DataFrame,
    n_codes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Single-row relation holding the whole PQ codebook:
    ``cb = array<struct<code int, cb_vec array<float>>>`` sorted by code.
    Codewords are the first ``n_codes`` data vectors by id — the same
    deterministic seed convention as ivf_assign (production swaps in
    k-means codewords per subspace; plumbing and schema are identical,
    and seed codewords keep the operator oracle-expressible). One row of
    a few KB -> broadcast to every consumer."""
    return (
        embeddings.filter(F.col(id_col) < n_codes)
        .select(
            F.struct(
                F.col(id_col).cast("int").alias("code"),
                F.col(vec_col).alias("cb_vec"),
            ).alias("cw")
        )
        .groupBy()
        .agg(F.array_sort(F.collect_list("cw")).alias("cb"))
    )


def pq_encode(
    embeddings: DataFrame,
    m_sub: int = 8,
    sub_dim: int = 8,
    n_codes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ encoding: split each vector into ``m_sub`` contiguous
    ``sub_dim``-wide subvectors and store, per subspace, the id of the
    nearest codeword by squared L2 (ties -> lowest code). Output:
    (vec_id, codes array<int>) — the 100-TB memory story: m_sub bytes
    per vector (codes fit uint8 for n_codes <= 256) instead of
    4*dim, an 8-64x compression that keeps whole-corpus ADC scans
    RAM-resident where raw float vectors spill.

    Plan shape: ONE broadcast single-row cross join (the codebook),
    then a pure map-side projection — the argmin is an aggregate() fold
    over the n_codes codewords inside a transform() over subspaces, so
    the corpus never shuffles and encode parallelism is scan
    parallelism. HOFs evaluate JVM-interpreted (the simhash-v2
    tradeoff, operators/dedup.py): ~m_sub*n_codes 8-wide dot folds per
    vector, a constant ~1k flops — encode stays scan-bound."""
    init = F.struct(
        F.lit(float("inf")).alias("d"), F.lit(-1).cast("int").alias("c")
    )

    def codes_expr():
        def argmin_for(m):
            def step(acc, cw):
                e_sub = F.slice(F.col(vec_col), m * sub_dim + 1, sub_dim)
                c_sub = F.slice(cw["cb_vec"], m * sub_dim + 1, sub_dim)
                d = _sub_l2(e_sub, c_sub)
                # strict < keeps the FIRST minimum: cb is sorted by code,
                # so ties resolve to the lowest code — the oracle's
                # ORDER BY d ASC, code ASC
                return F.when(
                    d < acc["d"],
                    F.struct(d.alias("d"), cw["code"].alias("c")),
                ).otherwise(acc)

            return F.aggregate(F.col("cb"), init, step, lambda a: a["c"])

        return F.transform(
            F.sequence(F.lit(0), F.lit(m_sub - 1)), argmin_for
        )

    return (
        embeddings.join(
            F.broadcast(pq_codebook(embeddings, n_codes, vec_col, id_col))
        )
        .select(F.col(id_col), codes_expr().alias("codes"))
    )


def pq_adc_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m_sub: int = 8,
    sub_dim: int = 8,
    n_codes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """PQ asymmetric-distance top-k (FAISS IndexPQ / Jegou et al. 2011):
    approx dist^2(q, x) = sum over subspaces of the exact squared L2
    between q's subvector and x's ASSIGNED CODEWORD — the third ANN
    scale path next to hyperplane LSH (replicates the corpus n_tables
    times) and IVF-Flat (prunes cells but stores raw vectors): PQ scans
    everything but touches only m_sub-byte codes per candidate, and
    composes with ivf_assign for IVF-PQ (cell prune + code scan).

    Determinism: each per-subspace contribution is integer-scaled to
    nano units (round(d * 1e9) -> BIGINT) BEFORE the per-candidate sum,
    so the fold is order-free exact arithmetic and the DuckDB oracle's
    GROUP-BY sum (a different order) replays it bit-for-bit — the
    retrieval.py BM25 convention. Top-k ranks on the exact integer
    (ties -> neighbor id); the 6-dp double is presentation only.

    Output: (query_id, rank, neighbor_id, adc_dist) — adc_dist ASCENDS
    (a distance, not a similarity). Plan shape: encode is map-side
    (pq_encode), queries and codebook broadcast; candidates stream
    through one projection and the final per-query top-k window."""
    from pyspark.sql import Window

    enc = pq_encode(
        embeddings, m_sub, sub_dim, n_codes, vec_col, id_col
    ).select(F.col(id_col).alias("neighbor_id"), "codes")
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )

    def nano_sum():
        def step(acc, m):
            cw_vec = F.element_at(
                F.col("cb"), F.element_at(F.col("codes"), m + 1) + 1
            )["cb_vec"]
            q_sub = F.slice(F.col("q_vec"), m * sub_dim + 1, sub_dim)
            c_sub = F.slice(cw_vec, m * sub_dim + 1, sub_dim)
            return acc + F.round(
                _sub_l2(q_sub, c_sub) * _PQ_SCALE
            ).cast("bigint")

        return F.aggregate(
            F.sequence(F.lit(0), F.lit(m_sub - 1)),
            F.lit(0).cast("bigint"),
            step,
        )

    wk = Window.partitionBy("query_id").orderBy(
        F.asc("adc_nano"), F.asc("neighbor_id")
    )
    return (
        enc.join(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .join(
            F.broadcast(pq_codebook(embeddings, n_codes, vec_col, id_col))
        )
        .select("query_id", "neighbor_id", nano_sum().alias("adc_nano"))
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            F.round(F.col("adc_nano") / float(_PQ_SCALE), 6).alias(
                "adc_dist"
            ),
        )
    )


def ivf_pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    m_sub: int = 8,
    sub_dim: int = 8,
    n_codes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    index: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """IVF-PQ (the FAISS production shape): IVF cell pruning composed
    with PQ code scanning — each query probes its ``n_probe`` nearest
    cells by cosine (ivf_assign's convention) and ADC-scores ONLY those
    cells' members, touching m_sub-byte codes instead of raw vectors.
    Candidate work per query drops from O(N) (pq_adc_topk) to
    O(N * n_probe / n_centroids), and the scanned relation is the
    compressed code table — the two scale levers multiply.

    ``index``: optionally pass the precomputed ``(codes, cells)``
    relations — ``pq_encode(...)`` with (vec_id, codes) and
    ``ivf_assign(...)`` with (vec_id, cell) — the production shape: at
    corpus scale the index is built once per snapshot and stored (it IS
    the compressed corpus), and per-query-batch cost is then just the
    probe joins; ``None`` derives both from ``embeddings`` inline.
    Results are identical either way (pinned in tests).

    Classic FAISS encodes RESIDUALS (vector minus cell centroid) for
    accuracy; codes here quantize the raw vector — same plumbing,
    schema, and plan shape, chosen so the whole operator (assignment,
    encoding, ADC) stays SQL-expressible for the oracle. (Residuals
    were probed on the clustered fixture and read WORSE there —
    cluster residuals are iid noise, nothing to quantize.) Determinism
    and output contract identical to pq_adc_topk (nano-int order-free
    sums; (query_id, rank, neighbor_id, adc_dist) ascending)."""
    from pyspark.sql import Window

    cent = embeddings.filter(F.col(id_col) < n_centroids).select(
        F.col(id_col).alias("cell"), F.col(vec_col).alias("cent_vec")
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cell"))
    probes = (
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
        .join(F.broadcast(cent))
        .withColumn("cos", cosine_col(F.col("q_vec"), F.col("cent_vec")))
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "cell", "q_vec")
    )

    if index is not None:
        codes_rel, cells_rel = index
    else:
        codes_rel = pq_encode(
            embeddings, m_sub, sub_dim, n_codes, vec_col, id_col
        )
        cells_rel = ivf_assign(embeddings, n_centroids, vec_col, id_col)
    enc = codes_rel.select(F.col(id_col).alias("neighbor_id"), "codes")
    cand = enc.join(
        cells_rel.select(F.col(id_col).alias("neighbor_id"), "cell"),
        "neighbor_id",
    )

    def nano_sum():
        def step(acc, m):
            cw_vec = F.element_at(
                F.col("cb"), F.element_at(F.col("codes"), m + 1) + 1
            )["cb_vec"]
            q_sub = F.slice(F.col("q_vec"), m * sub_dim + 1, sub_dim)
            c_sub = F.slice(cw_vec, m * sub_dim + 1, sub_dim)
            return acc + F.round(
                _sub_l2(q_sub, c_sub) * _PQ_SCALE
            ).cast("bigint")

        return F.aggregate(
            F.sequence(F.lit(0), F.lit(m_sub - 1)),
            F.lit(0).cast("bigint"),
            step,
        )

    wk = Window.partitionBy("query_id").orderBy(
        F.asc("adc_nano"), F.asc("neighbor_id")
    )
    return (
        cand.join(F.broadcast(probes), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .join(
            F.broadcast(pq_codebook(embeddings, n_codes, vec_col, id_col))
        )
        .select("query_id", "neighbor_id", nano_sum().alias("adc_nano"))
        .withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            F.round(F.col("adc_nano") / float(_PQ_SCALE), 6).alias(
                "adc_dist"
            ),
        )
    )
