"""Full-text retrieval over the extracted-text corpus: BM25 top-k scoring.

The crawl side of the reference (crawler/crawler.go) produces extracted
text; the natural downstream consumer in a webtext pipeline is a ranked
retrieval index. This operator scores every document against a fixed
query-term set with BM25 (Robertson/Sparck-Jones; the +1 idf variant used
by Lucene) and returns the global top-k — the batch "build the relevance
slice" job a training pipeline runs to mine topical subsets.

Plan shape (designed for 10^10 docs):
- the token array is pruned to the query terms MAP-SIDE (array filter
  before the explode), so the shuffle carries only matching-term rows —
  O(corpus hits), not O(corpus tokens);
- corpus scalars (N, avgdl) and the per-term document frequencies are
  single-digit-row aggregates, broadcast to the score join;
- per-term contributions are scaled to integers (round(w * 1e9)) BEFORE
  the per-doc sum, so the aggregate is exact integer arithmetic — no
  float summation-order nondeterminism between partitions (and the DuckDB
  oracle replays it bit-for-bit);
- the final top-k is an orderBy().limit() — TakeOrderedAndProject,
  per-partition heads only, never a global sort.

No Python UDFs anywhere; every expression is native/codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from don_crawler_spark.operators.dedup import tokens_col

# deterministic module constants, inlined identically in the DuckDB oracle
BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY: list[str] = ["merge", "window", "customer"]
BM25_TOPK = 20
_SCALE = 1_000_000_000  # integer scale for order-free double summation


def _bm25_scored(
    docs: DataFrame,
    terms: list[str],
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(doc_id, n_terms, raw_i) for every doc matching >=1 query term —
    raw_i is the integer-scaled exact BM25 score (see module docstring)."""
    from pyspark import StorageLevel

    base = docs.select(
        "doc_id", tokens_col().alias("toks")
    ).select(
        "doc_id",
        F.size("toks").alias("dl"),
        # map-side prune: only query-term occurrences survive to the explode
        F.filter("toks", lambda t: t.isin(*terms)).alias("qtoks"),
    )
    # three consumers (corpus scalars; the tf aggregate feeds both the
    # df dimension and the score join): persist the pruned
    # (doc_id, dl, qtoks) relation — a few bytes per doc — so the full
    # tokenize + term filter over the corpus text runs once, not once
    # per consumer
    base = base.persist(StorageLevel.MEMORY_AND_DISK)

    # corpus scalars over ALL docs (single row -> broadcast cross join)
    stats = base.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    tf = (
        base.filter(F.size("qtoks") > 0)
        .select("doc_id", "dl", F.explode("qtoks").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_tbl = tf.groupBy("term").agg(F.count("*").alias("df"))

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (
        (1.0 - b) + b * F.col("dl") / F.col("avgdl")
    )
    # left-assoc multiplication mirrors the oracle's SQL parse exactly
    w = ((idf * F.col("tf")) * (k1 + 1.0)) / denom
    w_i = F.round(w * _SCALE).cast("bigint")

    return (
        tf.join(F.broadcast(df_tbl), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", w_i.alias("w_i"))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("int").alias("n_terms"),
            F.sum("w_i").alias("raw_i"),
        )
    )


def bm25_topk(
    docs: DataFrame,
    terms: list[str] | None = None,
    k: int = BM25_TOPK,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Global BM25 top-k for a fixed query-term set.

    Output: (doc_id, n_terms, bm25) — matched distinct query terms and the
    score rounded to 6 decimals; rows ordered by score desc, doc_id asc.
    Top-k selects on the EXACT integer score (ties broken by doc_id) so
    the boundary row is identical in Spark and the DuckDB oracle; the
    rounded double is presentation only.
    """
    terms = list(BM25_QUERY if terms is None else terms)
    return (
        _bm25_scored(docs, terms, k1, b)
        .orderBy(F.desc("raw_i"), "doc_id")
        .limit(k)
        .select(
            "doc_id",
            "n_terms",
            F.round(F.col("raw_i") / float(_SCALE), 6).alias("bm25"),
        )
    )


# --- hybrid retrieval: reciprocal-rank fusion -------------------------------

RRF_C = 60  # the standard RRF damping constant (Cormack et al. 2009)
RRF_POOL = 100  # per-signal candidate pool depth
RRF_TOPK = 20
RRF_QUERY_VEC_ID = 0  # embedding standing in for the encoded query


def hybrid_rrf_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    terms: list[str] | None = None,
    query_vec_id: int = RRF_QUERY_VEC_ID,
    pool: int = RRF_POOL,
    k: int = RRF_TOPK,
) -> DataFrame:
    """Hybrid sparse+dense retrieval via reciprocal-rank fusion: fuse the
    BM25 top-`pool` for the query terms with the cosine top-`pool`
    against a query embedding; fused score = sum over signals of
    1/(RRF_C + rank), docs absent from a list contribute 0 from it.

    Plan shape (for 10^10 docs): each signal narrows to its top-`pool`
    with TakeOrderedAndProject (per-partition heads, exact deterministic
    keys: integer BM25 score / 6-dp-rounded cosine, ties by id), so the
    rank windows and the full-outer fusion join run over <= 2*pool rows —
    constant-size post-retrieval work regardless of corpus size. The
    dense side is one broadcast of the single query vector and a map-side
    codegen dot product; no Python anywhere.

    Output: (doc_id, bm25_rank, cos_rank, rrf), top-k by fused score
    desc, doc_id asc. Ranks are NULL for a doc missing from that signal's
    pool.
    """
    from pyspark.sql import Window

    terms = list(BM25_QUERY if terms is None else terms)

    sparse_pool = (
        _bm25_scored(docs, terms)
        .orderBy(F.desc("raw_i"), "doc_id")
        .limit(pool)
    )
    # windows below run over <= pool rows (post-top-k), so the single
    # partition is bounded by construction — not a corpus-scale sort
    sparse = sparse_pool.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("raw_i"), "doc_id"))
        .cast("int")
        .alias("bm25_rank"),
    )

    from don_crawler_spark.operators.similarity import cosine_col

    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_vec")
    )
    dense_pool = (
        embeddings.crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine_col(F.col("embedding"), F.col("q_vec")), 6).alias(
                "cos6"
            ),
        )
        .orderBy(F.desc("cos6"), "doc_id")
        .limit(pool)
    )
    dense = dense_pool.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("cos6"), "doc_id"))
        .cast("int")
        .alias("cos_rank"),
    )

    contrib = lambda r: F.coalesce(
        F.lit(1.0) / (F.lit(RRF_C) + F.col(r)), F.lit(0.0)
    )
    fused = sparse.join(dense, "doc_id", "full_outer").select(
        "doc_id",
        "bm25_rank",
        "cos_rank",
        (contrib("bm25_rank") + contrib("cos_rank")).alias("rrf_raw"),
    )
    return (
        fused.orderBy(F.desc("rrf_raw"), "doc_id")
        .limit(k)
        .select(
            "doc_id",
            "bm25_rank",
            "cos_rank",
            F.round("rrf_raw", 6).alias("rrf"),
        )
    )


INDEX_SHARDS = 8


def inverted_index(docs: DataFrame, n_shards: int = INDEX_SHARDS) -> DataFrame:
    """Sharded inverted-index construction — the artifact BM25 serving
    reads (term -> posting list), built as a table instead of queried
    on the fly. One row per (term, shard): per-shard document
    frequency, total term frequency, and the posting list rendered as
    a deterministic ``doc:tf`` string sorted by doc_id.

    Sharding is the scale contract: postings are grouped by
    ``doc_id % n_shards``, so a stopword-scale term's list splits into
    n_shards bounded rows instead of one collect_list the size of the
    corpus — the standard partitioned-index layout (each shard serves
    its own doc-id range; per-term stats re-aggregate across shards by
    summing df). At 100 TB, raise n_shards with the corpus; the plan
    is unchanged.

    Plan shape: one (term, doc_id) partial-agg shuffle for tf (the
    shuffle carries two longs per posting, never text), then one
    (term, shard) shuffle whose groups are posting-shard-bounded.
    sort_array over (doc_id, tf) structs pins the in-list order, so
    the rendered string is reproducible and oracle-comparable.
    """
    from don_crawler_spark.operators.dedup import tokens_col

    tf = (
        docs.select("doc_id", F.explode(tokens_col()).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    posting = F.transform(
        F.sort_array(F.collect_list(F.struct("doc_id", "tf"))),
        lambda s: F.concat(s["doc_id"], F.lit(":"), s["tf"]),
    )
    return (
        tf.groupBy("term", (F.col("doc_id") % n_shards).alias("shard"))
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("total_tf"),
            F.concat_ws(" ", posting).alias("postings"),
        )
        .select("term", "shard", "df", "total_tf", "postings")
    )
