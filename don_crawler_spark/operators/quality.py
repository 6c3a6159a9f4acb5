"""Corpus-quality scoring operators: CCNet-style unigram-LM perplexity
bucketing and per-document TF-IDF keyword extraction.

Both extend the training-data curation family (operators/hygiene.py,
operators/textstats.py) with the two standard *model-based* quality
signals a webtext pipeline runs after hygiene and before sampling:

- **Perplexity buckets** (CCNet, Wenzek et al. 2020 §4.3): score every
  document by its average negative log-likelihood under a unigram LM
  estimated from a trusted reference slice, then split each language
  into head / middle / tail terciles. CCNet trains a KenLM on Wikipedia;
  here the reference slice is a deterministic subset of the corpus
  itself (``doc_id % ref_mod == 0``) so the whole computation is closed
  over the input table.
- **TF-IDF top-k terms** (Spärck Jones 1972): the k highest
  tf·idf-weighted terms per document — the classic two-aggregation
  relational shape (term frequencies, document frequencies, join back,
  per-doc top-k window).

EXACTNESS DESIGN (shared with operators/graph.py): every distributed
floating-point SUM is replaced by a fixed-point BIGINT sum. Each
per-token score is computed in double precision, scaled by 1e9 and
rounded to a BIGINT *before* aggregation ("nano-nats"); integer addition
is associative and commutative, so the aggregate is bit-identical
regardless of partitioning, reduce order, or engine (Spark vs the DuckDB
oracle) — the one remaining cross-engine risk is a per-distinct-token
``ln`` ULP difference landing exactly on a .5 rounding boundary
(~1e-7 per vocabulary entry, double-bounded by the final ROUND(.., 6)).
A raw ``SUM(double)`` here would differ between engines on every run.

SCALE NOTES
- The reference vocabulary (unigram counts) is a token-keyed relation of
  vocabulary size — 10^5..10^7 rows even on web corpora — and is
  BROADCAST onto the exploded token stream: the corpus tokens are scored
  map-side and collapse via a partial-aggregated ``groupBy(doc_id)``
  (integer sums combine map-side) — one shuffle of (doc_id, bigint)
  pairs, never of text.
- The per-language tercile NTILE window hash-partitions by language:
  with ~100 languages that is a deliberate skew cliff at petabyte scale.
  CCNet itself solves this with *precomputed* per-language cutoffs; the
  production path is: aggregate per-language (cheap, after the nll
  reduction the relation is one row per doc), approx-quantile the
  cutoffs, broadcast, map-side bucket. The NTILE form is kept here
  because it is exactly ntile-reproducible in the oracle; the cutoff
  form is the documented 100-TB variant.
- TF-IDF: document frequencies are again a vocabulary-sized broadcast;
  the per-doc top-k window partitions by doc_id (10^10 keys — no skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from don_crawler_spark.operators.dedup import tokens_col

NANO = 1_000_000_000


def ppl_buckets(docs: DataFrame, ref_mod: int = 10) -> DataFrame:
    """CCNet-style head/middle/tail perplexity terciles per language.

    Unigram LM with add-one smoothing over the reference slice
    (``doc_id % ref_mod == 0``): p(t) = (c_t + 1) / (N + V + 1), where
    N = reference token count, V = reference vocabulary size; unseen
    tokens take c_t = 0. Per-doc score = mean of -ln p(t) in nano-nats
    (see module doc). Buckets: NTILE(3) over (lang) ordered by the
    rounded score then doc_id — head = most reference-like.
    """
    toks = docs.select("doc_id", "lang", tokens_col().alias("t"))
    ref = toks.filter((F.col("doc_id") % ref_mod) == 0).select(
        F.explode("t").alias("tok")
    )
    freq = ref.groupBy("tok").agg(F.count("*").alias("c"))
    consts = freq.agg(
        F.sum("c").alias("n_ref"), F.count("*").alias("v_ref")
    )

    tt = toks.filter(F.size("t") > 0).select(
        "doc_id", "lang", F.size("t").alias("n_tokens"), F.explode("t").alias("tok")
    )
    scored = (
        tt.join(F.broadcast(freq), "tok", "left")
        .crossJoin(F.broadcast(consts))
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.round(
                -F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) + F.lit(1))
                    / (F.col("n_ref") + F.col("v_ref") + F.lit(1.0))
                )
                * NANO
            )
            .cast("long")
            .alias("nll_i"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.first("lang").alias("lang"),
        F.first("n_tokens").alias("n_tokens"),
        F.sum("nll_i").alias("s"),
    )
    b = agg.select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.round(F.col("s") / (F.col("n_tokens") * F.lit(float(NANO))), 6).alias(
            "avg_nll"
        ),
    )
    w = Window.partitionBy("lang").orderBy("avg_nll", "doc_id")
    return b.select(
        "doc_id",
        "lang",
        "n_tokens",
        "avg_nll",
        F.ntile(3).over(w).alias("bucket"),
    )


def length_quantiles(docs: DataFrame) -> DataFrame:
    """Per-language document-length distribution: exact interpolated
    p25/p50/p75/p95 of n_chars plus count. Both engines implement the
    standard linear-interpolation quantile ((1-g)*lo + g*hi on the
    sorted values), and the inputs are integers exactly representable in
    double, so the rounded outputs agree.

    SCALE NOTE: exact per-group percentiles sort every group member —
    fine for a bounded label set like language (the sort is
    per-partition after one hash exchange), but the 100-TB path for
    high-cardinality groups or global quantiles is
    ``approx_percentile`` (t-digest: mergeable map-side sketches, one
    tiny shuffle), traded here for oracle-exact output."""
    pct = F.percentile("n_chars", F.array(*[F.lit(x) for x in (0.25, 0.5, 0.75, 0.95)]))
    agg = docs.groupBy("lang").agg(
        F.count("*").cast("int").alias("n_docs"), pct.alias("q")
    )
    return agg.select(
        "lang",
        "n_docs",
        F.round(F.col("q")[0], 6).alias("p25"),
        F.round(F.col("q")[1], 6).alias("p50"),
        F.round(F.col("q")[2], 6).alias("p75"),
        F.round(F.col("q")[3], 6).alias("p95"),
    )


def tfidf_topk(docs: DataFrame, k: int = 3) -> DataFrame:
    """Top-k tf·idf terms per document; idf = ln(n_docs / df), weights
    ranked and emitted in nano units (see module doc) so the ordering
    and the rounded output are engine-exact. Ties break on the term."""
    toks = docs.select("doc_id", F.explode(tokens_col()).alias("tok"))
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    nd = docs.agg(F.count("*").alias("n_docs"))
    s = (
        tf.join(F.broadcast(df), "tok")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "tok",
            "tf",
            F.round(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df"))
                * NANO
            )
            .cast("long")
            .alias("w_i"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("w_i").desc(), F.col("tok"))
    return (
        s.select(
            "doc_id",
            F.row_number().over(w).alias("rank"),
            F.col("tok").alias("term"),
            F.col("tf").cast("int").alias("tf"),
            F.round(F.col("w_i") / F.lit(float(NANO)), 6).alias("tfidf"),
        )
        .filter(F.col("rank") <= k)
    )
