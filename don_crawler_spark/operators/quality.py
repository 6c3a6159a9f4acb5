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


def linear_quality_score(
    docs: DataFrame,
    keep_at: float = 0.02,
    drop_at: float = -0.02,
) -> DataFrame:
    """fastText-style hashed-feature linear classifier INFERENCE
    (Joulin et al. 2016, "Bag of Tricks for Efficient Text
    Classification" — the shape CCNet/RedPajama use for their quality
    classifiers): score(doc) = mean over tokens of w[h(token)], then
    threshold into keep / review / drop. Real pipelines load a trained
    weight table; here the weight for a token is a DETERMINISTIC
    function of the token itself — the first 32 bits of md5(token),
    centered to [-2^31, 2^31) — which keeps the whole computation
    closed over the input table and byte-replayable by the DuckDB
    oracle while exercising exactly the production plan shape (hash
    feature -> weight lookup -> mean -> threshold).

    EXACTNESS: per-token weights are integers and the per-doc sum is a
    BIGINT fold — associative, order-free, engine-exact (the module's
    fixed-point rule). The single final division to [-1, 1] happens
    once per doc on exact integer inputs, so the ROUND(.., 6) agrees
    across engines. Thresholds compare the rounded score.

    Returns (doc_id, n_tokens, score, label); empty docs score 0.0 and
    label 'drop' (degrade-don't-drop).

    SCALE: one map-side projection — the token hash, weight lookup and
    fold all run inside array HOFs over the already-loaded text; no
    exchange, no join, no Python. A real weight table would instead be
    a broadcast map lookup (vocabulary-sized, like ppl_buckets' freq
    relation); the plan shape is otherwise identical.
    """
    toks = tokens_col()
    w = lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast(
        "long"
    ) - F.lit(2147483648)
    sw = F.aggregate(
        F.col("t"), F.lit(0).cast("long"), lambda acc, t: acc + w(t)
    )
    scored = docs.select(
        "doc_id", F.size(toks).cast("int").alias("n_tokens"), toks.alias("t")
    ).select(
        "doc_id",
        "n_tokens",
        F.when(F.col("n_tokens") == 0, F.lit(0.0))
        .otherwise(
            F.round(sw / (F.col("n_tokens") * F.lit(2147483648.0)), 6)
        )
        .alias("score"),
    )
    return scored.select(
        "doc_id",
        "n_tokens",
        "score",
        F.when(F.col("n_tokens") == 0, F.lit("drop"))
        .when(F.col("score") >= keep_at, F.lit("keep"))
        .when(F.col("score") < drop_at, F.lit("drop"))
        .otherwise(F.lit("review"))
        .alias("label"),
    )


def gopher_rules(
    docs: DataFrame,
    sep: str = "\n",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: float = 3.0,
    max_mean_len: float = 10.0,
    symbol_re: str = "[#…]",
    max_symbol_ratio: float = 0.1,
    bullet_prefix: str = "•",
    max_bullet_frac: float = 0.9,
    ellipsis_suffix: str = "...",
    max_ellipsis_frac: float = 0.3,
    alpha_re: str = "[A-Za-z]",
    min_alpha_frac: float = 0.8,
    stop_words: tuple[str, ...] = (
        "the", "be", "to", "of", "and", "that", "have", "with",
    ),
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher document-level quality rules (Rae et al. 2021, "Scaling
    Language Models: Methods, Analysis & Insights from Training Gopher",
    Table A1): a document passes iff (1) its word count is in
    [min_words, max_words], (2) mean word length is in [min_mean_len,
    max_mean_len], (3) the symbol-to-word ratio (matches of
    ``symbol_re`` per word — the paper counts '#' and ellipsis) is at
    most ``max_symbol_ratio``, (4) at most ``max_bullet_frac`` of lines
    start with a bullet, (5) at most ``max_ellipsis_frac`` of lines end
    with an ellipsis, (6) at least ``min_alpha_frac`` of words contain
    an alphabetic character, and (7) at least ``min_stop_hits`` DISTINCT
    designated stop words occur. Every constant is a parameter — the
    paper's values are tuned to English web prose; the registered
    binding re-tunes them to the synthetic corpus so each rule stays
    discriminating (see __spark_entry__.py quality_gopher_rules).

    Returns one row per doc: the raw metrics (n_words, mean_word_len,
    symbol_ratio, bullet_frac, ellipsis_frac, alpha_frac, n_stop_hits),
    the seven per-rule booleans (r_word_count .. r_stop_words) and the
    conjunction ``passes`` — degrade-don't-drop: failing docs keep their
    row with the reasons visible.

    EXACTNESS: every metric is a ratio of two integers computed once
    per doc (single IEEE division on exact inputs — both engines get the
    identical double, so threshold comparisons agree bit-for-bit);
    mean_word_len additionally rounds to 6 places BEFORE its rule
    compares, mirroring the oracle. No distributed float sum anywhere.

    SCALE: one map-side projection, zero exchanges/joins/Python — the
    word/line arrays and all seven rules evaluate inside array HOFs over
    the already-loaded text; scan-bound at 100 TB like pii_scrub.
    """
    import re as _re

    words = tokens_col()
    lines = F.transform(
        F.split(F.col("text"), _re.escape(sep)), lambda l: F.trim(l)
    )
    nw = F.size(words)
    nl = F.size(lines)
    d = F.greatest(nw, F.lit(1)).cast("double")
    dl = F.greatest(nl, F.lit(1)).cast("double")
    mean_len = F.round(
        F.aggregate(
            words, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
        )
        / d,
        6,
    )
    sym = F.size(F.regexp_extract_all(F.col("text"), F.lit(symbol_re), 0)) / d
    bul = F.size(F.filter(lines, lambda l: l.startswith(bullet_prefix))) / dl
    ell = F.size(F.filter(lines, lambda l: l.endswith(ellipsis_suffix))) / dl
    alpha = F.size(F.filter(words, lambda t: t.rlike(alpha_re))) / d
    stops = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in stop_words]),
            lambda s: F.array_contains(words, s),
        )
    )
    m = docs.select(
        "doc_id",
        nw.cast("int").alias("n_words"),
        mean_len.alias("mean_word_len"),
        F.round(sym, 6).alias("symbol_ratio"),
        F.round(bul, 6).alias("bullet_frac"),
        F.round(ell, 6).alias("ellipsis_frac"),
        F.round(alpha, 6).alias("alpha_frac"),
        stops.cast("int").alias("n_stop_hits"),
    )
    r = m.select(
        "*",
        F.col("n_words").between(min_words, max_words).alias("r_word_count"),
        F.col("mean_word_len")
        .between(min_mean_len, max_mean_len)
        .alias("r_mean_len"),
        (F.col("symbol_ratio") <= max_symbol_ratio).alias("r_symbols"),
        (F.col("bullet_frac") <= max_bullet_frac).alias("r_bullets"),
        (F.col("ellipsis_frac") <= max_ellipsis_frac).alias("r_ellipsis"),
        (F.col("alpha_frac") >= min_alpha_frac).alias("r_alpha"),
        (F.col("n_stop_hits") >= min_stop_hits).alias("r_stop_words"),
    )
    passes = (
        F.col("r_word_count")
        & F.col("r_mean_len")
        & F.col("r_symbols")
        & F.col("r_bullets")
        & F.col("r_ellipsis")
        & F.col("r_alpha")
        & F.col("r_stop_words")
    )
    return r.select("*", passes.alias("passes"))
