"""Text analysis operators: language ID, quality scoring, token counting,
fingerprinting. All native column expressions (codegen'd, no Python), each
with an exact DuckDB-oracle counterpart in __spark_entry__.py.

These extend the reference's text handling (README extraction + description
fallbacks, crawler/crawler.go:671-746) to the corpus-hygiene operations a
web-scale training-data pipeline runs after extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from don_crawler_spark.operators.dedup import tokens_col

# tiny deterministic stopword lists per language (demo lexicons; a real
# deployment would broadcast proper frequency tables — the PLAN is the same:
# one map-side expression, no shuffle)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "a", "value", "row"],
    "de": ["der", "die", "und", "das"],
    "fr": ["le", "la", "et", "les"],
    "es": ["el", "los", "y", "una"],
    "nl": ["de", "het", "een", "van"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def token_count(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.size(tokens_col()).alias("n_tokens")
    )


# GPT-2-style pre-tokenizer approximation, restricted to constructs with
# identical semantics in Java regex (Spark) and RE2 (DuckDB): contraction
# suffixes, space-prefixed letter runs, digit runs, punctuation runs,
# whitespace runs. No lookarounds (RE2 has none) and no \p classes (kept
# ASCII so both engines agree byte-for-byte); leftmost-first alternation
# is common to both.
BPE_SPLIT_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def subword_token_count(docs: DataFrame) -> DataFrame:
    """Token counts under BOTH tokenizations a data pipeline budgets with:
    whitespace words and BPE-ish pre-tokens (the better proxy for LLM
    token cost). One map-side expression, no shuffle."""
    return docs.select(
        "doc_id",
        F.size(tokens_col()).alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_SPLIT_RE), 0)).alias(
            "n_subwords"
        ),
    )


def quality_col(text: str = "text"):
    """The [0, 1] heuristic quality score as a bare Column, 6-dp rounded —
    shared by quality_score and the per-domain rollup (hygiene.domain_rollup)
    so the two cannot drift.

    score = 0.4 * saturating length ratio (n_tokens / 100)
          + 0.3 * (1 - punctuation char ratio)
          + 0.3 * stopword hit ratio (capped at 3x expected 5%)
    All doubles with identical formulas in the DuckDB oracle.
    """
    toks = tokens_col(text)
    n_tokens = F.size(toks)
    n_chars = F.length(text)
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[.,;:!?]", ""))
    n_stop = F.size(F.filter(toks, lambda t: F.lower(t).isin(STOPWORDS)))
    score = (
        F.lit(0.4) * F.least(F.lit(1.0), n_tokens / F.lit(100.0))
        + F.lit(0.3) * (F.lit(1.0) - n_punct / F.greatest(n_chars, F.lit(1)))
        + F.lit(0.3)
        * F.least(F.lit(1.0), n_stop / F.greatest(n_tokens, F.lit(1)) / F.lit(0.15))
    )
    return F.round(score, 6)


def quality_score(docs: DataFrame) -> DataFrame:
    """Length/punctuation/stopword heuristics -> [0, 1] score (see
    quality_col for the formula)."""
    return docs.select(
        "doc_id",
        F.col("n_chars").alias("n_chars"),
        F.size(tokens_col()).alias("n_tokens"),
        quality_col().alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language ID: argmax over per-language hit counts; ties
    and no-hits -> 'und'. Deterministic tie-break on language code order."""
    toks = tokens_col()

    def _hits(words: list[str]):
        # NB: the lambda must be unary — F.filter passes (element, index)
        # to two-argument lambdas.
        return F.size(F.filter(toks, lambda t: F.lower(t).isin(words)))

    scores = [(lang, _hits(words)) for lang, words in sorted(LANG_MARKERS.items())]
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    # first language (in sorted order) achieving the max wins
    for lang, s in reversed(scores):
        pred = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(pred)
    return docs.select("doc_id", "lang", pred.alias("pred_lang"))


def fingerprint(docs: DataFrame) -> DataFrame:
    """Normalized content fingerprint: lowercase, collapse whitespace,
    md5. The dedup key for 'same text modulo formatting'."""
    norm = F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
    return docs.select(
        "doc_id", F.md5(F.trim(norm)).alias("fingerprint")
    )


NGRAM_TOPK_N = 3  # gram width
NGRAM_TOPK_K = 20  # rows returned


def ngram_topk(
    docs: DataFrame, n: int = NGRAM_TOPK_N, k: int = NGRAM_TOPK_K
) -> DataFrame:
    """Corpus-level top-k most frequent word n-grams — the boilerplate /
    template-discovery analysis pass (what "most common 3-grams in the
    crawl" dashboards run).

    Plan shape: explode all (non-distinct) n-grams map-side, one
    hash-partitioned count with map-side partial aggregation, then a
    global TakeOrderedAndProject(k) on (count DESC, gram) — each
    partition ships only its local top-k to the driver, never the full
    gram distribution (which at 100 TB is itself TB-scale). Ties are
    broken by gram text, so the k rows are deterministic.
    """
    from don_crawler_spark.operators.pipeline import _grams

    grams = _grams(tokens_col(), n)
    return (
        docs.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "gram")
        .limit(k)
    )


BPE_PAIR_TOPK = 50


def bpe_pair_stats(docs: DataFrame, k: int = BPE_PAIR_TOPK) -> DataFrame:
    """Corpus-wide adjacent pre-token pair frequencies, top-k — the
    counting statistic of one BPE merge step (Sennrich et al. 2016): the
    pair that would be merged next is the head of this table. Running it
    over the extracted-text corpus is how a tokenizer-induction pipeline
    picks its merge table.

    Plan shape: the pair explode is map-side (transform over the
    subword array, no self-join), the count is one hash-partitioned
    aggregate with map-side combine, and the top-k is
    TakeOrderedAndProject on (count DESC, left_tok, right_tok) — each
    partition ships only its local head, never the full pair
    distribution (vocab^2-shaped at corpus scale).
    """
    sub = F.regexp_extract_all(F.col("text"), F.lit(BPE_SPLIT_RE), 0)
    pair_t = "array<struct<l:string,r:string>>"
    pairs = F.when(
        F.size(sub) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(sub) - 1),
            lambda i: F.struct(
                F.element_at(sub, i).alias("l"),
                F.element_at(sub, i + 1).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast(pair_t))
    return (
        docs.select(F.explode(pairs).alias("p"))
        .select(F.col("p.l").alias("left_tok"), F.col("p.r").alias("right_tok"))
        .groupBy("left_tok", "right_tok")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy(F.desc("n_pairs"), "left_tok", "right_tok")
        .limit(k)
    )


def token_entropy(docs: DataFrame) -> DataFrame:
    """Per-doc unigram token entropy + distinct-token count — the
    vocabulary-diversity quality signal (near-zero entropy = keyword
    stuffing / template spam; see the repetition family in
    operators/pipeline.py for the n-gram variants).

    Kernel: ONE map-side fold over the SORTED token array (same
    run-length idea as pipeline._run_length_stats) — each closed run of
    length c contributes (c/n)*ln(n/c), integer-scaled to 1e-9 nats
    BEFORE accumulation so the sum is exact integer arithmetic and the
    DuckDB oracle (which sums per-(doc,token) groups, a different order)
    replays it bit-for-bit. Zero exchanges, zero Python; at 100 TB this
    is a pure scan->project.
    """
    base = (
        docs.select("doc_id", F.sort_array(tokens_col()).alias("s"))
        .withColumn("n", F.size("s"))
        .filter(F.col("n") > 0)
    )
    nd = F.col("n").cast("double")

    def contrib(run):
        rd = run.cast("double")
        return F.round(((rd / nd) * F.log(nd / rd)) * 1_000_000_000).cast(
            "bigint"
        )

    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("acc"),
        F.lit(0).cast("int").alias("distinct"),
    )

    def step(acc, x):
        extend = x.eqNullSafe(acc["prev"])
        closed = F.when(
            acc["run"] > 0, acc["acc"] + contrib(acc["run"])
        ).otherwise(acc["acc"])
        return F.struct(
            x.alias("prev"),
            F.when(extend, acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.when(extend, acc["acc"]).otherwise(closed).alias("acc"),
            F.when(extend, acc["distinct"])
            .otherwise(acc["distinct"] + 1)
            .alias("distinct"),
        )

    def finish(acc):  # close the trailing run (s is non-empty, so run >= 1)
        return F.struct(
            (acc["acc"] + contrib(acc["run"])).alias("acc"),
            acc["distinct"].alias("distinct"),
        )

    folded = F.aggregate(F.col("s"), init, step, finish)
    return base.select(
        "doc_id",
        F.col("n").cast("int").alias("n_tokens"),
        folded["distinct"].alias("n_distinct"),
        F.round(folded["acc"] / 1_000_000_000.0, 6).alias("token_entropy"),
    )


WINNOW_K = 3  # k-gram width (word grams)
WINNOW_W = 4  # winnowing window (selection guarantee: w + k - 1 tokens)


def winnow_sketch(
    docs: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """Winnowing fingerprint sketch (Schleimer, Wilkerson & Aiken 2003,
    "Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
    selection scheme): hash every word k-gram, slide a w-wide window over
    the hash sequence, select each window's minimum; the sketch is the
    distinct selected hashes. Guarantee: any match of at least w + k - 1
    consecutive tokens between two documents shares at least one sketch
    fingerprint, while sketch density stays ~2/(w+1) of the grams — the
    principled sparse alternative to keeping all shingles (dedup_*) or a
    single rolling hash (text_fingerprint).

    Gram hash = first 32 md5 bits as bigint (the cross-engine convention:
    DuckDB replays md5 exactly; xxhash64 has no DuckDB counterpart).
    Short docs: fewer grams than w still emit one window (the min of all
    grams — the paper's contract that every non-empty doc has a sketch);
    docs with fewer than k tokens emit nothing.

    Plan / scale: pure map-side transform -> array_min over slices ->
    array_distinct -> explode. ZERO shuffles; per-doc work is O(n_grams *
    w) comparisons inside codegen'd HOFs.
    """
    toks = tokens_col()
    idx = F.sequence(F.lit(1), F.size(toks) - (k - 1))
    grams = F.when(
        F.size(toks) >= k,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(k)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    hashes = F.transform(
        grams,
        lambda g: F.conv(F.substring(F.md5(g), 1, 8), 16, 10).cast("bigint"),
    )
    n_win = F.greatest(F.size(F.col("hs")) - (w - 1), F.lit(1))
    mins = F.when(F.size(F.col("hs")) == 0, F.array().cast("array<bigint>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n_win),
            lambda i: F.array_min(F.slice(F.col("hs"), i, w)),
        )
    )
    return (
        docs.select("doc_id", hashes.alias("hs"))
        .select("doc_id", F.explode(F.array_distinct(mins)).alias("fingerprint"))
    )


def corpus_cube_stats(docs: DataFrame) -> DataFrame:
    """Multi-dimensional corpus report: doc counts and token volume over
    the full (lang x source) CUBE — per cell, per language, per source,
    and grand total in ONE pass (the dataset-card / mixing-report
    query). ``gid`` is the grouping bitmask (Spark grouping_id; DuckDB
    GROUPING — same convention, first listed dim = high bit)
    disambiguating rolled-up NULLs from genuine NULL values.

    Plan / scale: CUBE plans as Expand (4 rows per input row) feeding a
    single hash aggregate — partial (map-side) aggregation collapses
    each low-cardinality cell before the ONE shuffle, so the exchange
    carries |lang| x |source| x 4 rows, not the corpus. The token-count
    projection is map-side codegen.
    """
    return (
        docs.cube("lang", "source")
        .agg(
            F.grouping_id().cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.size(tokens_col())).alias("total_tokens"),
        )
        .select("lang", "source", "gid", "n_docs", "total_tokens")
    )


DRIFT_TOPK = 50


def corpus_drift_topk(docs: DataFrame, k: int = DRIFT_TOPK) -> DataFrame:
    """Unigram distribution shift between two corpus slices — the
    between-dump drift monitor a recurring crawl runs before mixing a
    new snapshot into training data (the counting core of DSIR-style
    importance weights and of "what changed since the last dump"
    dashboards). Slices here are the deterministic doc_id parity halves;
    at deployment the slice column is the dump/source id.

    Per joint-vocabulary token with add-one smoothing, the smoothed
    probability difference p_a - p_b has sign and magnitude given
    exactly by the integer cross-product

        shift_num = (c_a + 1)(N_b + V) - (c_b + 1)(N_a + V)

    (the common denominator (N_a+V)(N_b+V) is positive and rank-
    preserving, so it is never materialized). The cross-product is
    computed in DECIMAL(38,0) — int64 overflows once a slice passes
    ~3e9 tokens (a single CC dump), which under ANSI would abort the
    query at exactly the scale the operator targets — and emitted as
    its exact decimal STRING: DuckDB's pandas bridge turns wide
    decimals into lossy float64, strings stay exact in both engines.
    No float/log ULP hazards anywhere — the pagerank/HITS discipline
    at 38 digits instead of 18.

    Plan shape: one hash-partitioned token aggregate with map-side
    partial combine (the only wide exchange; two small longs per
    token), a single-row totals aggregate broadcast back over the token
    frame, then TakeOrderedAndProject(k) on (|shift| DESC, token) — the
    full vocabulary never leaves the executors.
    """
    from don_crawler_spark.operators.dedup import tokens_col

    tok = docs.select(
        (F.col("doc_id") % 2).alias("slice"),
        F.explode(tokens_col()).alias("token"),
    )
    c = tok.groupBy("token").agg(
        F.sum(F.when(F.col("slice") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("slice") == 1, 1).otherwise(0)).alias("n_b"),
    )
    totals = c.agg(
        F.sum("n_a").alias("na"),
        F.sum("n_b").alias("nb"),
        F.count(F.lit(1)).alias("v"),
    )
    dec = lambda col: col.cast("decimal(19,0)")
    shift = (
        dec(F.col("n_a") + 1) * dec(F.col("nb") + F.col("v"))
        - dec(F.col("n_b") + 1) * dec(F.col("na") + F.col("v"))
    ).cast("decimal(38,0)")
    return (
        c.crossJoin(F.broadcast(totals))
        .select("token", "n_a", "n_b", shift.alias("_shift"))
        .orderBy(F.abs(F.col("_shift")).desc(), "token")
        .limit(k)
        .select("token", "n_a", "n_b", F.col("_shift").cast("string").alias("shift_num"))
    )


# (column name, Java regex class, priority order for the dominant
# tie-break). DuckDB mirrors with RE2's \p{Script} spellings — probed
# identical on mixed-script samples.
SCRIPT_CLASSES = (
    ("n_latin", r"\p{IsLatin}"),
    ("n_cyrillic", r"\p{IsCyrillic}"),
    ("n_han", r"\p{IsHan}"),
    ("n_arabic", r"\p{IsArabic}"),
)


def script_profile(docs: DataFrame, text: str = "text") -> DataFrame:
    """Per-document Unicode script mix — the signal that routes a
    multilingual crawl: fastText-style language ID is near-free once
    the script is known (Cyrillic text is never Portuguese), mixed
    profiles flag boilerplate-wrapped translations, and script-vs-
    declared-language disagreement is a classic mislabeling detector.

    Counts characters per major script class (Java ``\\p{IsScript}``
    classes; the DuckDB oracle replays with RE2's ``\\p{Script}``
    spelling — verified identical), plus digits, and names the
    dominant script with a fixed priority tie-break (latin > cyrillic
    > han > arabic > none, first max wins) so the verdict is
    deterministic and engine-independent.

    Pure codegen regexp_count projections — map-side only, zero
    exchanges, zero Python.
    """
    counts = [
        F.regexp_count(F.col(text), F.lit(pat)).cast("bigint").alias(name)
        for name, pat in SCRIPT_CLASSES
    ]
    cols = [name for name, _ in SCRIPT_CLASSES]
    top = F.greatest(*[F.col(c) for c in cols])
    dominant = F.when(top == 0, F.lit("none"))
    for c in cols:
        dominant = dominant.when(
            F.col(c) == top, F.lit(c[len("n_") :])
        )
    return docs.select(
        "doc_id",
        *counts,
        F.regexp_count(F.col(text), F.lit("[0-9]"))
        .cast("bigint")
        .alias("n_digit"),
        F.length(text).cast("bigint").alias("n_chars"),
    ).select(
        "doc_id",
        *cols,
        "n_digit",
        "n_chars",
        dominant.alias("dominant_script"),
    )


GROWTH_CHECKPOINTS = (10, 25, 50, 100, 250, 500, 1000)


def vocab_growth_curve(
    docs: DataFrame, checkpoints: tuple[int, ...] = GROWTH_CHECKPOINTS
) -> DataFrame:
    """Vocabulary growth curve (Heaps' law input) — distinct-token
    vocabulary size and cumulative token volume after the first N
    documents, for a fixed checkpoint ladder. The standard corpus-QA
    artifact: a growth exponent that flattens too early means heavy
    duplication or templated text; one that never flattens means
    tokenizer-hostile noise (OCR garbage, binary-in-text).

    Naive cumulative-distinct is a running set — unbounded state. The
    exact reformulation: a token FIRST enters the vocabulary at its
    minimum doc_id, so

        vocab(N) = |{tokens whose min doc_id <= N}|

    which is one token-keyed partial-agg shuffle (min + per-doc counts)
    followed by a checkpoint explode over the tiny per-token frame and
    a final partial-agg count — no running state, no window, no sort.
    Token volume reuses the same frame: sum of the token's occurrences
    in docs <= each checkpoint needs per-(token, bucket) counts, so the
    first aggregate keys on (token, first bucket that covers the doc)
    — still one shuffle, carrying two longs per distinct (token,
    bucket) pair.
    """
    cps = sorted(checkpoints)
    cp_lit = F.array(*[F.lit(c) for c in cps])
    # bucket(doc) = index of the first checkpoint >= doc_id + 1 (doc
    # ids are 0-based); docs past the last checkpoint are out of scope
    tok = docs.select("doc_id", F.explode(tokens_col()).alias("token"))
    # F.get, not [0]: docs past the last checkpoint produce an EMPTY
    # filtered array, and [0] on an empty array THROWS under ANSI (the
    # element_at trap shingles_col documents) — get() nulls them out
    # and the isNotNull filter drops them as out of scope.
    bucket = F.get(F.filter(cp_lit, lambda c: c >= F.col("doc_id") + 1), 0)
    per = (
        tok.select("token", bucket.alias("bucket"))
        .filter(F.col("bucket").isNotNull())
        .groupBy("token", "bucket")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    # first bucket per token -> vocabulary entry point
    entry = per.groupBy("token").agg(F.min("bucket").alias("first_bucket"))
    vocab = (
        entry.select(
            F.explode(F.filter(cp_lit, lambda c: c >= F.col("first_bucket")))
            .alias("n_docs")
        )
        .groupBy("n_docs")
        .agg(F.count(F.lit(1)).alias("vocab_size"))
    )
    volume = (
        per.select(
            "n_occ",
            F.explode(F.filter(cp_lit, lambda c: c >= F.col("bucket"))).alias(
                "n_docs"
            ),
        )
        .groupBy("n_docs")
        .agg(F.sum("n_occ").alias("n_tokens"))
    )
    return vocab.join(volume, "n_docs").select(
        "n_docs", "vocab_size", "n_tokens"
    )
