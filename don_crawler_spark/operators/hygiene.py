"""Corpus-hygiene operators: PII scrubbing, paragraph-level exact dedup,
benchmark decontamination, temperature-scaled language mixing.

These complete the training-data pipeline family (operators/pipeline.py,
operators/textstats.py, operators/dedup.py) with the four remaining
standard webtext-curation steps:

- **PII scrubbing** (C4 / CCNet style): redact emails, IPv4 addresses and
  phone numbers with typed placeholder tokens, counting redactions per
  class. Pure map-side regexp kernels — the patterns are restricted to
  constructs with identical semantics in Java regex (Spark) and RE2
  (DuckDB): no lookarounds, no backreferences, ASCII classes only, and
  both engines scan leftmost-first, so the redacted text is byte-equal
  across engines.
- **Paragraph-level exact dedup** (RefinedWeb, Penedo et al. 2023 §4.2):
  remove every repeated paragraph corpus-wide, keeping only its first
  occurrence in (doc_id, position) order, and reassemble the surviving
  text. The keeper per paragraph is a ``min(struct(doc_id, pos))``
  AGGREGATE, not a window: partial (map-side) aggregation collapses even
  a boilerplate paragraph duplicated 10^9 times before the shuffle,
  where a row_number window would sort all copies in one task (the
  classic skew cliff for this operator at web scale).
- **Decontamination** (GPT-3 appendix C / PaLM style): flag training
  documents sharing any word k-gram with a held-out benchmark set. The
  benchmark's distinct k-grams are BROADCAST (eval suites are ~10^6-10^7
  n-grams — trivially broadcastable next to a 10^10-doc corpus), so the
  training side is a map-side hash probe: zero shuffle of corpus rows,
  and the per-doc hit counts aggregate with map-side combine.
- **Temperature sampling** (multilingual mixing, Conneau & Lample 2019):
  re-weight languages by p^alpha (alpha=0.5, i.e. sqrt — chosen because
  IEEE sqrt is correctly rounded and therefore bit-identical across
  engines, unlike pow) and keep each doc with probability proportional
  to w_l/p_l via the same deterministic md5 draw as
  pipeline.sample_stratified. One tiny groupBy(lang) aggregate (map-side
  combined, |langs| keys) broadcast back onto the corpus: the corpus
  itself never shuffles.

Later additions to the family (same exact-oracle, no-Python-UDF rules):
**ExactSubstr span dedup** (Lee et al. 2021 — see ``span_dedup``), the
**C4 line-level filter** (Raffel et al. 2020 §2.2 — see
``c4_line_filter``), **UT1-style URL blocklist filtering** (RefinedWeb
§3.1 — see ``url_blocklist_filter``), and **CCNet text normalization**
(Wenzek et al. 2019 §4.1 — see ``normalize_text``).

All have exact DuckDB oracles in __spark_entry__.py; none uses a Python
UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from don_crawler_spark.operators.dedup import shingles_col, tokens_col
from don_crawler_spark.operators.pipeline import sample_uniform_col

# PII patterns — Java-regex/RE2-identical constructs only (see module doc).
# Applied in this order; counts are taken on the input of each stage so a
# redacted span is never double-counted by a later pattern.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+[0-9][0-9 ]{6,14}[0-9]"

EMAIL_TOKEN = "<EMAIL>"
IPV4_TOKEN = "<IP>"
PHONE_TOKEN = "<PHONE>"


def pii_scrub(docs: DataFrame, text: str = "text") -> DataFrame:
    """Redact emails, then IPv4s, then phone numbers from ``text``.

    Returns (doc_id, n_emails, n_ipv4, n_phones, scrubbed). One map-side
    projection — zero exchanges, whole-stage codegen'd; at 100 TB this is
    scan-bound like any other per-row kernel.
    """
    t0 = F.col(text)
    t1 = F.regexp_replace(t0, EMAIL_RE, EMAIL_TOKEN)
    t2 = F.regexp_replace(t1, IPV4_RE, IPV4_TOKEN)
    t3 = F.regexp_replace(t2, PHONE_RE, PHONE_TOKEN)
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(t0, F.lit(EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(t1, F.lit(IPV4_RE), 0)).alias("n_ipv4"),
        F.size(F.regexp_extract_all(t2, F.lit(PHONE_RE), 0)).alias("n_phones"),
        t3.alias("scrubbed"),
    )


def paragraph_dedup(docs: DataFrame, sep: str = "\n\n") -> DataFrame:
    """Corpus-wide exact paragraph dedup, keep-first in (doc_id, pos)
    order (RefinedWeb §4.2). ``sep`` is a LITERAL separator (escaped
    before the regex split so Spark and a literal-split oracle agree).

    Returns one row per input doc: (doc_id, n_paras, n_kept,
    text_deduped) — docs whose every paragraph already appeared earlier
    come back with n_kept = 0 and an empty string, mirroring the
    degrade-don't-drop convention of the crawl (P11).

    Plan shape (the scale-critical part): the keeper for each paragraph
    is ``min(struct(doc_id, pos))`` — a declarative aggregate with
    map-side partial merge, so a paragraph duplicated 10^9 times
    (cookie banners, nav boilerplate) collapses to one row per map task
    before the exchange. The join back to occurrences is a hash probe on
    the paragraph key (AQE splits residual skew); reassembly groups by
    doc_id with collect_list + array_sort, bounded by document size.
    Three keyed exchanges total (para-agg, para-join, doc_id regroup),
    none carrying more than the surviving occurrence rows.
    """
    import re as _re

    paras = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(
                F.split(F.col("text"), _re.escape(sep)),
                lambda p: F.trim(p) != "",
            )
        ).alias("pos", "para"),
    )
    keepers = paras.groupBy("para").agg(
        F.min(F.struct("doc_id", "pos")).alias("k")
    )
    # flatten the keeper struct so the semi-join below is on plain
    # columns (avoids self-join lineage ambiguity: keepers derives from
    # paras)
    keepers = keepers.select(
        F.col("para").alias("k_para"),
        F.col("k.doc_id").alias("k_doc_id"),
        F.col("k.pos").alias("k_pos"),
    )
    kept = paras.join(
        keepers,
        (paras["para"] == keepers["k_para"])
        & (paras["doc_id"] == keepers["k_doc_id"])
        & (paras["pos"] == keepers["k_pos"]),
        "left_semi",
    )
    reassembled = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
        ).alias("text_deduped"),
    )
    totals = docs.select(
        "doc_id",
        F.size(
            F.filter(
                F.split(F.col("text"), _re.escape(sep)),
                lambda p: F.trim(p) != "",
            )
        ).alias("n_paras"),
    )
    return (
        totals.join(reassembled, "doc_id", "left")
        .select(
            "doc_id",
            "n_paras",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("text_deduped", F.lit("")).alias("text_deduped"),
        )
    )


def decontaminate(
    train: DataFrame, benchmark: DataFrame, k: int = 5
) -> DataFrame:
    """Flag training docs sharing any word ``k``-gram with ``benchmark``
    (GPT-3-style n-gram decontamination; the reference value there is
    13-grams — parameterized here because the synthetic docs are short).

    Returns every train row as (doc_id, n_shared_grams, contaminated).
    The benchmark's distinct grams are broadcast — eval suites are tiny
    next to the corpus — so the probe is map-side; per-doc hit counts
    come from the distinct per-doc shingle array (no double counting),
    and the small hit table broadcasts back onto the train docs. The
    corpus is never shuffled.
    """
    eval_grams = (
        benchmark.select(F.explode(shingles_col(k)).alias("gram")).distinct()
    )
    train_grams = train.select(
        "doc_id", F.explode(shingles_col(k)).alias("gram")
    )
    hits = (
        train_grams.join(F.broadcast(eval_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_shared_grams"))
    )
    return train.select("doc_id").join(
        F.broadcast(hits), "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce("n_shared_grams", F.lit(0)).alias("n_shared_grams"),
        (F.coalesce("n_shared_grams", F.lit(0)) > 0).alias("contaminated"),
    )


def temperature_sample(docs: DataFrame) -> DataFrame:
    """Temperature-scaled language rebalancing with alpha = 0.5:
    w_l ∝ sqrt(p_l), keep rate r_l = (w_l / p_l) normalized so the most
    up-weighted language keeps everything. Deterministic md5 draw per
    doc (pipeline.sample_uniform_col). Returns kept rows with the
    per-language rate: (doc_id, lang, sample_u, keep_rate).

    sqrt instead of a tunable pow: IEEE-754 sqrt is correctly rounded,
    so Spark and the DuckDB oracle compute bit-identical rates; pow is
    only faithfully rounded and may differ in the last ulp across libms.
    """
    stats = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    # |langs| rows: window over the tiny aggregate is driver-cheap and
    # never sees corpus rows
    from pyspark.sql import Window

    w = Window.partitionBy()
    stats = stats.select(
        "lang",
        (F.col("n_l") / F.sum("n_l").over(w)).alias("p_l"),
    ).select(
        "lang",
        "p_l",
        (F.sqrt("p_l") / F.sum(F.sqrt("p_l")).over(w)).alias("w_l"),
    )
    rates = stats.select(
        "lang",
        (F.col("w_l") / F.col("p_l")).alias("boost"),
    )
    rates = rates.select(
        "lang",
        (F.col("boost") / F.max("boost").over(w)).alias("keep_rate"),
    )
    u = sample_uniform_col()
    return (
        docs.select("doc_id", "lang", u.alias("sample_u"))
        .join(F.broadcast(rates), "lang")
        .filter(F.col("sample_u") < F.col("keep_rate"))
        .select(
            "doc_id",
            "lang",
            F.round("sample_u", 6).alias("sample_u"),
            F.round("keep_rate", 6).alias("keep_rate"),
        )
    )


def span_dedup(docs: DataFrame, k: int = 50) -> DataFrame:
    """ExactSubstr-style duplicated-span removal (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499 §4.1): any word ``k``-gram occurrence whose gram
    appears ≥2 times corpus-wide is a duplicate UNLESS it is the
    globally-first occurrence in (doc_id, pos) order; every token covered
    by a duplicate occurrence's window is removed and the survivors are
    reassembled in order. Unlike dedup_exact / paragraph_dedup this cuts
    repeated SPANS out of otherwise-unique documents — the case whole-doc
    and paragraph dedup both miss (quoted passages, syndicated snippets,
    licence boilerplate mid-page). The paper's threshold is 50 tokens;
    the registered binding uses k=5 because the synthetic docs are short.

    Returns one row per input doc: (doc_id, n_tokens, n_removed,
    text_cleaned) — degrade-don't-drop: a fully-duplicated doc comes back
    with n_removed = n_tokens and an empty string.

    Plan shape (the scale-critical part): the reference implementation
    is a single-machine suffix array — not shuffleable. Here the gram
    relation is one row per token position, keyed by ``xxhash64(gram)``
    so the dedup shuffle moves 8-byte keys instead of ~k-token strings
    (a 2^-64 per-pair collision risk traded for a ~50x narrower
    exchange; the oracle groups by the gram string itself and agrees on
    every shipped corpus). The keeper per gram is a min(struct) AGGREGATE
    with map-side partial merge — boilerplate spans duplicated 10^9
    times collapse per map task before the exchange, the same skew
    argument as paragraph_dedup. Coverage expansion is a bounded
    explode(sequence) (k rows per duplicate), and reassembly groups by
    doc_id bounded by document size. Four keyed exchanges total, none
    carrying payload text wider than the surviving tokens.
    """
    toks = tokens_col()
    docs_t = docs.select("doc_id", toks.alias("t"))
    n = F.size("t")
    gram = lambda i: F.xxhash64(
        F.concat_ws(" ", *[F.element_at(F.col("t"), i + j) for j in range(k)])
    )
    grams = docs_t.filter(n >= k).select(
        "doc_id",
        F.posexplode(
            F.transform(F.sequence(F.lit(1), n - (k - 1)), gram)
        ).alias("pos", "gh"),
    )
    agg = (
        grams.groupBy("gh")
        .agg(
            F.count(F.lit(1)).alias("n_occ"),
            F.min(F.struct("doc_id", "pos")).alias("kp"),
        )
        .filter(F.col("n_occ") >= 2)
        .select(
            F.col("gh").alias("d_gh"),
            F.col("kp.doc_id").alias("k_doc_id"),
            F.col("kp.pos").alias("k_pos"),
        )
    )
    dups = grams.join(agg, grams["gh"] == agg["d_gh"]).filter(
        ~(
            (F.col("doc_id") == F.col("k_doc_id"))
            & (F.col("pos") == F.col("k_pos"))
        )
    )
    covered = dups.select(
        "doc_id",
        F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("ti"),
    ).distinct()
    tokens = docs_t.select("doc_id", F.posexplode("t").alias("ti", "tok"))
    kept = tokens.join(covered, ["doc_id", "ti"], "left_anti")
    reassembled = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("ti", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("text_cleaned"),
    )
    totals = docs_t.select("doc_id", n.cast("int").alias("n_tokens"))
    return totals.join(reassembled, "doc_id", "left").select(
        "doc_id",
        "n_tokens",
        (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
        .cast("int")
        .alias("n_removed"),
        F.coalesce("text_cleaned", F.lit("")).alias("text_cleaned"),
    )


def c4_line_filter(
    docs: DataFrame,
    sep: str = "\n",
    min_words: int = 5,
    terminal_re: str = r'[.!?"]$',
    banned_line: str = "javascript",
    banned_page: tuple[str, ...] = ("lorem ipsum", "{"),
    min_lines: int = 3,
) -> DataFrame:
    """C4-style line-level filtering (Raffel et al. 2020, "Exploring the
    Limits of Transfer Learning with a Unified Text-to-Text Transformer",
    §2.2): keep only lines that (a) end in terminal punctuation, (b) have
    at least ``min_words`` words, and (c) don't mention ``banned_line``
    (C4 uses "javascript" — cookie/JS-warning boilerplate); then drop the
    whole page if fewer than ``min_lines`` lines survive or the raw page
    contains any ``banned_page`` marker (C4 uses "lorem ipsum" and "{").

    All rules are parameters because the paper's constants are tuned to
    English web prose; the registered binding re-tunes them to the
    synthetic corpus so every rule stays discriminating (see
    __spark_entry__.py c4_line_filter). ``sep`` and ``banned_*`` are
    LITERALS; ``terminal_re`` is a regex restricted to Java/RE2-identical
    constructs (module doc).

    Returns one row per input doc: (doc_id, n_lines, n_kept, page_kept,
    text_filtered) — degrade-don't-drop: a dropped page keeps its row
    with page_kept = false and an empty string.

    Plan shape: one map-side projection over the scan — zero exchanges,
    zero joins. Line splitting, the per-line word count, and the regex
    test all run inside array HOFs on the already-loaded text; at 100 TB
    this is scan-bound, embarrassingly parallel, and pairs with
    predicate pushdown (the projection only reads doc_id + text).
    """
    import re as _re

    lines = F.transform(
        F.split(F.col("text"), _re.escape(sep)), lambda l: F.trim(l)
    )
    kept = F.filter(
        lines,
        lambda l: (
            F.size(F.filter(F.split(l, " "), lambda t: t != "")) >= min_words
        )
        & l.rlike(terminal_re)
        & ~F.lower(l).contains(banned_line.lower()),
    )
    page_ok = F.size(kept) >= min_lines
    for marker in banned_page:
        page_ok = page_ok & ~F.lower(F.col("text")).contains(marker.lower())
    return docs.select(
        "doc_id",
        F.size(lines).cast("int").alias("n_lines"),
        F.size(kept).cast("int").alias("n_kept"),
        page_ok.alias("page_kept"),
        F.when(page_ok, F.array_join(kept, sep))
        .otherwise(F.lit(""))
        .alias("text_filtered"),
    )


# Accent-strip map for normalize_text — an EXPLICIT translate table, the
# cross-engine-deterministic subset (Spark and DuckDB both lack a common
# strip-accents builtin; both translate() kernels are unicode-codepoint-
# wise, so an explicit map replays exactly). Extend for production
# language coverage; src and dst are kept the same length by the module
# test.
ACCENT_SRC = "áàâäãåéèêëíìîïóòôöõúùûüçñýÿ"
ACCENT_DST = "aaaaaa" + "eeee" + "iiii" + "ooooo" + "uuuu" + "c" + "n" + "yy"


def normalize_text(docs: DataFrame, text: str = "text") -> DataFrame:
    """CCNet-style text normalization (Wenzek et al. 2019, "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl Data",
    arXiv:1911.00359 §4.1 — the key under which CCNet dedups paragraphs
    corpus-wide): lowercase, strip accents, map every digit to 0, replace
    everything outside [a-z0 ] with a space, collapse runs of spaces and
    trim. Emits the normalized text, the md5-prefix int64 fingerprint
    used as the downstream dedup key (same hash convention as
    dedup.fingerprints), and the post-normalization token count.

    Plan shape: one map-side projection over the scan — zero exchanges,
    zero joins, zero Python; at 100 TB this is scan-bound and pairs with
    column pruning (reads doc_id + text only). Returns
    (doc_id, norm_text, norm_hash, n_norm_tokens).
    """
    t = F.lower(F.col(text))
    t = F.translate(t, ACCENT_SRC, ACCENT_DST)
    t = F.regexp_replace(t, "[0-9]", "0")
    t = F.regexp_replace(t, "[^a-z0 ]+", " ")
    t = F.trim(F.regexp_replace(t, " +", " "))
    return docs.select(
        "doc_id",
        t.alias("norm_text"),
        F.conv(F.substring(F.md5(t), 1, 8), 16, 10)
        .cast("bigint")
        .alias("norm_hash"),
        F.size(F.filter(F.split(t, " "), lambda x: x != ""))
        .cast("int")
        .alias("n_norm_tokens"),
    )


def with_url_host(pages: DataFrame, url: str = "url") -> DataFrame:
    """Append ``host`` (lowercased authority of the URL) and ``reg_domain``
    (registered domain = last two dot-labels; a full public-suffix-list
    lookup at production is one broadcast dim away) — pure map-side
    expressions shared by url_blocklist_filter and domain_rollup."""
    p = pages.withColumn(
        "host",
        F.lower(
            F.regexp_extract(
                F.col(url), r"^[a-z][a-z0-9+.-]*://([^/:?#]+)", 1
            )
        ),
    )
    labels = F.split(F.col("host"), r"\.")
    return p.withColumn(
        "reg_domain",
        F.array_join(
            F.slice(labels, F.greatest(F.size(labels) - 1, F.lit(1)), 2),
            ".",
        ),
    )


# Banned-word default for url_blocklist_filter (UT1's adult/gambling
# categories reduce to substring hits on the URL at this granularity).
URL_BANNED_WORDS = ("casino", "viagra", "xxx")


def url_blocklist_filter(
    pages: DataFrame,
    blocklist: DataFrame,
    banned_words: tuple[str, ...] = URL_BANNED_WORDS,
    url: str = "url",
) -> DataFrame:
    """UT1-blocklist URL filtering (RefinedWeb, Penedo et al. 2023 §3.1:
    the Université Toulouse 1 blocklist of ~4.6M adult/fraud/gambling
    domains, plus banned words scored on the URL itself): flag pages
    whose URL host — or registered domain — appears in a curated
    blocklist, or whose URL contains a banned word.

    ``blocklist`` is a one-column DataFrame ``(domain: string)`` holding
    exact hosts and registered domains mixed. At ~4.6M entries the list
    is far too large for a literal IN chain but trivially broadcastable
    next to a 10^10-page corpus, so the probe is two BROADCAST hash
    joins — one keyed on the exact host, one on the registered domain.
    (A single OR-keyed join would degrade to a nested loop; two
    equi-joins keep both probes O(1) hash lookups.) The corpus never
    crosses an exchange; host parsing and the banned-word scan are
    map-side expressions. The registered domain is the last two
    dot-labels — a full public-suffix-list lookup at production is one
    more broadcast dim with the identical join shape.

    Returns the input columns plus (host, reg_domain, blocked_host,
    blocked_word, kept) — verdict columns, not a filter, mirroring the
    crawl's degrade-don't-drop convention so callers can audit per-entry
    block rates before dropping.
    """
    p = with_url_host(pages, url=url)
    bw = F.lit(False)
    for w in banned_words:
        bw = bw | F.lower(F.col(url)).contains(w.lower())
    bl = blocklist.select("domain").distinct()
    hosts = bl.select(
        F.col("domain").alias("bl_h"), F.lit(True).alias("h_hit")
    )
    regs = bl.select(
        F.col("domain").alias("bl_r"), F.lit(True).alias("r_hit")
    )
    p = p.join(
        F.broadcast(hosts), F.col("host") == F.col("bl_h"), "left"
    ).join(F.broadcast(regs), F.col("reg_domain") == F.col("bl_r"), "left")
    blocked_host = F.coalesce(F.col("h_hit"), F.lit(False)) | F.coalesce(
        F.col("r_hit"), F.lit(False)
    )
    return p.select(
        *pages.columns,
        "host",
        "reg_domain",
        blocked_host.alias("blocked_host"),
        bw.alias("blocked_word"),
        (~(blocked_host | bw)).alias("kept"),
    )


def domain_rollup(pages: DataFrame, domain: str = "reg_domain", text: str = "text") -> DataFrame:
    """Host-level corpus statistics (RefinedWeb §3.1 / FineWeb practice:
    low-quality and duplicate-heavy DOMAINS get blocked wholesale, not
    doc-by-doc): per registered domain, the document count, total
    whitespace-token volume, exact-duplicate burden (docs minus distinct
    normalized fingerprints), and mean heuristic quality.

    Exactness: the per-doc quality score (textstats.quality_col, 6-dp)
    is integer-scaled to 1e-6 units BEFORE the sum so the aggregate is
    order-free exact integer arithmetic; the mean divides once at the
    end (identical double op in the DuckDB oracle).

    Plan shape: every per-doc signal is a map-side expression over the
    scan; the rollup is ONE logical groupBy(domain) — Spark plans the
    single distinct agg as the standard two-phase (domain, fingerprint)
    partial then (domain) final, both with map-side partial aggregation,
    so the shuffle carries (domain, md5, two bigints) per doc, never
    text. Domains are ~10^7 keys at web scale with heavy hitters
    (blogspot/wordpress); AQE skew handling applies since the partials
    shrink each mapper's output to its distinct keys first.

    Returns (reg_domain, n_docs, total_tokens, n_dup_docs, mean_quality).
    """
    from don_crawler_spark.operators.textstats import quality_col

    norm = F.regexp_replace(F.lower(F.col(text)), r"\s+", " ")
    per_doc = pages.select(
        F.col(domain).alias("reg_domain"),
        F.size(tokens_col(text)).cast("long").alias("n_toks"),
        F.md5(F.trim(norm)).alias("fp"),
        F.round(quality_col(text) * F.lit(1e6), 0).cast("bigint").alias("q6"),
    )
    return per_doc.groupBy("reg_domain").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_toks").alias("total_tokens"),
        (F.count("*") - F.countDistinct("fp")).alias("n_dup_docs"),
        F.round(
            F.sum("q6").cast("double") / F.count("*") / F.lit(1e6), 6
        ).alias("mean_quality"),
    )
