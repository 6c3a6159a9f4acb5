"""Behavioral + plan-shape tests for the corpus-hygiene operators
(operators/hygiene.py): PII scrubbing, paragraph-level dedup, n-gram
decontamination, temperature sampling. Crafted inputs pin the semantics
the sf-table oracle rows can't exercise (real newlines, multi-PII docs,
boundary-rate languages); plan assertions pin the scale shapes
(map-side-only scrub, no window in the paragraph keeper, broadcast-only
decontamination)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from don_crawler_spark.operators import hygiene as HG


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# --- PII scrub ---------------------------------------------------------------


def test_pii_scrub_redacts_all_three_classes(spark) -> None:
    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@sub.example.co.uk then 192.168.1.255 and +31 6 1234 5678 end"),
            (2, "two mails x@y.io and z@w.org"),
            (3, "no pii here at all"),
            (4, "ip 8.8.8.8 twice 1.2.3.4"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in HG.pii_scrub(docs).collect()}
    assert rows[1]["n_emails"] == 1
    assert rows[1]["n_ipv4"] == 1
    assert rows[1]["n_phones"] == 1
    assert rows[1]["scrubbed"] == "mail <EMAIL> then <IP> and <PHONE> end"
    assert rows[2]["n_emails"] == 2
    assert rows[2]["scrubbed"] == "two mails <EMAIL> and <EMAIL>"
    assert rows[3]["scrubbed"] == "no pii here at all"
    assert (rows[3]["n_emails"], rows[3]["n_ipv4"], rows[3]["n_phones"]) == (0, 0, 0)
    assert rows[4]["n_ipv4"] == 2
    assert rows[4]["scrubbed"] == "ip <IP> twice <IP>"


def test_pii_scrub_counts_each_span_once(spark) -> None:
    """An email's digits/dots must not re-count as IP or phone: counts are
    taken on the progressively scrubbed text."""
    docs = spark.createDataFrame(
        [(1, "reach 99.88.77.66@a1.b2.example.org ok")],
        "doc_id long, text string",
    )
    r = HG.pii_scrub(docs).collect()[0]
    assert r["n_emails"] == 1
    assert r["n_ipv4"] == 0
    assert r["n_phones"] == 0
    assert r["scrubbed"] == "reach <EMAIL> ok"


def test_pii_scrub_is_exchange_free(spark) -> None:
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = _plan(HG.pii_scrub(docs))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- paragraph dedup -----------------------------------------------------------


def test_paragraph_dedup_keeps_first_occurrence(spark) -> None:
    docs = spark.createDataFrame(
        [
            (1, "alpha beta\n\nshared boilerplate\n\ngamma"),
            (2, "shared boilerplate\n\ndelta"),
            (3, "shared boilerplate"),  # fully duplicated doc
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in HG.paragraph_dedup(docs, sep="\n\n").collect()}
    assert rows[1]["n_paras"] == 3 and rows[1]["n_kept"] == 3
    assert rows[1]["text_deduped"] == "alpha beta shared boilerplate gamma"
    assert rows[2]["n_paras"] == 2 and rows[2]["n_kept"] == 1
    assert rows[2]["text_deduped"] == "delta"
    # degrade-don't-drop: the all-duplicate doc still gets a row
    assert rows[3]["n_paras"] == 1 and rows[3]["n_kept"] == 0
    assert rows[3]["text_deduped"] == ""


def test_paragraph_dedup_within_doc_and_empty_paras(spark) -> None:
    docs = spark.createDataFrame(
        [(1, "\n\nsame\n\nsame\n\n  \n\nother")],
        "doc_id long, text string",
    )
    r = HG.paragraph_dedup(docs, sep="\n\n").collect()[0]
    # leading + whitespace-only paragraphs dropped; in-doc repeat deduped
    assert r["n_paras"] == 3
    assert r["n_kept"] == 2
    assert r["text_deduped"] == "same other"


def test_paragraph_dedup_plan_uses_partial_agg_not_window(spark) -> None:
    """The keeper is min(struct(doc_id,pos)) — a partial-mergeable
    aggregate, NOT a row_number window (which would sort every copy of a
    hot boilerplate paragraph in one task at web scale)."""
    docs = spark.createDataFrame(
        [(1, "a\n\nb"), (2, "b\n\nc")], "doc_id long, text string"
    )
    plan = _plan(HG.paragraph_dedup(docs, sep="\n\n"))
    assert "Window" not in plan
    assert "partial_min" in plan or "HashAggregate" in plan


# --- decontamination -----------------------------------------------------------


def test_decontaminate_flags_shared_kgrams(spark) -> None:
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            # shares "quick brown fox jumps over" (and more)
            (1, "a quick brown fox jumps over fences daily"),
            (2, "completely unrelated words in this one here"),
            (3, "too short"),  # < 5 tokens: can't share a 5-gram
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in HG.decontaminate(train, bench, k=5).collect()}
    assert rows[1]["contaminated"] and rows[1]["n_shared_grams"] >= 1
    assert not rows[2]["contaminated"] and rows[2]["n_shared_grams"] == 0
    assert not rows[3]["contaminated"]
    assert len(rows) == 3  # every train doc gets a verdict row


def test_decontaminate_counts_distinct_grams_once(spark) -> None:
    bench = spark.createDataFrame(
        [(9, "x y z w v")], "doc_id long, text string"
    )
    # the shared 5-gram occurs twice in the train doc; per-doc shingles
    # are DISTINCT, so it counts once
    train = spark.createDataFrame(
        [(1, "x y z w v x y z w v")], "doc_id long, text string"
    )
    r = HG.decontaminate(train, bench, k=5).collect()[0]
    assert r["n_shared_grams"] == 1


def test_decontaminate_never_shuffles_the_train_side(spark) -> None:
    """Both joins (gram probe, verdict join-back) must be broadcasts: the
    corpus never crosses an exchange."""
    bench = spark.createDataFrame([(9, "x y z w v")], "doc_id long, text string")
    train = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    plan = _plan(HG.decontaminate(train, bench, k=5))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


# --- temperature sampling -------------------------------------------------------


def test_temperature_sample_rates_match_replay(spark) -> None:
    """keep_rate must equal the sqrt-temperature formula, with the rarest
    language pinned at 1.0 and the majority language strictly below its
    own stratified share."""
    rows = [(i, "en" if i < 80 else ("de" if i < 95 else "nl")) for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = HG.temperature_sample(docs.withColumn("text", F.lit("t")))
    got = {(r["lang"]): r["keep_rate"] for r in out.collect()}

    p = {"en": 0.80, "de": 0.15, "nl": 0.05}
    z = sum(math.sqrt(v) for v in p.values())
    boost = {l: (math.sqrt(v) / z) / v for l, v in p.items()}
    mx = max(boost.values())
    want = {l: round(b / mx, 6) for l, b in boost.items()}
    for lang, rate in got.items():
        assert rate == pytest.approx(want[lang], abs=1e-6), lang
    assert want["nl"] == 1.0  # rarest language keeps everything
    assert got.get("en", want["en"]) < 1.0


def test_temperature_sample_draw_is_md5_deterministic(spark) -> None:
    docs = spark.createDataFrame(
        [(i, "en") for i in range(50)], "doc_id long, lang string"
    ).withColumn("text", F.lit("t"))
    out = {r["doc_id"]: r["sample_u"] for r in HG.temperature_sample(docs).collect()}
    # single language => keep_rate 1.0, every doc kept; replay the draw
    assert len(out) == 50
    for i, u in out.items():
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) / 2**32
        assert u == pytest.approx(round(h, 6), abs=1e-9)


def test_temperature_sample_corpus_side_is_broadcast_joined(spark) -> None:
    docs = spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(30)],
        "doc_id long, lang string",
    ).withColumn("text", F.lit("t"))
    plan = _plan(HG.temperature_sample(docs))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


# --- ExactSubstr span dedup ----------------------------------------------------


def test_span_dedup_cuts_repeated_span_keeps_first(spark) -> None:
    """A 5-gram repeated across docs is kept only at its globally-first
    (doc_id, pos) occurrence; the later occurrence's covered tokens are
    removed and the survivors reassembled in order."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),          # keeper of "a b c d e"
            (2, "x y a b c d e z"),          # duplicate occurrence at pos 2
            (4, "p q r"),                    # shorter than k: untouched
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in HG.span_dedup(docs, k=5).collect()}
    assert rows[1]["n_removed"] == 0
    assert rows[1]["text_cleaned"] == "a b c d e f g h"
    assert rows[2]["n_tokens"] == 8
    assert rows[2]["n_removed"] == 5
    assert rows[2]["text_cleaned"] == "x y z"
    assert rows[4]["n_removed"] == 0
    assert rows[4]["text_cleaned"] == "p q r"


def test_span_dedup_fully_duplicated_doc_degrades_to_empty(spark) -> None:
    """Degrade-don't-drop: a verbatim copy of an earlier doc loses every
    token but still yields a row (empty text, n_removed = n_tokens)."""
    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (3, "a b c d e f g h")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in HG.span_dedup(docs, k=5).collect()}
    assert rows[1]["n_removed"] == 0
    assert rows[3]["n_removed"] == 8
    assert rows[3]["text_cleaned"] == ""


def test_span_dedup_self_repetition_within_one_doc(spark) -> None:
    """In-doc repetition: the first occurrence of the repeated span is
    the keeper, the second is cut — overlapping boundary grams occur
    only once each and must not widen the cut."""
    docs = spark.createDataFrame(
        [(7, "m n o p q m n o p q")], "doc_id long, text string"
    )
    r = HG.span_dedup(docs, k=5).collect()[0]
    assert r["n_tokens"] == 10
    assert r["n_removed"] == 5
    assert r["text_cleaned"] == "m n o p q"


def test_span_dedup_shuffle_key_is_hash_and_agg_is_partial(spark) -> None:
    """Scale shape: the gram-dedup exchange is keyed on xxhash64(gram)
    (8 bytes, not the k-token string) and the keeper is a min(struct)
    partial-mergeable aggregate, not a per-gram window sort."""
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e g")], "doc_id long, text string"
    )
    plan = _plan(HG.span_dedup(docs, k=5))
    assert "xxhash64" in plan
    assert "Window" not in plan
    assert "partial_min" in plan or "HashAggregate" in plan


# --- C4 line filter -------------------------------------------------------------


def test_c4_line_filter_applies_all_three_line_rules(spark) -> None:
    """Paper defaults: a line survives only if it ends in terminal
    punctuation AND has >=5 words AND doesn't mention javascript."""
    text = "\n".join(
        [
            "this line has five good words.",     # kept
            "too short a line.",                   # <5 words
            "this line has no terminal punctuation at all",  # no [.!?"]
            "please enable JavaScript to view the comments.",  # banned word
            "another perfectly fine sentence with many words!",  # kept
            'a quoted ending also counts as terminal he said"',  # kept
        ]
    )
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = HG.c4_line_filter(docs).collect()[0]
    assert r["n_lines"] == 6
    assert r["n_kept"] == 3
    assert r["page_kept"] is True
    assert r["text_filtered"] == (
        "this line has five good words.\n"
        "another perfectly fine sentence with many words!\n"
        'a quoted ending also counts as terminal he said"'
    )


def test_c4_line_filter_page_level_drops(spark) -> None:
    """Page rules: <min_lines survivors, a 'lorem ipsum' marker, or a
    curly bracket each drop the whole page (row kept, text emptied)."""
    good = "\n".join(["a full sentence with enough words here."] * 3)
    docs = spark.createDataFrame(
        [
            (1, good),                                # kept
            (2, "one good sentence with enough words."),  # < 3 kept lines
            (3, good + "\nLorem Ipsum dolor sit."),   # marker, any case
            (4, good + "\nvar f = function() {"),     # curly bracket
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in HG.c4_line_filter(docs).collect()}
    assert rows[1]["page_kept"] is True and rows[1]["n_kept"] == 3
    assert rows[2]["page_kept"] is False and rows[2]["text_filtered"] == ""
    assert rows[2]["n_kept"] == 1  # line counts still reported
    assert rows[3]["page_kept"] is False
    assert rows[4]["page_kept"] is False


def test_c4_line_filter_is_exchange_free(spark) -> None:
    """One map-side projection: no exchange, no join, no Python UDF."""
    docs = spark.createDataFrame(
        [(1, "a sentence with five whole words.")], "doc_id long, text string"
    )
    plan = _plan(HG.c4_line_filter(docs))
    assert "Exchange" not in plan
    assert "Join" not in plan
    assert "Python" not in plan


def test_span_dedup_matches_pure_python_replay(spark) -> None:
    """Seeded random corpora vs a from-scratch ExactSubstr replay: the
    keeper is the globally-min (doc_id, pos) occurrence per gram, every
    other occurrence's k-window is cut, survivors reassemble in order."""
    import random

    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(12)]  # small vocab => many collisions
    k = 3
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 18))))
        for i in range(60)
    ]

    # pure-Python oracle
    first: dict[tuple, tuple] = {}
    occs: list[tuple] = []
    for doc_id, text in docs:
        toks = [t for t in text.split(" ") if t]
        for pos in range(len(toks) - k + 1):
            g = tuple(toks[pos : pos + k])
            occs.append((doc_id, pos, g))
            if g not in first or (doc_id, pos) < first[g]:
                first[g] = (doc_id, pos)
    counts: dict[tuple, int] = {}
    for _, _, g in occs:
        counts[g] = counts.get(g, 0) + 1
    covered: dict[int, set] = {}
    for doc_id, pos, g in occs:
        if counts[g] >= 2 and first[g] != (doc_id, pos):
            covered.setdefault(doc_id, set()).update(range(pos, pos + k))
    want = {}
    for doc_id, text in docs:
        toks = [t for t in text.split(" ") if t]
        cut = covered.get(doc_id, set())
        kept = [t for i, t in enumerate(toks) if i not in cut]
        want[doc_id] = (len(toks), len(toks) - len(kept), " ".join(kept))

    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_cleaned"])
        for r in HG.span_dedup(sdf, k=k).collect()
    }
    assert got == want
    # sanity: the corpus actually exercised the operator
    assert any(v[1] > 0 for v in want.values())
    assert any(v[1] == 0 and v[0] > 0 for v in want.values())


def test_ngram_topk_counts_all_occurrences(spark) -> None:
    """Crafted corpus: repeated 3-grams count per occurrence (non-
    distinct), ties break on gram text, short docs contribute nothing."""
    from don_crawler_spark.operators.textstats import ngram_topk

    docs = spark.createDataFrame(
        [
            (1, "a b c a b c"),  # 'a b c' x2, 'b c a' x1, 'c a b' x1
            (2, "a b c d"),  # 'a b c', 'b c d'
            (3, "x y"),  # too short: no 3-grams
            (4, "b c d"),  # 'b c d'
        ],
        "doc_id long, text string",
    )
    rows = [(r["gram"], r["n_occurrences"]) for r in ngram_topk(docs, k=3).collect()]
    assert rows == [("a b c", 3), ("b c d", 2), ("b c a", 1)]


def test_ngram_topk_plan_is_take_ordered(spark) -> None:
    # the global top-k must be a TakeOrderedAndProject (per-partition
    # local top-k to the driver), never a full global sort
    from don_crawler_spark.operators.textstats import ngram_topk
    from don_crawler_spark.sources.tables import load

    plan = (
        ngram_topk(load(spark, "/root/testdata/sf0.001", "documents", respread=False))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan


# --- URL blocklist filter ------------------------------------------------------


def test_url_blocklist_all_three_block_paths(spark) -> None:
    pages = spark.createDataFrame(
        [
            (1, "https://ads.example.com/x"),  # exact-host hit
            (2, "https://sub.bad.org/y"),  # registered-domain hit
            (3, "https://ok.net/casino/z"),  # banned-word hit
            (4, "https://clean.io/fine"),  # kept
            (5, "https://bad.org/direct"),  # host == reg_domain hit
            (6, "https://localhost/x"),  # single-label host
        ],
        "doc_id long, url string",
    )
    bl = spark.createDataFrame(
        [("ads.example.com",), ("bad.org",)], "domain string"
    )
    rows = {
        r["doc_id"]: r
        for r in HG.url_blocklist_filter(
            pages, bl, banned_words=("casino",)
        ).collect()
    }
    assert rows[1]["blocked_host"] and not rows[1]["blocked_word"]
    assert rows[1]["host"] == "ads.example.com"
    assert rows[1]["reg_domain"] == "example.com"
    assert rows[2]["blocked_host"] and rows[2]["reg_domain"] == "bad.org"
    assert rows[3]["blocked_word"] and not rows[3]["blocked_host"]
    assert rows[4]["kept"]
    assert not rows[4]["blocked_host"] and not rows[4]["blocked_word"]
    assert rows[5]["blocked_host"]
    assert rows[6]["host"] == "localhost"
    assert rows[6]["reg_domain"] == "localhost"
    assert rows[6]["kept"]
    assert not any(rows[i]["kept"] for i in (1, 2, 3, 5))


def test_url_blocklist_corpus_side_never_shuffles(spark) -> None:
    """Both list probes must be broadcast hash joins: a ~4.6M-entry UT1
    list broadcasts; the 10^10-page corpus never crosses an exchange."""
    pages = spark.createDataFrame(
        [(1, "https://a.b.c/x")], "doc_id long, url string"
    )
    bl = spark.createDataFrame([("a.b.c",)], "domain string")
    plan = _plan(HG.url_blocklist_filter(pages, bl))
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --- CCNet text normalization --------------------------------------------------


def test_normalize_text_ccnet_semantics(spark) -> None:
    docs = spark.createDataFrame(
        [
            (1, "Café DÉJÀ-Vu!  42 piñata,  Ñoño"),
            (2, ""),
            (3, "   "),
            (4, "MiXeD CaSe 2024 ... ok"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in HG.normalize_text(docs).collect()}
    assert rows[1]["norm_text"] == "cafe deja vu 00 pinata nono"
    assert rows[1]["n_norm_tokens"] == 6
    assert rows[2]["norm_text"] == "" and rows[2]["n_norm_tokens"] == 0
    assert rows[3]["norm_text"] == "" and rows[3]["n_norm_tokens"] == 0
    assert rows[4]["norm_text"] == "mixed case 0000 ok"


def test_normalize_hash_is_md5_prefix_int(spark) -> None:
    docs = spark.createDataFrame(
        [(1, "Hello World 7")], "doc_id long, text string"
    )
    r = HG.normalize_text(docs).collect()[0]
    expect = int(hashlib.md5(r["norm_text"].encode()).hexdigest()[:8], 16)
    assert r["norm_hash"] == expect


def test_normalize_matches_duckdb_on_unicode_edges(spark) -> None:
    """The unicode path is the cross-engine risk (lower/translate on
    multibyte codepoints): replay the exact oracle expression in DuckDB
    on crafted accent/digit/symbol strings and compare byte-for-byte."""
    import duckdb

    texts = [
        "Café DÉJÀ-Vu! 42 piñata, Ñoño",
        "ÀÂÄÃÅ àâäãå ÉÈÊË éèêë ÍÌÎÏ íìîï ÓÒÔÖÕ óòôöõ ÚÙÛÜ úùûü Ç ç Ñ ñ Ý ý ÿ",
        "№ § ß € 99 bottles",
        "",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["norm_text"], r["norm_hash"], r["n_norm_tokens"])
        for r in HG.normalize_text(docs).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        nt, nh, nn = con.execute(
            f"""SELECT norm_text,
  CAST(('0x' || substr(md5(norm_text), 1, 8)) AS BIGINT),
  CAST(len(list_filter(string_split(norm_text, ' '), x -> x <> '')) AS INT)
FROM (SELECT trim(regexp_replace(regexp_replace(regexp_replace(
  translate(lower(?), '{HG.ACCENT_SRC}', '{HG.ACCENT_DST}'),
  '[0-9]', '0', 'g'), '[^a-z0 ]+', ' ', 'g'), ' +', ' ', 'g')) AS norm_text)
""",
            [t],
        ).fetchone()
        assert got[i] == (nt, nh, nn), (i, got[i], (nt, nh, nn))


def test_normalize_is_exchange_free(spark) -> None:
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = _plan(HG.normalize_text(docs))
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_accent_map_lengths_match() -> None:
    assert len(HG.ACCENT_SRC) == len(HG.ACCENT_DST)


# --- domain quality rollup ------------------------------------------------------


def test_domain_rollup_semantics(spark) -> None:
    pages = spark.createDataFrame(
        [
            # two docs on a.com, one an exact dup (modulo whitespace)
            (1, "the quick fox", "https://x.a.com/1"),
            (2, "the  quick   fox", "https://y.a.com/2"),
            # one doc on b.org
            (3, "words of a kind", "https://b.org/3"),
        ],
        "doc_id long, text string, url string",
    )
    out = {
        r["reg_domain"]: r
        for r in HG.domain_rollup(HG.with_url_host(pages)).collect()
    }
    assert set(out) == {"a.com", "b.org"}
    a = out["a.com"]
    assert a["n_docs"] == 2 and a["total_tokens"] == 6
    assert a["n_dup_docs"] == 1  # whitespace-normalized fingerprints collide
    b = out["b.org"]
    assert b["n_docs"] == 1 and b["n_dup_docs"] == 0 and b["total_tokens"] == 4
    # mean quality equals the 6-dp per-doc score when the group is uniform
    from don_crawler_spark.operators.textstats import quality_score

    q3 = {
        r["doc_id"]: r["quality"]
        for r in quality_score(
            pages.withColumn("n_chars", F.length("text"))
        ).collect()
    }
    assert abs(b["mean_quality"] - q3[3]) < 1e-9


def test_domain_rollup_plan_single_rollup_no_text_shuffle(spark) -> None:
    """Per-doc signals are map-side; the only exchanges are the standard
    two-phase distinct agg on (domain, fp) then (domain) — and no
    exchange carries the text column (signals shrink to md5+bigints
    before any shuffle)."""
    pages = spark.createDataFrame(
        [(1, "t t t", "https://a.b/x")], "doc_id long, text string, url string"
    )
    plan = _plan(HG.domain_rollup(HG.with_url_host(pages)))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "rangepartitioning" not in plan.lower()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert 1 <= n_exchanges <= 2
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1)
