"""Behavioral tests for the training-data pipeline operators
(operators/pipeline.py): crafted-input exactness for the Gopher repetition
stats, packing invariants, an independent from-scratch replay of the
stratified sampler, and plan-shape assertions (sampling is map-side only;
packing's window is partitioned, never a global sort)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from don_crawler_spark.operators import pipeline as PL
from don_crawler_spark.sources.tables import load

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_repetition_stats_crafted(spark) -> None:
    docs = spark.createDataFrame(
        [
            # bigrams: "a b"x3, "b a"x2 -> top2 = 3/5
            # trigrams: "a b a"x2, "b a b"x2 -> all positions dup -> 1.0
            (1, "a b a b a b"),
            # no repeated bigrams -> 1/3; no repeated trigrams -> 0.0
            (2, "w x y z"),
            # degenerate: one token, no grams at all
            (3, "only"),
            # modal bigram "p q" twice of 4 positions; dup3 0
            (4, "p q r p q"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["top2gram_frac"], r["dup3gram_frac"])
        for r in PL.repetition_stats(docs).collect()
    }
    assert got[1] == (0.6, 1.0)
    assert got[2] == (round(1 / 3, 6), 0.0)
    assert got[3] == (0.0, 0.0)
    assert got[4] == (0.5, 0.0)


def test_pack_sequences_invariants(spark) -> None:
    docs = load(spark, SF, "documents")
    rows = PL.pack_sequences(docs).collect()
    assert len(rows) == docs.count()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    budget = PL.PACK_BUDGET
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["doc_id"])
        start = 0
        for r in rs:
            assert r["doc_id"] % PL.PACK_SHARDS == shard
            # doc starts where the previous one ended (concat-and-chunk)
            assert r["bin_id"] == start // budget
            assert r["bin_offset"] == start % budget
            assert 0 <= r["bin_offset"] < budget
            start += r["n_tokens"]


def test_sample_stratified_matches_independent_replay(spark) -> None:
    docs = load(spark, SF, "documents")
    kept = {r["doc_id"]: r["lang"] for r in PL.sample_stratified(docs).collect()}

    expect = {}
    for r in docs.select("doc_id", "lang").collect():
        h = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()
        u = int(h[:8], 16) / 2**32
        rate = PL.SAMPLE_RATES.get(r["lang"], PL.SAMPLE_DEFAULT_RATE)
        if u < rate:
            expect[r["doc_id"]] = r["lang"]
    assert kept == expect
    # the sample actually thins the corpus (rates < 1 for every lang here)
    assert 0 < len(kept) < docs.count()


def test_sample_plan_is_map_side_only(spark) -> None:
    plan = _plan(PL.sample_stratified(load(spark, SF, "documents", respread=False)))
    assert "Exchange" not in plan  # pure scan -> project -> filter


def test_repetition_plan_is_map_side_only(spark) -> None:
    # doc-local run-length folds, not explode->groupBy pyramids: the
    # whole operator must stay on the scan side of any exchange
    plan = _plan(PL.repetition_stats(load(spark, SF, "documents", respread=False)))
    assert "Exchange" not in plan


def test_pack_plan_window_is_partitioned(spark) -> None:
    plan = _plan(PL.pack_sequences(load(spark, SF, "documents", respread=False)))
    # exactly one exchange: the hash shuffle onto shards; a global-sort
    # packing would show a rangepartitioning exchange instead
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(shard" in plan
    assert "rangepartitioning" not in plan


def test_source_cap_matches_single_window_replay(spark) -> None:
    """The two-phase salted top-k must equal the one-window definition:
    replay the md5 order from scratch with hashlib and rank in Python."""
    docs = load(spark, SF, "documents", respread=False)
    got = {
        (r["doc_id"], r["source"]): r["cap_rank"]
        for r in PL.source_cap(docs, cap=7, n_salts=4).collect()
    }
    rows = docs.select("doc_id", "source").collect()
    by_source: dict[str, list[tuple[str, int]]] = {}
    for r in rows:
        h = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()
        by_source.setdefault(r["source"], []).append((h, r["doc_id"]))
    want = {}
    for src, lst in by_source.items():
        for i, (_, doc_id) in enumerate(sorted(lst)[:7]):
            want[(doc_id, src)] = i + 1
    assert got == want


def test_source_cap_plan_windows_are_partitioned(spark) -> None:
    # both ranking phases must run inside hash partitions — a global
    # (rangepartitioning) sort anywhere means the salting didn't happen
    plan = _plan(PL.source_cap(load(spark, SF, "documents", respread=False)))
    assert "rangepartitioning" not in plan
    assert plan.count("Window") >= 2


def test_shuffle_shards_is_permutation_and_replayable(spark) -> None:
    docs = load(spark, SF, "documents", respread=False)
    out = PL.shuffle_shards(docs, n_shards=4).collect()
    n = docs.count()
    assert len(out) == n
    # (shard, pos) is a partition of [0, n) — each shard's positions are
    # exactly 0..len(shard)-1 with no gaps
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert sum(len(v) for v in by_shard.values()) == n
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss)))
    # independent hashlib replay of shard and order for one shard
    def key(doc_id: int) -> tuple[str, int]:
        return (hashlib.md5(str(doc_id).encode()).hexdigest(), doc_id)

    want0 = sorted(
        (key(r["doc_id"]) for r in out if r["shard"] == 0),
    )
    got0 = sorted(
        ((key(r["doc_id"]), r["pos"]) for r in out if r["shard"] == 0),
        key=lambda t: t[1],
    )
    assert [k for k, _ in got0] == want0
    for r in out:
        h32 = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16)
        assert r["shard"] == h32 % 4


def test_shuffle_shards_plan_no_global_sort(spark) -> None:
    plan = _plan(PL.shuffle_shards(load(spark, SF, "documents", respread=False)))
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(shard" in plan
    assert "rangepartitioning" not in plan


def test_token_budget_rates_and_draws_replay(spark) -> None:
    """Independent replay: per-source totals from a plain collect, rate =
    min(1, budget/total), md5 draw from hashlib — the operator's kept set
    and reported rates must match exactly."""
    docs = load(spark, SF, "documents", respread=False)
    toks = {
        (r["doc_id"], r["source"]): len([t for t in r["text"].split(" ") if t])
        for r in docs.select("doc_id", "source", "text").collect()
    }
    totals: dict[str, int] = {}
    for (_, src), n in toks.items():
        totals[src] = totals.get(src, 0) + n
    budgets = PL.TOKEN_BUDGETS
    want = {}
    for (doc_id, src), n in toks.items():
        rate = min(1.0, budgets[src] / totals[src]) if src in budgets else 1.0
        u = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) / 2**32
        if u < rate:
            want[doc_id] = (src, n, round(rate, 6), round(u, 6))
    got = {
        r["doc_id"]: (r["source"], r["n_tokens"], r["keep_rate"], r["sample_u"])
        for r in PL.sample_token_budget(docs).collect()
    }
    assert got == want


def test_token_budget_plan_broadcasts_rates(spark) -> None:
    # the rate table must come back via a broadcast join — corpus rows
    # never shuffle for the mix step; the only exchange is the tiny
    # per-source total agg
    plan = _plan(PL.sample_token_budget(load(spark, SF, "documents", respread=False)))
    assert "BroadcastHashJoin" in plan
    assert "rangepartitioning" not in plan


def test_dsir_importance_matches_independent_replay(spark) -> None:
    """From-scratch hashlib/math replay of the DSIR weighting: hashed
    unigram+bigram bucket counts, Laplace-smoothed LLR per bucket
    (integer-scaled half-up, the engine's fixed-point idiom), exact
    integer per-doc sums, top-k by (weight desc, doc_id)."""
    import math

    docs = load(spark, SF, "documents", respread=False)
    rows = docs.select("doc_id", "source", "text").collect()

    def half_up(x: float) -> int:
        return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)

    B = PL.DSIR_BUCKETS
    doc_buckets: dict[int, list[int]] = {}
    cr: dict[int, int] = {}
    ct: dict[int, int] = {}
    tr = tt = 0
    for r in rows:
        toks = [t for t in r["text"].split(" ") if t]
        feats = toks + [
            toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)
        ]
        is_t = r["source"] in PL.DSIR_TARGET_SOURCES
        bl = doc_buckets.setdefault(r["doc_id"], [])
        for f in feats:
            b = int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % B
            bl.append(b)
            cr[b] = cr.get(b, 0) + 1
            tr += 1
            if is_t:
                ct[b] = ct.get(b, 0) + 1
                tt += 1
    llr_i = {
        b: half_up(
            1000000000.0
            * math.log(
                ((ct.get(b, 0) + 1.0) * float(tr + B))
                / (float(tt + B) * (cr[b] + 1.0))
            )
        )
        for b in cr
    }
    scored = sorted(
        (
            (-sum(llr_i[b] for b in bl), doc_id, len(bl))
            for doc_id, bl in doc_buckets.items()
            if bl
        ),
    )[: PL.DSIR_TOPK]
    want = {
        doc_id: (nf, round(-neg_a / 1000000000.0, 6))
        for neg_a, doc_id, nf in scored
    }
    got = {
        r["doc_id"]: (r["n_feats"], r["log_ratio"])
        for r in PL.dsir_importance(docs).collect()
    }
    assert got == want


def test_dsir_plan_broadcasts_llr_dim(spark) -> None:
    # the 256-row LLR dim must come back onto the feature stream via a
    # broadcast; selection is a TakeOrdered top-k, never a global sort;
    # everything is native expressions (no Python workers)
    plan = _plan(PL.dsir_importance(load(spark, SF, "documents", respread=False)))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan
    assert "EvalPython" not in plan


def test_repeat_epochs_matches_independent_replay(spark) -> None:
    docs = load(spark, SF, "documents")
    rows = PL.repeat_epochs(docs).collect()

    # independent from-scratch replay: integer-permille copies per doc
    expect: dict[int, int] = {}
    for r in docs.select("doc_id", "source").collect():
        pm = PL.EPOCH_PERMILLE.get(r["source"], PL.EPOCH_DEFAULT_PERMILLE)
        u32 = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16)
        copies = pm // 1000 + (1 if u32 * 1000 < (pm % 1000) * 2**32 else 0)
        if copies >= 1:
            expect[r["doc_id"]] = copies
    got: dict[int, set] = {}
    for r in rows:
        got.setdefault(r["doc_id"], set()).add(r["epoch"])
        assert r["n_copies"] == expect[r["doc_id"]]
    # epochs are exactly 1..n_copies per doc, no gaps or dups
    assert {d: len(e) for d, e in got.items()} == expect
    for d, e in got.items():
        assert e == set(range(1, expect[d] + 1))

    # the mixing table is actually exercised end-to-end: an upsampled
    # source emits more rows than docs, the sub-epoch source fewer
    src = {r["source"] for r in rows}
    n_docs = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    n_out: dict[str, int] = {}
    for r in rows:
        n_out[r["source"]] = n_out.get(r["source"], 0) + 1
    assert n_out["src0"] > n_docs["src0"]  # 2.3 epochs
    if "src2" in src:
        assert n_out["src2"] < n_docs["src2"]  # 0.4 epochs
    assert n_out["src3"] == n_docs["src3"]  # default 1.0 = identity


def test_repeat_epochs_plan_is_map_side_only(spark) -> None:
    # project -> filter -> explode(sequence), zero shuffles, no Python
    plan = _plan(PL.repeat_epochs(load(spark, SF, "documents", respread=False)))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_holdout_split_coassigns_exact_dups(spark) -> None:
    """The split key is content, not id: injected byte-identical copies
    (shifted doc_ids) must land on the same side as their originals."""
    import __spark_entry__ as em

    docs = em._docs_with_dups(spark, SF)
    rows = PL.holdout_split(docs).collect()
    by_id = {r["doc_id"]: r["split"] for r in rows}
    n_pairs = 0
    for did, split in by_id.items():
        if did >= 1_000_000 and (did - 1_000_000) in by_id:
            assert split == by_id[did - 1_000_000]
            n_pairs += 1
    assert n_pairs > 0  # the dup fixture actually exercised the invariant

    # band arithmetic replayed from scratch
    for r in docs.select("doc_id", "text").collect():
        u32 = int(hashlib.md5(r["text"].encode()).hexdigest()[:8], 16)
        want = (
            "val" if u32 * 1000 < 50 * 2**32
            else "test" if u32 * 1000 < 100 * 2**32
            else "train"
        )
        assert by_id[r["doc_id"]] == want

    # all three sides non-empty at this scale
    sides = set(by_id.values())
    assert sides == {"train", "val", "test"}


def test_holdout_split_plan_is_map_side_only(spark) -> None:
    plan = _plan(PL.holdout_split(load(spark, SF, "documents", respread=False)))
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
