"""Behavioral pins for sharded inverted-index construction
(operators/retrieval.py inverted_index): posting content/order on a
crafted corpus, the shard split, and the two-exchange JVM-only plan."""

from __future__ import annotations

from don_crawler_spark.operators.retrieval import inverted_index
from don_crawler_spark.sources.tables import load

SF = "/root/testdata/sf0.001"


def _index(spark, docs, n_shards=8):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        (r["term"], r["shard"]): (r["df"], r["total_tf"], r["postings"])
        for r in inverted_index(df, n_shards=n_shards).collect()
    }


def test_postings_content_and_order(spark) -> None:
    got = _index(
        spark,
        [
            (0, "a b a"),
            (1, "a  c"),  # double space: empty token filtered
            (2, "b"),
        ],
        n_shards=1,
    )
    assert got[("a", 0)] == (2, 3, "0:2 1:1")
    assert got[("b", 0)] == (2, 2, "0:1 2:1")
    assert got[("c", 0)] == (1, 1, "1:1")


def test_shard_split_partitions_hot_terms(spark) -> None:
    # the same term lands in doc_id % 2 shards; per-shard stats
    # re-aggregate to the global df by summing
    got = _index(
        spark, [(i, "hot") for i in range(6)], n_shards=2
    )
    assert got[("hot", 0)] == (3, 3, "0:1 2:1 4:1")
    assert got[("hot", 1)] == (3, 3, "1:1 3:1 5:1")


def test_plan_two_exchanges_no_python(spark) -> None:
    plan = (
        inverted_index(load(spark, SF, "documents", respread=False))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one (term, doc_id) tf shuffle + one (term, shard) posting shuffle
    assert plan.count("Exchange") == 2
    assert "EvalPython" not in plan
    # the text column is pruned at the scan and never crosses a shuffle
    assert "ReadSchema" in plan and "text" in plan.split("ReadSchema")[1][:200]
    for frag in plan.split("Exchange hashpartitioning")[1:]:
        assert "text#" not in frag.split("\n")[0]
