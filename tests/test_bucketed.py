"""Bucketed-layout tests (sources/bucketed.py): the co-located join and
the on-bucket-key aggregation must be exchange-free, results must match
the plain-parquet plan, and a bucket-count mismatch must degrade to a
shuffle (not wrong rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from don_crawler_spark.sources.bucketed import bucketed, write_bucketed

SF = "/root/testdata/sf0.001"


def _final_plan(df) -> str:
    df.write.mode("overwrite").format("noop").save()
    return df._jdf.queryExecution().executedPlan().toString()


def _setup(spark, n_orders=8, n_lineitem=8):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    l = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(o, "t_bkt_orders", "o_orderkey", n_orders, "o_orderkey")
    write_bucketed(l, "t_bkt_lineitem", "l_orderkey", n_lineitem, "l_orderkey")
    return bucketed(spark, "t_bkt_orders"), bucketed(spark, "t_bkt_lineitem")


def test_bucketed_join_has_no_exchange(spark) -> None:
    o, l = _setup(spark)
    j = o.hint("merge").join(l, o["o_orderkey"] == l["l_orderkey"]).select(
        "o_orderkey", "l_linenumber"
    )
    plan = _final_plan(j)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan


def test_bucketed_agg_on_key_has_no_exchange(spark) -> None:
    o, l = _setup(spark)
    agg = (
        o.hint("merge").join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    plan = _final_plan(agg)
    assert "Exchange" not in plan, plan


def test_bucketed_join_matches_plain_parquet(spark) -> None:
    o, l = _setup(spark)
    b = (
        o.hint("merge").join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
    )
    po = spark.read.parquet(f"{SF}/orders.parquet")
    pl = spark.read.parquet(f"{SF}/lineitem.parquet")
    p = (
        po.join(pl, po["o_orderkey"] == pl["l_orderkey"])
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, b.collect())) == sorted(map(tuple, p.collect()))


def test_bucket_count_mismatch_degrades_to_shuffle(spark) -> None:
    """8 vs 4 buckets: Spark must re-shuffle (at least) the mismatched
    side rather than zip misaligned buckets; rows stay correct."""
    o, l = _setup(spark, n_orders=8, n_lineitem=4)
    j = o.hint("merge").join(l, o["o_orderkey"] == l["l_orderkey"]).select("o_orderkey")
    plan = _final_plan(j)
    assert "Exchange" in plan
    n = j.count()
    pn = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF}/lineitem.parquet"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert n == pn


def test_k4_query_binding_runs_and_is_exchange_free(spark) -> None:
    import __spark_entry__ as em

    df = em.queries()["k4_bucketed_join"](spark, SF)
    plan = _final_plan(df)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    assert df.count() > 0
