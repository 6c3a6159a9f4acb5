"""Loaders for the driver-provided testdata tables (TESTDATA.md)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load(
    spark: SparkSession, sf_dir: str, name: str, respread: bool = True
) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # The driver testdata ships single-row-group parquet files, which scan
    # as ONE input split no matter the conf — every downstream explode /
    # UDF / join then runs serial on a 32-core session. When the storage
    # layout under-splits like this, re-spread to the session's
    # parallelism (a ~MB shuffle here). On warehouse data (many files /
    # row groups) nparts >> cores and this is a no-op — the layout, not a
    # forced shuffle, provides the parallelism.
    #
    # ``respread=False``: consumers whose FIRST heavy operation is itself
    # a shuffle (cogroup / groupBy with cheap map work above it) should
    # opt out — the shuffle they already pay provides the parallelism,
    # and the extra exchange is pure overhead (r3 ADVICE; measured 1.7x
    # on the cogrouped-GEMM embedding dedup).
    # Dimension-scale tables (region, nation, supplier …) go straight to
    # a broadcast on the join side; shuffling 5 rows into 2*cores
    # partitions first is pure overhead (r3 ADVICE). 16 KB on disk cleanly
    # separates the dims from the fact/text tables at every shipped SF.
    path = f"{sf_dir}/{name}.parquet"
    tiny = os.path.isfile(path) and os.path.getsize(path) < 16 * 1024
    cores = spark.sparkContext.defaultParallelism
    if respread and not tiny and df.rdd.getNumPartitions() < max(2, cores // 4):
        df = df.repartition(2 * cores)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
