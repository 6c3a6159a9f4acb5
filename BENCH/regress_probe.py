#!/usr/bin/env python
"""Round-4 investigation: the r3 bench regressions (VERDICT #1/#2).

Two questions, answered with interleaved repeats + host write probes
(the hypervisor throttle drifts within minutes, so single A-then-B
timings are meaningless — see memory/host-write-throttle):

  --queries : dedup_simhash + dedup_embedding_cosine at sf0.1 with the
              tables.load re-spread ON vs OFF (suspect (a) in VERDICT:
              repartition(2*cores) shrank Arrow batches ~64x under the
              v1 kernel's batch-shared md5 vocabulary).
  --kernels : simhash v1 (pandas UDF) vs v2/v3 (JVM HOF) in isolation
              over the 200k-page bench corpus extracted text.

Prints one JSON line per mode with per-rep wall times + probes.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


# single probe/force implementation lives in bench.py so readings stay
# comparable across scripts (the 2x pair-agreement gate depends on it)
from bench import force, probe_mbs  # noqa: E402


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", action="store_true")
    ap.add_argument("--kernels", action="store_true")
    ap.add_argument("--persist", action="store_true")
    ap.add_argument("--simhash-persist", action="store_true")
    ap.add_argument("--codec", action="store_true")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from don_crawler_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    spark = get_spark(
        "regress-probe",
        cpus=cpus,
        shuffle_partitions=2 * cpus,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            "spark.sql.adaptive.enabled": "false",
        },
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    if args.queries:
        import __spark_entry__ as E

        def load_respread(spark, sf_dir, name, respread=True):
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
            if respread and df.rdd.getNumPartitions() < max(2, cpus // 4):
                df = df.repartition(2 * cpus)
            return df

        def load_plain(spark, sf_dir, name, respread=True):
            return spark.read.parquet(f"{sf_dir}/{name}.parquet")

        qs = E.queries()
        results: dict[str, list] = {}
        for rep in range(args.repeats):
            for mode, loader in (("respread", load_respread), ("plain", load_plain)):
                E.load = loader
                for qname in ("dedup_simhash", "dedup_embedding_cosine"):
                    p0 = probe_mbs()
                    t0 = time.monotonic()
                    force(qs[qname](spark, sf_dir))
                    wall = round(time.monotonic() - t0, 3)
                    results.setdefault(f"{qname}:{mode}", []).append(
                        {"wall": wall, "probe_before": p0, "probe_after": probe_mbs()}
                    )
        print(json.dumps(results))

    if args.kernels:
        from pyspark.sql import functions as F

        from don_crawler_spark.functions.extract import with_extracted_description
        from don_crawler_spark.operators.dedup import (
            simhash_native_col,
            simhash_udf,
        )

        corpus = os.path.join(
            REPO,
            "data",
            "corpus_n200000_s42_budget_scale4000_extra_paragraphs20_"
            "n_publishers10000_out_degree8",
        )
        pages = spark.read.parquet(f"{corpus}/pages.parquet")
        texts = (
            with_extracted_description(pages, "html", "text")
            .select("text")
            .persist()
        )
        n = texts.count()
        # warm both paths
        force(texts.limit(2000).select(simhash_udf(F.col("text")).alias("s")))
        force(texts.limit(2000).select(simhash_native_col(F.col("text")).alias("s")))
        kernels = {
            "v1_pandas": lambda: texts.select(simhash_udf(F.col("text")).alias("s")),
            "v2_native": lambda: texts.select(
                simhash_native_col(F.col("text")).alias("s")
            ),
        }
        results = {"n_texts": n, "n_parts": texts.rdd.getNumPartitions()}
        for rep in range(args.repeats):
            for kname, mk in kernels.items():
                p0 = probe_mbs()
                t0 = time.monotonic()
                force(mk())
                wall = round(time.monotonic() - t0, 3)
                results.setdefault(kname, []).append(
                    {"wall": wall, "probe_before": p0, "probe_after": probe_mbs()}
                )
        print(json.dumps(results))

    if args.persist:
        # r2 #8 (finally measured): does persisting the exploded shingle
        # relation beat recomputing the scan+tokenize+explode per
        # consumer shuffle? Interleaved reps, probes around each run,
        # cache cleared between runs so neither shape inherits state.
        from don_crawler_spark.operators.dedup import (
            minhash_lsh_pairs,
            ngram_jaccard_pairs,
        )
        from don_crawler_spark.sources.tables import load

        docs = load(spark, sf_dir, "documents").select("doc_id", "text")
        ops = {
            # same params as the registered bench queries
            "ngram": lambda p: ngram_jaccard_pairs(
                docs, n=3, threshold=0.2, max_shingle_df=50, persist_shingles=p
            ),
            "minhash": lambda p: minhash_lsh_pairs(
                docs, n=3, bands=8, verify_threshold=0.1, persist_shingles=p
            ),
        }
        results = {}
        for rep in range(args.repeats):
            for opname, mk in ops.items():
                for mode, flag in (("nopersist", False), ("persist", True)):
                    spark.catalog.clearCache()
                    p0 = probe_mbs()
                    t0 = time.monotonic()
                    force(mk(flag))
                    wall = round(time.monotonic() - t0, 3)
                    results.setdefault(f"{opname}:{mode}", []).append(
                        {"wall": wall, "probe_before": p0,
                         "probe_after": probe_mbs()}
                    )
        spark.catalog.clearCache()
        print(json.dumps(results))

    if args.simhash_persist:
        # r4: the (doc_id, simhash) relation feeds both sides of the band
        # self-join — does persisting it (running the v1 pandas kernel
        # once instead of twice) explain dedup_simhash's ~11s bench row?
        from don_crawler_spark.operators.dedup import simhash_near_dup_pairs
        from don_crawler_spark.sources.tables import load

        docs = load(spark, sf_dir, "documents").select("doc_id", "text")
        results = {}
        for rep in range(args.repeats):
            for mode, flag in (("nopersist", False), ("persist", True)):
                spark.catalog.clearCache()
                p0 = probe_mbs()
                t0 = time.monotonic()
                force(simhash_near_dup_pairs(docs, max_hamming=3,
                                             persist_sim=flag))
                wall = round(time.monotonic() - t0, 3)
                results.setdefault(f"simhash:{mode}", []).append(
                    {"wall": wall, "probe_before": p0,
                     "probe_after": probe_mbs()}
                )
        spark.catalog.clearCache()
        print(json.dumps(results))

    if args.codec:
        # r4: the crawl wall is dominated by the per-round fetched_full
        # parquet write (extracted text). zstd compresses text ~2x
        # tighter than the snappy default — fewer dirtied bytes on the
        # write-throttled host, less IO on a real warehouse. Interleaved
        # crawl bench snappy vs zstd, same session.
        from bench import run_crawl_bench

        results = {}
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
        run_crawl_bench(spark, sf, max_rounds=1, n_pages=2000)  # warmup
        for rep in range(args.repeats):
            for codec in ("snappy", "zstd"):
                spark.conf.set("spark.sql.parquet.compression.codec", codec)
                p0 = probe_mbs()
                r = run_crawl_bench(spark, sf)
                results.setdefault(f"crawl:{codec}", []).append(
                    {"wall": r["crawl_wall_sec"],
                     "urls_per_sec": r["urls_per_sec"],
                     "probe_before": p0, "probe_after": probe_mbs()}
                )
        spark.conf.set("spark.sql.parquet.compression.codec", "snappy")
        print(json.dumps(results))

    spark.stop()


if __name__ == "__main__":
    main()
