"""don_crawler_spark — a PySpark-native batch-iterative crawl/analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of developer-overheid-nl/don-crawler (a Go crawler), re-expressed
Spark-first: the reference's goroutine pipeline becomes a driver-side round
loop over DataFrames; its per-key locks become anti-joins against a
distributed URL-seen set; its rate-limit state becomes a broadcast
host-budget table; its README extractor becomes a vectorized Arrow UDF that
is byte-identical per URL to the Go function.

Layout:
    functions/   scalar kernels: extraction, URL canonicalization, hashing,
                 robots matching, rate-limit header parsing
    operators/   analytics: vitality scoring, dedup (exact/minhash/simhash),
                 similarity search, text stats, multimodal plumbing
    sources/     table loaders + the deterministic synthetic corpus generator
    plans/       the crawl round dataflow, multi-round driver, checkpointing,
                 and the single-threaded Python oracle (golden traces)
    streaming/   structured-streaming ingest of page captures
"""

__version__ = "0.1.0"
