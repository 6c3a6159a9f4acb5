"""Structured-Streaming ingest of page captures.

The crawl itself is batch-iterative by design (the north_rule's round
loop), but the PAGES CORPUS is a continuously-arriving feed in production
(WARC drops landing in object storage). This module ingests such drops
with a file-source stream — schema-pinned, checkpointed, exactly-once per
file — and maintains an event-time fetch-rate metric with a watermark for
late captures.

``availableNow`` triggers make the same code testable in-process: one
call drains whatever has landed and stops, which is also the
recommended production shape for periodic (cron-style) incremental
ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def pages_stream(spark: SparkSession, drop_dir: str) -> DataFrame:
    """Streaming source over a directory of parquet page-capture drops.
    Schema is pinned (no inference on streams); maxFilesPerTrigger bounds
    per-batch work the way the crawl's budgets bound per-round work."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(drop_dir)
    )


def ingest_available(
    spark: SparkSession, drop_dir: str, target_dir: str, checkpoint_dir: str
) -> None:
    """Drain currently-available drops into the canonical pages dataset.
    File-source + checkpoint = exactly-once per input file; a re-run after
    a crash resumes from the stream checkpoint (same guarantee family as
    the crawl's manifest protocol)."""
    stream = pages_stream(spark, drop_dir)
    (
        stream.writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def wet_pages_stream(spark: SparkSession, drop_dir: str) -> DataFrame:
    """Streaming source over raw WET drops — the same record-boundary
    ``lineSep`` splitting and pure-JVM parse expressions as the batch
    reader (sources/warc.py), lifted onto the text FILE STREAM source,
    so Common-Crawl-style WET segments landing in object storage stream
    straight into (url, warc_ts, text) page rows without a parquet
    conversion hop. Exactly-once per file comes from the stream
    checkpoint, like :func:`pages_stream`."""
    from don_crawler_spark.sources.warc import RECORD_MARKER, parse_wet_fields

    segs = spark.readStream.text(drop_dir, lineSep=RECORD_MARKER)
    return (
        segs.filter(F.length("value") > 0)
        .select(*parse_wet_fields(F.col("value")))
        .filter(F.col("warc_type") == "conversion")
        .select(
            F.col("target_uri").alias("url"),
            # try_to_timestamp: one malformed WARC-Date must degrade to
            # null, not kill the checkpointed stream on every retry
            F.try_to_timestamp("warc_date").alias("warc_ts"),
            F.col("payload").alias("text"),
        )
    )


def ingest_wet_available(
    spark: SparkSession, drop_dir: str, target_dir: str, checkpoint_dir: str
) -> None:
    """Drain currently-available WET drops into the canonical pages
    dataset (availableNow, checkpointed — a crash/re-run never
    re-ingests a file)."""
    (
        wet_pages_stream(spark, drop_dir)
        .writeStream.format("parquet")
        .option("path", target_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def capture_rate(pages: DataFrame, window: str = "1 hour") -> DataFrame:
    """Event-time capture-rate metric: pages per window of warc_ts, with a
    watermark so late-arriving captures (out-of-order WARC drops) still
    land while state stays bounded."""
    src = pages
    if pages.isStreaming:
        src = pages.withWatermark("warc_ts", "2 hours")
    return (
        src.groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
        )
    )
