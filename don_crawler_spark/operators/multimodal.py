"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct, processed by Arrow-batched kernels over ``mapInPandas``.
The decode step itself is STUBBED (no image/audio libraries in this
container): ``decode_stub=True`` produces a deterministic fake feature
vector from the bytes; a real deployment swaps `_decode_image` for a
PIL/ffmpeg call with the SAME batch shape and schema — the Spark-side
plumbing (schema, partitioning, batch iteration, output contract) is real
and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, payload binary, mime string, width int, height int"
)
FEATURE_DIM = 16


def _decode_image(payload: bytes) -> np.ndarray:
    """STUB decode: a real implementation would be
    ``np.asarray(PIL.Image.open(io.BytesIO(payload)))``. Here: a
    deterministic pseudo-feature from the payload digest so tests pin the
    plumbing end-to-end."""
    digest = hashlib.sha256(payload).digest()
    arr = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16)
    return (arr.astype(np.float64) / 65535.0).astype(np.float32)


def extract_features(media: DataFrame) -> DataFrame:
    """binary payload -> fixed-dim feature vector, Arrow-batched.

    Scale: one pass, no shuffle; batches bounded by
    spark.sql.execution.arrow.maxRecordsPerBatch so payload memory stays
    bounded regardless of row width.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_image(p).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "features": feats,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        kernel, "media_id long, n_bytes long, features array<float>"
    )


def resize_metadata(media: DataFrame, max_side: int = 512) -> DataFrame:
    """Pure-metadata resize planning (aspect-preserving bound to max_side)
    — native expressions, no decode needed."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return media.select(
        "media_id",
        "width",
        "height",
        F.ceil(F.col("width") * scale).cast("int").alias("out_width"),
        F.ceil(F.col("height") * scale).cast("int").alias("out_height"),
    )


def frame_sample_plan(
    media: DataFrame, duration_col: str = "width", every_n_sec: int = 10
) -> DataFrame:
    """Frame-sampling plan for video payloads: one output row per sampled
    frame timestamp (explode of a generated sequence — the UDTF-shaped
    operator, no Python)."""
    return media.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col(duration_col).cast("int"), F.lit(every_n_sec))
        ).alias("frame_ts_sec"),
    )


def make_fake_media(docs: DataFrame) -> DataFrame:
    """Adapter for tests/benches: wrap documents as media rows (payload =
    utf-8 bytes of text; width/height derived deterministically)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
        (F.pmod(F.col("doc_id") * 37, F.lit(1920)) + 16).cast("int").alias("width"),
        (F.pmod(F.col("doc_id") * 53, F.lit(1080)) + 16).cast("int").alias("height"),
    )


# (hex prefix at offset 0, mime, media class). First match wins; RIFF
# containers disambiguate on bytes 9-12 (checked before the plain
# prefixes so the generic RIFF marker never shadows them).
MAGIC_PREFIXES = (
    ("FFD8FF", "image/jpeg", "image"),
    ("89504E470D0A1A0A", "image/png", "image"),
    ("474946383761", "image/gif", "image"),
    ("474946383961", "image/gif", "image"),
    ("255044462D", "application/pdf", "document"),
    ("1F8B", "application/gzip", "archive"),
    ("504B0304", "application/zip", "archive"),
)
_RIFF = "52494646"
_RIFF_KINDS = (("57415645", "audio/wav", "audio"), ("57454250", "image/webp", "image"))


def mime_sniff(data) -> list:
    """Columns ``mime`` and ``media_class`` for a binary payload by
    magic-byte sniffing — the trust-the-bytes-not-the-header rule every
    archive pipeline needs (Content-Type on real WARC responses is
    wrong or missing constantly; Common Crawl's own indexing sniffs).

    Detection is a prefix ladder over the HEX of the first 16 bytes
    (hex comparison sidesteps binary-collation differences across
    engines): JPEG/PNG/GIF/PDF/GZIP/ZIP by leading magic, RIFF
    containers (WAV/WEBP) by the bytes-9-12 form tag, an ASCII
    ``<html`` / ``<!DOCTYPE`` probe (case-insensitive) for text/html,
    octet-stream otherwise. Pure codegen hex/substring expressions —
    map-side only, zero exchanges, zero Python.
    """
    h = F.hex(F.substring(data, 1, 16))
    head = F.upper(F.substring(data.cast("string"), 1, 16))
    mime = F.when(
        h.startswith(_RIFF) & (F.substring(h, 17, 8) == _RIFF_KINDS[0][0]),
        F.lit(_RIFF_KINDS[0][1]),
    ).when(
        h.startswith(_RIFF) & (F.substring(h, 17, 8) == _RIFF_KINDS[1][0]),
        F.lit(_RIFF_KINDS[1][1]),
    )
    cls = F.when(
        h.startswith(_RIFF) & (F.substring(h, 17, 8) == _RIFF_KINDS[0][0]),
        F.lit(_RIFF_KINDS[0][2]),
    ).when(
        h.startswith(_RIFF) & (F.substring(h, 17, 8) == _RIFF_KINDS[1][0]),
        F.lit(_RIFF_KINDS[1][2]),
    )
    for pref, m, c in MAGIC_PREFIXES:
        mime = mime.when(h.startswith(pref), F.lit(m))
        cls = cls.when(h.startswith(pref), F.lit(c))
    is_html = head.startswith("<HTML") | head.startswith("<!DOCTYPE")
    mime = mime.when(is_html, F.lit("text/html")).otherwise(
        F.lit("application/octet-stream")
    )
    cls = cls.when(is_html, F.lit("text")).otherwise(F.lit("binary"))
    return [mime.alias("mime"), cls.alias("media_class")]
