"""As-of (point-in-time) join — an operator Spark has no native form of.

For each probe row, find the single reference row with the greatest
timestamp at-or-before the probe's timestamp within the same key. The
classic implementations are a range join (quadratic blowup between
matches) or a per-key loop; the Spark-first shape used here is the
union-marker pattern:

    union(probe, ref) -> one hash shuffle on the key
    -> window ordered by (ts, is_probe, ref order col)
    -> last(ref_struct, ignoreNulls) over rows-unbounded-preceding
    -> keep probe rows

One exchange, a PARTITIONED window (never a global sort), O(n log n)
per key, no join explosion on dense reference streams. Ties: a reference
row at exactly the probe's timestamp matches (inclusive, like DuckDB's
ASOF JOIN); among references sharing a timestamp the one greatest in
``ref_order`` wins (deterministic — the DuckDB oracle mirrors it with an
ORDER BY ... LIMIT 1 lateral).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probe: DataFrame,
    ref: DataFrame,
    on: str,
    ts: str,
    ref_order: str,
    ref_prefix: str = "ref_",
) -> DataFrame:
    """Left as-of join: every probe row, plus the matched reference row's
    columns prefixed ``ref_prefix`` (nulls when no reference at-or-before
    exists). ``ref_order`` breaks same-timestamp reference ties (greatest
    wins)."""
    ref_cols = [c for c in ref.columns]
    probe_cols = [c for c in probe.columns]

    ref_side = ref.select(
        F.col(on).alias("__k"),
        F.col(ts).alias("__t"),
        F.lit(0).alias("__is_probe"),
        F.col(ref_order).cast("long").alias("__ord"),
        F.struct(*ref_cols).alias("__ref"),
        *[F.lit(None).cast(probe.schema[c].dataType).alias(f"__p_{c}")
          for c in probe_cols],
    )
    probe_side = probe.select(
        F.col(on).alias("__k"),
        F.col(ts).alias("__t"),
        F.lit(1).alias("__is_probe"),
        F.lit(None).cast("long").alias("__ord"),
        F.lit(None).cast(ref_side.schema["__ref"].dataType).alias("__ref"),
        *[F.col(c).alias(f"__p_{c}") for c in probe_cols],
    )

    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__t").asc(), F.col("__is_probe").asc(), F.col("__ord").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = (
        probe_side.unionByName(ref_side)
        .withColumn("__match", F.last("__ref", ignorenulls=True).over(w))
        .filter(F.col("__is_probe") == 1)
    )
    return joined.select(
        *[F.col(f"__p_{c}").alias(c) for c in probe_cols],
        *[F.col("__match")[c].alias(f"{ref_prefix}{c}") for c in ref_cols],
    )
