"""robots.txt allow/deny matching over a rules table.

The reference has no robots support (its "politeness" is provider
rate-limit budgets, scanner/github.go:26-29); the north_rule adds
robots allow/deny as a frontier filter. Rules are modeled as a table
``robots(host, path_prefix, allow)`` — the parsed form of per-host
robots.txt files — and matching follows the standard longest-prefix-match
rule (Google's robots.txt spec, RFC 9309 §2.2.2):

  * only rules whose host equals the URL's host apply
  * among rules whose path_prefix is a prefix of the URL path, the
    LONGEST prefix wins
  * on a length tie, allow wins (RFC 9309: least-restrictive)
  * no matching rule -> allowed

Engine side this is a broadcast join + window max — robots tables are
tiny relative to the frontier (even 10^8 hosts x a few rules fits in
executor memory after the host-equi join prunes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def robots_allowed_py(
    rules: dict[str, list[tuple[str, bool]]], host: str, path: str
) -> bool:
    """Oracle-side matcher. ``rules`` maps host -> [(path_prefix, allow)]."""
    best_len = -1
    best_allow = True
    for prefix, allow in rules.get(host, []):
        if path.startswith(prefix) and (
            len(prefix) > best_len or (len(prefix) == best_len and allow)
        ):
            best_len = len(prefix)
            best_allow = allow
    return best_allow


def apply_robots_filter(
    frontier: DataFrame, robots: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Split a frontier (with ``host`` and ``path`` columns) into
    (allowed, denied) by longest-prefix robots match.

    The robots side is broadcast: it is a per-host dimension, never
    frontier-sized. The window below runs per frontier row (partition key
    includes url_hash), so it never shuffles more than the join output.
    """
    r = robots.select(
        F.col("host").alias("r_host"),
        F.col("path_prefix"),
        F.col("allow"),
    )
    joined = frontier.join(
        F.broadcast(r),
        (frontier["host"] == F.col("r_host"))
        & frontier["path"].startswith(F.col("path_prefix")),
        "left",
    )
    # longest prefix wins; tie -> allow (RFC 9309 least-restrictive)
    w = Window.partitionBy("url_hash").orderBy(
        F.length("path_prefix").desc_nulls_last(),
        F.col("allow").desc_nulls_last(),
    )
    ranked = joined.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") == 1
    )
    resolved = ranked.withColumn(
        "__allowed", F.coalesce(F.col("allow"), F.lit(True))
    ).drop("r_host", "path_prefix", "allow", "__rn")
    allowed = resolved.filter(F.col("__allowed")).drop("__allowed")
    denied = resolved.filter(~F.col("__allowed")).drop("__allowed")
    return allowed, denied
