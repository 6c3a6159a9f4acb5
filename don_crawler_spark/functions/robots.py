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

from pyspark.sql import DataFrame
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


def compile_rules(robots: DataFrame) -> DataFrame:
    """Aggregate a host's rules into ONE array column, sorted so the
    winning rule is the first prefix match: longest prefix first, allow
    before deny on length ties (RFC 9309 least-restrictive). The result
    is a per-host dimension row — tiny, broadcastable."""
    rule = F.struct(
        (-F.length("path_prefix")).alias("neg_len"),
        (~F.col("allow")).cast("int").alias("deny_rank"),
        F.col("path_prefix").alias("path_prefix"),
        F.col("allow").alias("allow"),
    )
    return robots.groupBy("host").agg(
        F.sort_array(F.collect_list(rule)).alias("rules")
    )


def apply_robots_filter(
    frontier: DataFrame, robots: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Split a frontier (with ``host`` and ``path`` columns) into
    (allowed, denied) by longest-prefix robots match.

    Entirely map-side after one broadcast hash join on host: the per-host
    rule array is scanned with higher-order functions (filter +
    element_at), so NO shuffle of the frontier happens here — at 10^10
    frontier rows this stage costs one broadcast and one pass.
    """
    compiled = compile_rules(robots)
    joined = frontier.join(F.broadcast(compiled), "host", "left")
    first_match = F.element_at(
        F.filter(
            F.col("rules"),
            lambda r: F.col("path").startswith(r["path_prefix"]),
        ),
        1,
    )
    resolved = joined.withColumn(
        "__allowed",
        F.coalesce(first_match["allow"], F.lit(True)),
    ).drop("rules")
    allowed = resolved.filter(F.col("__allowed")).drop("__allowed")
    denied = resolved.filter(~F.col("__allowed")).drop("__allowed")
    return allowed, denied
