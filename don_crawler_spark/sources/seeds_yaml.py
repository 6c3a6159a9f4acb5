"""YAML publisher seed files — S2/S3/K2/J2 from the reference.

Reference: ``LoadPublishers`` (common/publisher.go:22-36) parses
publisher YAML files ({id, name, organization, repositories[], ...});
multiple files concatenate (cmd/crawl.go:54-62, U1);
``downloadPublishersCmd`` merges a fetched repolist into an existing file
by upserting on id==ipa (cmd/download_publishers.go:63-101, J2/U3/K2).

Seed files are tiny driver-side artifacts (they SEED the distributed
crawl), so parse/merge runs in plain Python and only the result becomes a
DataFrame.
"""

from __future__ import annotations

import yaml
from pyspark.sql import DataFrame, SparkSession

SEED_SCHEMA = (
    "publisher_id string, publisher_name string, org_url string, "
    "repo_urls array<string>, organisation_url string"
)


def parse_publishers_yaml(text: str) -> list[dict]:
    """One YAML document: a list of publisher mappings."""
    raw = yaml.safe_load(text) or []
    out = []
    for entry in raw:
        out.append(
            {
                "publisher_id": str(entry.get("id", "")),
                "publisher_name": str(entry.get("name", "")),
                "org_url": str(entry.get("organization", "")),
                "repo_urls": [str(u) for u in entry.get("repositories", []) or []],
                "organisation_url": str(entry.get("organisation_url", "")),
            }
        )
    return out


def load_publishers(spark: SparkSession, *paths: str) -> DataFrame:
    """S2 + U1: concatenation of publisher YAML files -> seeds DataFrame."""
    rows: list[dict] = []
    for path in paths:
        with open(path, encoding="utf-8") as fh:
            rows.extend(parse_publishers_yaml(fh.read()))
    return spark.createDataFrame(rows, SEED_SCHEMA)


def merge_publishers(existing: list[dict], incoming: list[dict]) -> list[dict]:
    """J2/U3 — upsert on publisher_id: matched entries get the incoming
    org URL, unmatched incoming entries append (existing order kept,
    new entries in incoming order — cmd/download_publishers.go:63-84)."""
    by_id = {p["publisher_id"]: dict(p) for p in existing}
    order = [p["publisher_id"] for p in existing]
    for inc in incoming:
        pid = inc["publisher_id"]
        if pid in by_id:
            by_id[pid]["org_url"] = inc["org_url"] or by_id[pid]["org_url"]
            if inc.get("organisation_url"):
                by_id[pid]["organisation_url"] = inc["organisation_url"]
        else:
            by_id[pid] = dict(inc)
            order.append(pid)
    return [by_id[pid] for pid in order]


def write_publishers(publishers: list[dict], path: str) -> None:
    """K2 — marshal the merged list back to YAML."""
    doc = [
        {
            "id": p["publisher_id"],
            "name": p["publisher_name"],
            "organization": p["org_url"],
            "repositories": list(p.get("repo_urls") or []),
            "organisation_url": p.get("organisation_url", ""),
        }
        for p in publishers
    ]
    with open(path, "w", encoding="utf-8") as fh:
        yaml.safe_dump(doc, fh, sort_keys=False, allow_unicode=True)
