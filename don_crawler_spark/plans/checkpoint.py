"""Snapshot checkpoint protocol — manifest-over-parquet.

Iceberg's runtime jar is not available in this sandbox, so snapshots are
parquet directories plus a JSON manifest written LAST via
write-temp-then-atomic-rename (SURVEY.md §7 step 5). The manifest is the
commit point: a killed job leaves at most a dangling round directory that
the next run ignores, so resume loses at most one round (north_star's
resumability requirement). On a real deployment each round would be one
Iceberg transaction appending to ``fetched``/``trace`` and replacing
``frontier`` — the protocol here mirrors those semantics.

Layout:
    {root}/round=K/{frontier,seen_delta,trace,fetched,metrics}.parquet/
    {root}/manifest_K.json          <- commit record for round K
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


class CheckpointStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # --- manifest protocol -------------------------------------------------

    def _manifest_path(self, rnd: int) -> str:
        return os.path.join(self.root, f"manifest_{rnd:05d}.json")

    def latest_round(self) -> int:
        """Highest round with a committed manifest; 0 = fresh crawl."""
        best = 0
        for name in os.listdir(self.root):
            if name.startswith("manifest_") and name.endswith(".json"):
                try:
                    best = max(best, int(name[len("manifest_") : -len(".json")]))
                except ValueError:
                    continue
        return best

    def read_manifest(self, rnd: int) -> dict:
        with open(self._manifest_path(rnd)) as fh:
            return json.load(fh)

    def commit_round(self, rnd: int, counters: dict) -> None:
        """Atomic commit: the manifest appears only fully written."""
        payload = json.dumps({"round": rnd, "counters": counters}, indent=1)
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".tmp")
        with os.fdopen(fd, "w") as fh:
            fh.write(payload)
        os.replace(tmp, self._manifest_path(rnd))

    # --- table paths ---------------------------------------------------------

    def table_path(self, rnd: int, name: str) -> str:
        return os.path.join(self.root, f"round={rnd:05d}", f"{name}.parquet")

    def write_table(self, df: DataFrame, rnd: int, name: str) -> None:
        df.write.mode("overwrite").parquet(self.table_path(rnd, name))

    def read_table(self, spark: SparkSession, rnd: int, name: str) -> DataFrame:
        return spark.read.parquet(self.table_path(rnd, name))

    def seen_paths(self, upto_round: int) -> list[str]:
        """The seen-set is the union of per-round deltas (append-only —
        each round writes O(new) rows, mirroring S8's incremental fetch)."""
        return [
            self.table_path(r, "seen_delta")
            for r in range(1, upto_round + 1)
            if os.path.exists(self.table_path(r, "seen_delta"))
        ]

    def read_seen(self, spark: SparkSession, upto_round: int) -> DataFrame | None:
        paths = self.seen_paths(upto_round)
        if not paths:
            return None
        return spark.read.parquet(*paths)

    def read_all(self, spark: SparkSession, name: str, upto_round: int) -> DataFrame | None:
        paths = [
            self.table_path(r, name)
            for r in range(1, upto_round + 1)
            if os.path.exists(self.table_path(r, name))
        ]
        if not paths:
            return None
        return spark.read.parquet(*paths)
