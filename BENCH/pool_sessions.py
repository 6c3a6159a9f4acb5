#!/usr/bin/env python
"""Pool the per-session scaling payloads (BENCH/scaling_session*.json)
into the cross-session median table that backs the "Cross-run
robustness" section of BENCH/BASELINE.md.

The per-session headline (median of same-throttle-state pairs) is the
protocol's primary estimator; in epochs where the host throttle flips
WITHIN runs no pair is clean, and the defensible fallback is the
distribution over many interleaved pairs across sessions — drift hits N
and 4N symmetrically, so the pooled median converges on the engine's
true scaling. This script only aggregates already-archived payloads; it
never re-runs anything.
"""

from __future__ import annotations

import glob
import json
import os
import statistics

HERE = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    sessions = {}
    for path in sorted(glob.glob(os.path.join(HERE, "scaling_session*.json"))):
        name = os.path.basename(path)[len("scaling_session"):-len(".json")]
        sessions[name] = json.load(open(path))
    out = {}
    for sec in ("stage_executors", "crawl_executors", "stage_threads"):
        pooled, per_session, clean = [], {}, []
        for name, p in sessions.items():
            effs = (p.get(sec) or {}).get("all_effs") or []
            per_session[name] = effs
            pooled.extend(effs)
            clean.extend((p.get(sec) or {}).get("clean_effs") or [])
        out[sec] = {
            "per_session": per_session,
            "pooled_effs": pooled,
            "pooled_median": round(statistics.median(pooled), 3) if pooled else None,
            "n_pairs": len(pooled),
            "min": min(pooled) if pooled else None,
            "clean_effs_all_sessions": clean,
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
