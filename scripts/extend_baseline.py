"""Fold the current BENCH_FULL.json timings into BASELINE_BENCH.json's
``extended_queries`` anchors for queries that have no anchor yet, so
the >1.5x wall-time regression guard covers the whole registry.

Existing anchors are NEVER overwritten — the r01 baseline and earlier
extended anchors stay the fixed reference points; only anchor-less
queries gain one (from an idle full run, which the caller is
responsible for providing).

Usage: python scripts/extend_baseline.py [--dry-run]
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    full = json.load(open(os.path.join(ROOT, "BENCH_FULL.json")))
    base_path = os.path.join(ROOT, "BASELINE_BENCH.json")
    base = json.load(open(base_path))
    if full["meta"].get("load_tainted"):
        print("refusing: BENCH_FULL is load-tainted; rerun bench idle")
        sys.exit(1)
    anchored = set(base.get("queries", {})) | set(
        base.get("extended_queries", {})
    )
    new = {
        n: t for n, t in full["queries"].items() if n not in anchored
    }
    print(f"{len(new)} new anchors: {sorted(new)}")
    if "--dry-run" in sys.argv:
        return
    base.setdefault("extended_queries", {}).update(new)
    with open(base_path, "w") as f:
        json.dump(base, f, indent=1)
    print(f"BASELINE_BENCH.json now anchors "
          f"{len(base['queries']) + len(base['extended_queries'])} queries")

    # same never-overwrite policy for the shuffle-volume guard: only
    # anchor-less queries gain a stage-metrics baseline
    sm = full.get("stage_metrics") or {}
    sb_path = os.path.join(ROOT, "SHUFFLE_BASELINE.json")
    if sm and os.path.exists(sb_path):
        sb = json.load(open(sb_path))
        new_sm = {n: m for n, m in sm.items()
                  if n not in sb.get("queries", {})}
        print(f"{len(new_sm)} new shuffle baselines: {sorted(new_sm)}")
        if new_sm:
            sb.setdefault("queries", {}).update(new_sm)
            with open(sb_path, "w") as f:
                json.dump(sb, f, indent=1)


if __name__ == "__main__":
    main()
