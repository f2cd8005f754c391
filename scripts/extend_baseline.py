"""Maintain BASELINE_BENCH.json / SHUFFLE_BASELINE.json anchors from
an idle BENCH_FULL artifact.

Two modes:

1. EXTEND (default): fold the artifact's timings into
   ``extended_queries`` for queries that have NO anchor yet. Existing
   anchors are never overwritten — the r01 baseline and earlier
   extended anchors stay the fixed reference points.

2. RE-ANCHOR (``--reanchor q1,q2 --reason "..."``): the audited
   replacement for the ad-hoc re-anchor paragraphs of rounds 5/6/9.
   Overwrites the named queries' anchors with the artifact's idle
   values and appends an audit record (old/new value, artifact meta,
   the stated reason) to BASELINE_BENCH.json["reanchors"], so every
   anchor movement is one command with a paper trail instead of a
   ROUND_NOTES explanation. Refuses load-tainted artifacts, refuses
   without --reason, and refuses to LOWER the bar silently: a
   re-anchor that would RAISE an anchor by >2x prints a loud warning
   (the new anchor hides future regressions up to that size).

Usage:
  python scripts/extend_baseline.py [--dry-run]
  python scripts/extend_baseline.py --reanchor qA,qB --reason "..." \
      [--from BENCH_FULL.json] [--dry-run]
"""

from __future__ import annotations

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _arg(flag: str) -> str | None:
    if flag in sys.argv:
        i = sys.argv.index(flag)
        if i + 1 < len(sys.argv):
            return sys.argv[i + 1]
    return None


def _load_artifact() -> dict:
    path = _arg("--from") or os.path.join(ROOT, "BENCH_FULL.json")
    full = json.load(open(path))
    if full["meta"].get("load_tainted"):
        print(f"refusing: {path} is load-tainted; rerun bench idle")
        sys.exit(1)
    return full


def reanchor(full: dict, names: list[str], reason: str) -> None:
    base_path = os.path.join(ROOT, "BASELINE_BENCH.json")
    base = json.load(open(base_path))
    records = []
    for n in names:
        if n not in full["queries"]:
            print(f"refusing: {n} not in the bench artifact")
            sys.exit(1)
        new_t = full["queries"][n]
        where = None
        for key in ("queries", "extended_queries"):
            if n in base.get(key, {}):
                where = key
                break
        if where is None:
            print(f"refusing: {n} has no anchor (use extend mode)")
            sys.exit(1)
        old_t = base[where][n]
        if old_t and new_t > 2 * old_t:
            print(f"WARNING: {n} anchor would rise {old_t} -> {new_t} "
                  f"(>{round(new_t / old_t, 1)}x) — future regressions "
                  "up to that size become invisible")
        records.append({
            "query": n, "old": old_t, "new": new_t, "where": where,
            "reason": reason,
            "artifact_meta": {
                k: full["meta"].get(k)
                for k in ("load1_start", "load1_end",
                          "median_run_spread_pct", "runs_per_query")
            },
        })
    print(json.dumps(records, indent=1))
    if "--dry-run" in sys.argv:
        return
    for r in records:
        base[r["where"]][r["query"]] = r["new"]
    base.setdefault("reanchors", []).extend(records)
    with open(base_path, "w") as f:
        json.dump(base, f, indent=1)
    print(f"re-anchored {len(records)} queries (audit trail in "
          "BASELINE_BENCH.json['reanchors'])")

    # move the shuffle-volume anchor WITH the wall anchor: a re-anchor
    # justified by a deliberate plan change should reset both axes
    sm = full.get("stage_metrics") or {}
    sb_path = os.path.join(ROOT, "SHUFFLE_BASELINE.json")
    if sm and os.path.exists(sb_path):
        sb = json.load(open(sb_path))
        moved = 0
        for r in records:
            n = r["query"]
            if n in sm and n in sb.get("queries", {}):
                sb["queries"][n] = sm[n]
                moved += 1
        if moved:
            with open(sb_path, "w") as f:
                json.dump(sb, f, indent=1)
            print(f"moved {moved} shuffle baselines alongside")


def extend(full: dict) -> None:
    base_path = os.path.join(ROOT, "BASELINE_BENCH.json")
    base = json.load(open(base_path))
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


def main():
    full = _load_artifact()
    names_arg = _arg("--reanchor")
    if names_arg:
        reason = _arg("--reason")
        if not reason:
            print("refusing: --reanchor requires --reason \"...\"")
            sys.exit(1)
        reanchor(full, [n.strip() for n in names_arg.split(",")], reason)
    else:
        extend(full)


if __name__ == "__main__":
    main()
