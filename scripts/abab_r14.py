"""Interleaved ABAB isolated timing for round-14 touched queries.

Usage: python scripts/abab_r14.py <base_tree> <query> [query ...]

Alternates fresh-process probe runs between the BASE tree (a git
worktree pinned at the round-start commit) and THIS repo (NEW), in
A B A B order per query batch, so box drift lands on both sides.
Each probe is scripts/probe_queries.py semantics (noop sink, warm
pass at sf0.001, best-of-3 at $SPARK_GRAFT_SF_DIR). Prints one JSON
line per query: {"name", "old": best, "new": best, "ratio"} and a
summary.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

NEW = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROBE = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
from document_parsing_etl_pipeline_spark.plans.queries import QUERIES
from document_parsing_etl_pipeline_spark.session import get_spark
spark = get_spark("abab")
sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
out = {}
for name in sys.argv[2:]:
    fn = QUERIES[name]
    fn(spark, "/root/testdata/sf0.001").write.mode("overwrite").format(
        "noop").save()
    durs = []
    for _ in range(3):
        t0 = time.time()
        fn(spark, sf).write.mode("overwrite").format("noop").save()
        durs.append(round(time.time() - t0, 3))
    out[name] = durs
print("ABABRESULT " + json.dumps(out))
"""


def run_tree(tree: str, names: list[str]) -> dict[str, list[float]]:
    p = subprocess.run(
        [sys.executable, "-c", PROBE, tree, *names],
        capture_output=True, text=True, timeout=1800,
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABABRESULT "):
            return json.loads(line[len("ABABRESULT "):])
    raise RuntimeError(
        f"probe failed for {tree}: {p.stdout[-500:]} {p.stderr[-500:]}")


def main() -> None:
    base = sys.argv[1]
    names = sys.argv[2:]
    runs = {"old": [], "new": []}
    for tag, tree in (("old", base), ("new", NEW),
                      ("old", base), ("new", NEW)):
        runs[tag].append(run_tree(tree, names))
        print(f"leg {tag} done", file=sys.stderr, flush=True)
    report = {}
    for n in names:
        old = min(min(r[n]) for r in runs["old"])
        new = min(min(r[n]) for r in runs["new"])
        report[n] = {
            "old": old, "new": new,
            "ratio_new_over_old": round(new / old, 3) if old else None,
            "old_runs": [r[n] for r in runs["old"]],
            "new_runs": [r[n] for r in runs["new"]],
        }
        print(json.dumps({"name": n, "old": old, "new": new,
                          "ratio": report[n]["ratio_new_over_old"]}))
    tot_old = sum(v["old"] for v in report.values())
    tot_new = sum(v["new"] for v in report.values())
    print(json.dumps({"total_old": round(tot_old, 2),
                      "total_new": round(tot_new, 2),
                      "ratio": round(tot_new / tot_old, 3)}))
    out = os.environ.get("ABAB_OUT")
    if out:
        with open(out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
