"""Round-13 one-time autopsy probe for the q_t_closeness wall drift
(VERDICT r12 watch-list): run the query best-of-5 at sf0.1 with the
status REST server on, and record per-stage duration / executor-run
/ task-count / shuffle bytes. The committed artifacts only carry
per-query VOLUME (byte-flat across the drift), so naming the slow
component needs the stage-level wall split this captures.

Usage: python scripts/tclose_stage_probe.py [out.json]
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from datetime import datetime

sys.path.insert(0, "/root/repo")

from document_parsing_etl_pipeline_spark.session import get_spark
from document_parsing_etl_pipeline_spark.plans.queries import QUERIES


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    spark = get_spark("tclose_probe",
                      extra_conf={"spark.ui.enabled": "true"})
    sc = spark.sparkContext
    url = (f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
           f"/stages?details=false")

    def stages():
        with urllib.request.urlopen(url, timeout=30) as r:
            return {s["stageId"]: s for s in json.load(r)}

    fn = QUERIES["q_t_closeness"]
    sf = "/root/testdata/sf0.1"
    for _ in range(2):  # warm codegen/parquet
        fn(spark, sf).write.mode("overwrite").format("noop").save()
    best = None
    walls = []
    for _ in range(5):
        pre = max(stages(), default=-1)
        t0 = time.time()
        fn(spark, sf).write.mode("overwrite").format("noop").save()
        w = time.time() - t0
        walls.append(round(w, 3))
        new = {sid: s for sid, s in stages().items() if sid > pre}
        if best is None or w < best[0]:
            best = (w, new)

    def dur(s):
        try:
            a = datetime.strptime(
                s["submissionTime"].replace("GMT", ""),
                "%Y-%m-%dT%H:%M:%S.%f")
            b = datetime.strptime(
                s["completionTime"].replace("GMT", ""),
                "%Y-%m-%dT%H:%M:%S.%f")
            return round((b - a).total_seconds(), 3)
        except Exception:
            return None

    rows = [
        {"stage": sid, "dur_sec": dur(s),
         "executor_run_ms": s.get("executorRunTime"),
         "tasks": s.get("numTasks"),
         "shuffle_read": s.get("shuffleReadBytes"),
         "shuffle_write": s.get("shuffleWriteBytes"),
         "name": (s.get("name") or "")[:80]}
        for sid, s in sorted(best[1].items())
    ]
    out = {
        "metric": "q_t_closeness_stage_autopsy",
        "load1": round(os.getloadavg()[0], 2),
        "walls": walls, "best_wall": round(best[0], 3),
        "n_stages": len(rows),
        "sum_stage_dur": round(sum(r["dur_sec"] or 0 for r in rows), 3),
        "sum_executor_ms": sum(r["executor_run_ms"] or 0 for r in rows),
        "stages": rows,
    }
    print(json.dumps({k: v for k, v in out.items() if k != "stages"}))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
