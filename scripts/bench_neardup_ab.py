"""ABAB microbench for the streaming near-dup ingest: alternate the
BASELINE implementation (A — extracted from git at runtime; default =
the round-12 final commit) with the
current one (B) on identical data — the interleaving controls box
drift, so the B/A ratio is implementation, not environment. Mirrors
bench.py's stream_neardup leg (shuffled-id JSON drop files, mft16
triggers) at sf0.1 and, when present, the 10x derived corpus
(/tmp/sf1eq_full — build via scripts/bench_sf1.py / scaling_probe).

Usage: python scripts/bench_neardup_ab.py [out.json] [base_commit]
"""

from __future__ import annotations

import importlib.util
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from document_parsing_etl_pipeline_spark.catalog import load_table
from document_parsing_etl_pipeline_spark.session import get_spark


def _load_base(commit: str):
    src = subprocess.run(
        ["git", "-C", REPO, "show",
         f"{commit}:document_parsing_etl_pipeline_spark/streaming/"
         "neardup.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    path = os.path.join(tempfile.gettempdir(), f"neardup_{commit}.py")
    with open(path, "w") as f:
        f.write(src)
    spec = importlib.util.spec_from_file_location(
        "document_parsing_etl_pipeline_spark.streaming.neardup_base",
        path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else None
    commit = sys.argv[2] if len(sys.argv) > 2 else "f180918"
    from document_parsing_etl_pipeline_spark.streaming import (
        neardup as nd_new,
    )

    nd_old = _load_base(commit)
    spark = get_spark("bench_neardup_ab")
    results = {"base_commit": commit,
               "load1_start": round(os.getloadavg()[0], 2),
               "legs": {}}
    tmp = tempfile.mkdtemp(prefix="nd_ab_")
    try:
        corpora = [("/root/testdata/sf0.1", "sf0.1")]
        if os.path.isdir("/tmp/sf1eq_full"):
            corpora.append(("/tmp/sf1eq_full", "sf1eq"))
        for sf, label in corpora:
            docs = load_table(spark, sf, "documents").select(
                "doc_id", "text", "lang", "source", "n_chars")
            n = docs.count()
            doc_dir = os.path.join(tmp, f"d_{label}")
            docs.repartition(48).write.mode("overwrite").json(doc_dir)

            def trial(mod, tag):
                idx = os.path.join(tmp, f"idx_{label}_{tag}")
                mod.create_index(spark, idx)
                st = (
                    spark.readStream.format("json")
                    .schema("doc_id long, text string, lang string,"
                            " source string, n_chars long")
                    .option("maxFilesPerTrigger", "16")
                    .load(doc_dir).select("doc_id", "text")
                )
                q = mod.stream_neardup_ingest(
                    spark, st, idx,
                    os.path.join(tmp, f"fl_{label}_{tag}"),
                    os.path.join(tmp, f"cp_{label}_{tag}"))
                t0 = time.time()
                q.awaitTermination()
                w = time.time() - t0
                shutil.rmtree(idx, ignore_errors=True)
                return round(w, 2), round(n / w)

            trial(nd_new, "warm")  # uncounted
            trials = []
            for i, (name, mod) in enumerate(
                [("A_base", nd_old), ("B_new", nd_new)] * 3
            ):
                w, r = trial(mod, f"{name}_{i}")
                trials.append(
                    {"variant": name, "wall_sec": w, "rows_per_sec": r})
            a = max(t["rows_per_sec"] for t in trials
                    if t["variant"] == "A_base")
            b = max(t["rows_per_sec"] for t in trials
                    if t["variant"] == "B_new")
            results["legs"][label] = {
                "n_docs": n, "trials": trials,
                "a_best_rows_per_sec": a, "b_best_rows_per_sec": b,
                "b_over_a": round(b / a, 3),
            }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    results["load1_end"] = round(os.getloadavg()[0], 2)
    line = json.dumps(results)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
