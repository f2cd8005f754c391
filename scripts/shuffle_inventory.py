"""SURVEY §4 cross-check: CLAIMED shuffle counts per operator family
vs the plan's actual Exchange operators and the bench's measured
shuffle bytes.

For each family's representative queries this prints:
- n_exchange: `Exchange` nodes in the physical plan (a reused
  exchange counts once; AQE may collapse some at runtime, so this is
  the upper bound the planner commits to);
- shuffle_write_bytes / read from BENCH_FULL.json's stage metrics
  (the measured volume of the last warm bench run at sf0.1).

Usage: python scripts/shuffle_inventory.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from document_parsing_etl_pipeline_spark.plans.queries import QUERIES
from document_parsing_etl_pipeline_spark.session import get_spark

# family -> (claimed shuffles from the SURVEY §4 table, representatives)
FAMILIES = {
    "parse/chunk/NER/text": (0, ["doc_chunk", "ner_entities", "lang_id"]),
    "hash signatures": (1, ["fingerprint", "dedup_exact"]),
    "LSH pairing": (1, ["dedup_minhash_lsh"]),
    "analytics joins": (2, ["q3_shipping_priority", "q5_local_supplier"]),
    "as-of join": (1, ["q_asof_enrich"]),
    "doc-store queries": (1, ["q_chunk_range", "q_documents_list"]),
    "exact set-similarity": (3, ["q_setsim_prefix_join"]),
}


def n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    # ReusedExchange re-reads an existing shuffle — not a new one
    return len(re.findall(r"^(?:[^\n]*?)Exchange ", plan, re.M)) - len(
        re.findall(r"ReusedExchange", plan)
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("shuffle-inventory")
    bench = {}
    try:
        bench = json.load(
            open(os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "BENCH_FULL.json"))
        ).get("stage_metrics", {})
    except OSError:
        pass
    rows = []
    for fam, (claimed, reps) in FAMILIES.items():
        for q in reps:
            df = QUERIES[q](spark, sf_dir)
            nx = n_exchanges(df)
            m = bench.get(q, {})
            rows.append((fam, q, claimed, nx,
                         m.get("shuffle_write_bytes"),
                         m.get("spill_disk_bytes")))
    w = max(len(r[1]) for r in rows)
    print(f"{'family':24} {'query':{w}} claimed planned "
          "write_bytes spill")
    ok = True
    for fam, q, claimed, nx, wb, sp in rows:
        flag = ""
        # planned Exchanges may exceed the per-family claim by the
        # small-dim broadcast-prep / AQE bookkeeping exchanges; flag
        # only when the plan has MORE THAN DOUBLE the claimed count
        # (+1 slack for the final agg/topk exchange)
        if nx > 2 * claimed + 1:
            flag = "  <-- over claim"
            ok = False
        print(f"{fam:24} {q:{w}} {claimed:7} {nx:7} "
              f"{str(wb):>11} {str(sp):>5}{flag}")
    print("PASS" if ok else "MISMATCH")


if __name__ == "__main__":
    main()
