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


def exchange_profile(df) -> tuple[int, int, int]:
    """(shuffle_exchanges, distinct_shuffle_keys, broadcast_exchanges)
    in the physical plan. A two-sided shuffle join plans one Exchange
    PER SIDE and a broadcast dim plans a BroadcastExchange, so the
    node counts sit above the §4 table's per-family 'shuffle rounds
    of the scaling relation'; distinct partitioning keys is the
    number that maps to the logical claim."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    shuffles = re.findall(
        r"\bExchange (hashpartitioning\([^)]*\)|rangepartitioning\([^\]]*\]"
        r"|SinglePartition)", plan,
    )
    # strip expr ids (#123) so a=al#5 and a=al#9 count as one key
    keys = {re.sub(r"#\d+L?", "", s) for s in shuffles}
    n_bcast = len(re.findall(r"\bBroadcastExchange\b", plan))
    return len(shuffles), len(keys), n_bcast


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
            nx, nkeys, nb = exchange_profile(df)
            m = bench.get(q, {})
            rows.append((fam, q, claimed, nx, nkeys, nb,
                         m.get("shuffle_write_bytes"),
                         m.get("spill_disk_bytes")))
    w = max(len(r[1]) for r in rows)
    print(f"{'family':24} {'query':{w}} claimed exch keys bcast "
          "write_bytes spill")
    for fam, q, claimed, nx, nkeys, nb, wb, sp in rows:
        print(f"{fam:24} {q:{w}} {claimed:7} {nx:4} {nkeys:4} {nb:5} "
              f"{str(wb):>11} {str(sp):>5}")


if __name__ == "__main__":
    main()
