"""Iterative graph analytics over edge DataFrames.

Connected components live in operators/dedup.py (label propagation +
large-star/small-star); this module adds fixed-iteration PageRank in
exact integer fixed-point arithmetic, so a SQL oracle can replay the
identical computation (floats would drift across engines in the
accumulation order).

Scale shape: each iteration is ONE shuffle — contributions grouped by
destination — plus joins of the (nodes-sized) rank/degree relations
that AQE broadcast-plans when they fit. That is the standard
Pregel-on-DataFrames formulation; at 1000 executors you additionally
persist the rank relation between iterations (done here when
``materialize=True``) and co-partition edges by src so the
rank-to-edges join is exchange-free after the first iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def pagerank_integer(
    edges: DataFrame,
    iterations: int = 3,
    damping_ppm: int = 850_000,
    materialize: bool = False,
) -> DataFrame:
    """Fixed-iteration PageRank on a directed edge list
    (columns ``src``, ``dst``) in integer micro-rank units.

    Ranks start at 1_000_000 per node (average-1 convention); each
    iteration sets

        r_v  =  (PPM - damping_ppm)  +  Σ_{u→v} (r_u · damping_ppm)
                                         div (PPM · deg_u)

    with truncating integer division (identical in Spark ``div`` and
    DuckDB ``//`` — both truncate toward zero). Nodes are everything
    appearing as src or dst; sinks contribute nothing (their mass
    evaporates, the plain power-iteration-without-dangling-patch
    convention, replayed identically by the oracle).
    """
    base = PPM - damping_ppm
    nodes = (
        edges.select(F.col("src").alias("ent"))
        .unionAll(edges.select(F.col("dst").alias("ent")))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count("*").cast("long").alias("deg"))
    r = nodes.withColumn("r", F.lit(PPM).cast("long"))
    for _ in range(iterations):
        contrib = (
            edges.join(r, edges["src"] == r["ent"])
            .join(deg, "src")
            .select(
                "dst",
                F.expr(f"(r * {damping_ppm}) div ({PPM} * deg)").alias("c"),
            )
        )
        inflow = contrib.groupBy("dst").agg(
            F.sum("c").cast("long").alias("inflow")
        )
        r = (
            nodes.join(inflow, nodes["ent"] == inflow["dst"], "left")
            .select(
                "ent",
                (F.lit(base) + F.coalesce("inflow", F.lit(0)))
                .cast("long")
                .alias("r"),
            )
        )
        if materialize:
            r = r.localCheckpoint(eager=False)
    return (
        r.join(deg, r["ent"] == deg["src"], "left")
        .select(
            "ent",
            F.coalesce("deg", F.lit(0)).cast("long").alias("degree"),
            F.col("r").alias("pagerank_micro"),
        )
    )
