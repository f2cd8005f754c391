"""Regenerate PLANS.md: formatted explains of headline queries."""

import sys

sys.path.insert(0, "/root/repo")

from document_parsing_etl_pipeline_spark.plans.queries import QUERIES
from document_parsing_etl_pipeline_spark.session import get_spark

PICKS = {
    "q1_pricing_summary": "filter pushdown + column pruning + single decimal agg",
    "q3_shipping_priority": "broadcast dim join, shuffle only on l_orderkey",
    "q5_local_supplier": "all dims broadcast; one fact shuffle",
    "dedup_minhash_lsh": "explode->codegen md5->partial min; bucket cap before pairing",
    "knn_all_topk": "block matmul mapInPandas + global top-k window",
    "q_documents_list": "doc_id range pushed through explode+agg to both scans",
    "q8_market_share": "p_type filter pushed to part scan; hints only on nation dims, AQE on the rest",
    "q17_small_quantity_revenue": "correlated avg as exact sum+count join; inequality pushed into join condition",
    "knn_brute_cosine": "Arrow-batched cosine kernel (ArrowEvalPython), broadcast query side",
    "q21_sole_blame_suppliers": "EXISTS/NOT-EXISTS de-correlated to one agg pass; no Expand, nation-only hint",
    "knn_ivf_probe": "one n×C centroid scoring pass feeds assignment AND probe lists; candidate join shuffles on posting-list id",
    "q_countmin_heavy_hitters": "sketch builds over the per-key pre-agg; d×w counter table broadcast to the top-k probes",
    "q_bloom_join_audit": "DISTINCT set-bits table broadcast to probes; probe side aggregates k rows/key, never shuffles raw",
    "q_sequence_pack": "MapInPandas recurrence over repartition(doc_id)+sort (one Arrow call per partition)",
    "q_embedding_covariance": "pair fan-out parallelized by pinned repartition; decimal partial agg per core",
    "q_unigram_logprob": "tf pre-agg shrinks the vocab join; 1-row total as broadcast NLJ",
    "q_range_join_events": "bucketed interval join: bucket equi-key + range residual, no nested loop",
    "q_cdc_latest_state": "struct-max partial agg: ~one row per key shuffled, no window sort",
    "q_dsir_weights": "single-pass dual bucket models; 256-row broadcast ratio dim; one (doc,bucket) shuffle",
    "q_semdedup": "broadcast centroid assign; pair join shuffles once on centroid_id, quadratic stays in-cluster",
    "q_setsim_prefix_join": "prefix-only shingle join + positional-filter agg; verification joins the |docs|-sized array relation, not re-exploded shingles",
    "q_triangle_count": "localCheckpointed edge/oriented lists; wedge join + closure as equi-joins, no nested loop",
    "q_zorder_layout": "one fact scan -> z-interleave projection -> two layout aggs; bounds and box as 1-row broadcasts",
    "q_grouping_sets_profile": "pre-agg to base cells BEFORE Expand: the 4-set rollup expands 9 rows, not the fact table",
    "q_uniform_sample_exact": "TakeOrderedAndProject: per-partition top-k heaps, no global sort or range exchange",
    "q_weighted_sample": "Efraimidis-Spirakis keys in codegen; exact top-k as TakeOrderedAndProject, rank window over the k-row result",
    "q_zorder3_layout": "one fact scan -> 24-bit interleave projection -> three layout aggs; bounds/box as 1-row broadcasts",
    "q_incremental_components": "batch-prefix x standing-index posting join (never corpus x corpus, no per-run re-shingling); contraction joins against the checkpointed standing map",
    "dedup_simhash": "byte-band bucket join with count+join cap; smallest-shared-band predicate replaces the pair-set distinct() shuffle",
    "q_spearman_rank_corr": "rank = value-partitioned row_number + value-domain running offset; no corpus-sized global sort",
    "q_event_pattern_match": "one groupBy(user) collect -> codegen regexp counts; no window, no join",
}


def main():
    spark = get_spark("plans")
    sf = "/root/testdata/sf0.1"
    out = ["# PLANS — formatted explains of headline queries (sf0.1)",
           "",
           "Regenerate: `python scripts/dump_plans.py`. What to look for is",
           "noted per query; see SURVEY §4 for the full shuffle inventory.",
           ""]
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    for name, note in PICKS.items():
        df = QUERIES[name](spark, sf)
        plan = df._jdf.queryExecution().explainString(mode)
        out.append(f"## {name}\n\n*{note}*\n\n```\n{plan.strip()}\n```\n")
    open("/root/repo/PLANS.md", "w").write("\n".join(out))


if __name__ == "__main__":
    main()
