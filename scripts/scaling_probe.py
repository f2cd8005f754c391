"""Scaling-behavior probe: measure the heavy operator families at
sf0.001 / sf0.01 / sf0.1 / sf1-equivalent and report per-step scaling
factors against the 10x data factor.

The sf1-equivalent corpus is DERIVED (never written into
/root/testdata): documents replicated 10x with offset doc_ids and a
per-replica suffix token ("repK") appended to the text — the suffix
keeps replicas of one document NEAR-duplicates of each other (the
realistic structure) instead of exact duplicates, whose giant
equality classes would quadratically distort the pair joins; events
replicated 10x with offset user_ids/event_ids (10x users, same
per-user history length — the realistic growth axis).

Usage: python scripts/scaling_probe.py [out.json]
Writes one JSON dict {query: {sf: seconds}} plus derived factors.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from document_parsing_etl_pipeline_spark.plans.queries import QUERIES
from document_parsing_etl_pipeline_spark.session import get_spark

from pyspark.sql import functions as F

DOC_QUERIES = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "q_setsim_prefix_join",
    "q_span_dedup",
    "q_sparse_sim_topk",
    "dedup_components",
    "q_unigram_logprob",
    "tfidf_top_terms",
    # round-7 session-2 additions: the new heavy corpus families
    "q_shingle_novelty",      # shingle df rollup + join-back
    "q_kneser_ney_bigram",    # (doc,pos) bigram self-join + 3 rollups
    "q_naive_bayes_lang",     # token-keyed score join, vocab model
    "q_rake_keywords",        # islands windows + incidence joins
    # round-7 session-3 additions
    "q_lm_holdout_ppl",       # fold tokenize + test-vocab x train-vocab
    "q_token_coverage",       # vocab rank window + conditional agg
    "q_char_compression_est", # letters explode + |sources|x26 model
    "q_unseen_mass_estimate", # frequency-of-frequencies pass
    "q_rank_overlap_rbo",     # per-fold vocab + K x K depth join
    "q_ttr_by_length",        # tokenize + distinct per doc
    # round-7 sessions 4-6 additions
    "q_vocab_gini",           # freq-of-freq rank identity
    "q_nb_calibration",       # NB scores + softmax bins
    "q_dedup_recall_capture", # two detector pair sets + verify joins
    "q_cluster_purity",       # component map x source rollup
    "q_source_surprisal_drift",  # doc surprisal + source moments
]
EVENT_QUERIES = [
    "q_events_sessionize",
    "q_session_window_native",
    "q_events_percentiles",
    "q_cdc_latest_state",
    "q_dau_wau_stickiness",
    "q_event_pattern_match",
    # round-7 session-2 additions
    "q_sessionized_bounce",   # session rollup on the user partitioning
    "q_user_type_entropy",    # user-keyed cells + entropy rollup
    # round-7 session-3 additions
    "q_entropy_rate",         # user-keyed lag window + matrix rollup
    "q_markov_backtest",      # fold transition rollups
    "q_kendall_tau",          # calendar-bounded pair join
    "q_crosscorr_daily",      # type-pair x lag join on daily frame
    "q_tier_migration",       # per-user-half counts + full outer
    "q_gains_curve",          # band histogram + desc cumulative
    # round-7 sessions 4-6 additions
    "q_markov_order_test",    # user-keyed lag-2 window + types^3 grid
    "q_linear_attribution",   # user-keyed touch join, 7d horizon
    "q_cuped_adjustment",     # per-user conditional agg + moment sums
    "q_bh_fdr",               # distinct (user,type) + arm join
]


def build_sf1eq(spark, base_sf: str, out_dir: str, n_reps: int = 10) -> None:
    os.makedirs(out_dir, exist_ok=True)
    docs = spark.read.parquet(os.path.join(base_sf, "documents.parquet"))
    # offset by max(doc_id)+1, not count(): non-dense ids would make
    # count-based offsets collide across replicas, creating the giant
    # exact-equality classes this derivation exists to avoid (the
    # events branch below already used max+1)
    n_docs = 1 + (docs.agg(F.max("doc_id")).first()[0] or 0)
    reps = docs.crossJoin(
        spark.range(n_reps).withColumnRenamed("id", "rep")
    ).select(
        (F.col("doc_id") + F.col("rep") * n_docs).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit(" rep"), F.col("rep").cast("string")
        ).alias("text"),
        "lang", "source", "n_chars",
    )
    reps.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    ev = spark.read.parquet(os.path.join(base_sf, "events.parquet"))
    n_users = 1 + (ev.agg(F.max("user_id")).first()[0] or 0)
    n_events = 1 + (ev.agg(F.max("event_id")).first()[0] or 0)
    reps_ev = ev.crossJoin(
        spark.range(n_reps).withColumnRenamed("id", "rep")
    ).select(
        (F.col("event_id") + F.col("rep") * n_events).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("rep") * n_users).alias("user_id"),
        "event_type", "value", "props",
    )
    reps_ev.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )
    # the remaining tables are only touched by the probe queries via
    # the catalog loader's existence checks — link them through
    import shutil

    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "embeddings"):
        src = os.path.join(base_sf, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copyfile(src, dst)


def build_sf1eq_full(
    spark, base_sf: str, out_dir: str, n_reps: int = 10,
) -> None:
    """sf1-equivalent corpus scaling EVERY table (the whole-registry
    bench needs the TPC-H families to grow too, not just docs/events):
    documents/events as build_sf1eq; customer/supplier/part/orders/
    lineitem replicated with consistent key offsets so every foreign
    key still joins (replica k of an order references replica k of
    its customer — the realistic growth, more entities with the same
    per-entity history); embeddings replicated with a deterministic
    per-replica, per-dimension perturbation so replicas are NEAR
    neighbors, not exact duplicates whose equality classes would
    distort the pair joins. region/nation stay fixed (dimensions
    don't grow with fact volume)."""
    os.makedirs(out_dir, exist_ok=True)
    build_sf1eq(spark, base_sf, out_dir, n_reps=n_reps)

    def _mx(df, col):
        return 1 + (df.agg(F.max(col)).first()[0] or 0)

    cust = spark.read.parquet(os.path.join(base_sf, "customer.parquet"))
    supp = spark.read.parquet(os.path.join(base_sf, "supplier.parquet"))
    part = spark.read.parquet(os.path.join(base_sf, "part.parquet"))
    orders = spark.read.parquet(os.path.join(base_sf, "orders.parquet"))
    li = spark.read.parquet(os.path.join(base_sf, "lineitem.parquet"))
    n_cust, n_supp = _mx(cust, "c_custkey"), _mx(supp, "s_suppkey")
    n_part, n_ord = _mx(part, "p_partkey"), _mx(orders, "o_orderkey")
    rep = spark.range(n_reps).withColumnRenamed("id", "rep")

    def _w(df, name, parts=32):
        df.repartition(parts).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet"))

    _w(cust.crossJoin(rep).select(
        (F.col("c_custkey") + F.col("rep") * n_cust).alias("c_custkey"),
        "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"), "customer")
    _w(supp.crossJoin(rep).select(
        (F.col("s_suppkey") + F.col("rep") * n_supp).alias("s_suppkey"),
        "s_name", "s_nationkey", "s_acctbal"), "supplier")
    _w(part.crossJoin(rep).select(
        (F.col("p_partkey") + F.col("rep") * n_part).alias("p_partkey"),
        "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
        "part")
    _w(orders.crossJoin(rep).select(
        (F.col("o_orderkey") + F.col("rep") * n_ord).alias("o_orderkey"),
        (F.col("o_custkey") + F.col("rep") * n_cust).alias("o_custkey"),
        "o_orderstatus", "o_totalprice", "o_orderdate",
        "o_orderpriority"), "orders")
    _w(li.crossJoin(rep).select(
        (F.col("l_orderkey") + F.col("rep") * n_ord).alias("l_orderkey"),
        (F.col("l_partkey") + F.col("rep") * n_part).alias("l_partkey"),
        (F.col("l_suppkey") + F.col("rep") * n_supp).alias("l_suppkey"),
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
        "lineitem", parts=64)
    emb = spark.read.parquet(os.path.join(base_sf, "embeddings.parquet"))
    n_vec = _mx(emb, "vec_id")
    _w(emb.crossJoin(rep).select(
        (F.col("vec_id") + F.col("rep") * n_vec).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> CAST(x +"
            " (pmod(rep * (i + 3), 7) - 3) * 0.05 * rep / 10.0"
            " AS FLOAT))"
        ).alias("embedding"),
        "label"), "embeddings")


def build_sf10eq(spark, base_sf: str, out_dir: str) -> None:
    """100× documents with CONSTANT dup-group size: 100 replicas per
    base doc as 10 salted groups of 10. Group salt = ceil(0.5·n_tok)
    distinct md5-derived tokens appended to the text, so within-group
    pairs stay near-dups (~(n)/(n+3) Jaccard) while cross-group pairs
    of the same base doc land at ~1/(1+2·0.5) = 0.5 < the 0.6
    threshold — the dup RATE stays that of sf1eq while the corpus
    grows another 10×."""
    os.makedirs(out_dir, exist_ok=True)
    docs = spark.read.parquet(os.path.join(base_sf, "documents.parquet"))
    n_docs = 1 + (docs.agg(F.max("doc_id")).first()[0] or 0)
    reps = (
        docs.crossJoin(spark.range(100).withColumnRenamed("id", "rep"))
        .select(
            (F.col("doc_id") + F.col("rep") * n_docs).alias("doc_id"),
            F.col("doc_id").alias("base_id"),
            (F.col("rep") / 10).cast("long").alias("grp"),
            (F.col("rep") % 10).alias("mem"),
            "text", "lang", "source", "n_chars",
        )
        .select(
            "doc_id",
            F.concat(
                F.col("text"),
                F.lit(" "),
                F.concat_ws(" ", F.expr(
                    "transform(sequence(1, int(greatest(1,"
                    " size(split(text, ' ')) / 2))),"
                    " i -> substr(md5(concat(base_id, '#', grp, '#', i)),"
                    " 1, 10))"
                )),
                F.lit(" rep"), F.col("mem").cast("string"),
            ).alias("text"),
            "lang", "source", "n_chars",
        )
    )
    reps.repartition(64).write.mode("overwrite").parquet(
        os.path.join(out_dir, "documents.parquet")
    )
    import shutil

    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        src = os.path.join(base_sf, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copyfile(src, dst)


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALING.json"
    spark = get_spark("scaling")
    load1_start = round(os.getloadavg()[0], 2)  # BEFORE any work
    sf1eq = "/tmp/sf1eq"
    t0 = time.time()
    build_sf1eq(spark, "/root/testdata/sf0.1", sf1eq)
    build_sec = round(time.time() - t0, 1)

    dirs = [
        ("0.001", "/root/testdata/sf0.001"),
        ("0.01", "/root/testdata/sf0.01"),
        ("0.1", "/root/testdata/sf0.1"),
        ("1eq", sf1eq),
    ]
    results: dict[str, dict[str, float]] = {}
    for name in DOC_QUERIES + EVENT_QUERIES:
        results[name] = {}
        for label, d in dirs:
            best = None
            try:
                for _ in range(2):
                    t0 = time.time()
                    QUERIES[name](spark, d).write.mode(
                        "overwrite").format("noop").save()
                    dt = time.time() - t0
                    best = dt if best is None or dt < best else best
            except Exception as e:  # record, keep probing
                results[name][label] = f"error: {type(e).__name__}"
                print(f"{name} sf{label}: ERROR {e}"[:300], flush=True)
                continue
            results[name][label] = round(best, 3)
            print(f"{name} sf{label}: {best:.2f}s", flush=True)
    # ---- second derived decade (round 7): 100× documents for the
    # super-linear families SCALING.md flags (setsim output-driven,
    # token-explode) plus the cap-policy readouts. Events queries are
    # not flagged, so the sf10-equivalent corpus only needs the doc
    # axis rebuilt; the pair-count evidence shows the setsim curve
    # keeps tracking its OUTPUT, not an input blowup.
    #
    # Crucially the 100× corpus keeps the REALISTIC near-dup
    # structure: dup-GROUP size stays ~10 (as in sf1eq) while the
    # number of groups grows 10× — 100 replicas per base doc split
    # into 10 groups of 10, each group salted with its own ~0.5·n
    # distinct filler shingles so cross-group Jaccard lands ~0.5,
    # under the 0.6 threshold (naive 100-wide groups would grow the
    # TRUE pair set quadratically in the replica count — a corpus
    # whose every document has 99 near-copies is not a bigger corpus,
    # it is a different, pathological one).
    decade2: dict[str, dict] = {}
    if os.environ.get("SPARK_GRAFT_SCALING_DECADE2", "1") != "0":
        # recycle the session before the 100x leg: the 1eq phase's
        # memoized localCheckpoint pair relations (q_cluster_purity /
        # q_dedup_recall_capture consumers) pin block-manager heap the
        # sf10eq setsim pass needs — observed as a Java-heap OOM when
        # both phases share one context
        from document_parsing_etl_pipeline_spark.plans import (
            queries as _qmod,
        )

        _qmod._NEARDUP_MEMO.clear()
        spark.stop()
        spark = get_spark("scaling-decade2")
        sf10eq = "/tmp/sf10eq"
        t0 = time.time()
        build_sf10eq(spark, "/root/testdata/sf0.1", sf10eq)
        build10_sec = round(time.time() - t0, 1)
        d2_queries = [
            "q_setsim_prefix_join",   # ~10× flagged: output-driven?
            "q_unigram_logprob",      # ~4× flagged: token explode
            "tfidf_top_terms",        # Zipf-bounded vocab claim
            "dedup_minhash_lsh",      # cap policy under 100×
            "dedup_simhash",
            "q_lsh_bucket_stats",     # cap-policy readout
            "q_dedup_threshold_curve",  # policy knee at scale
        ]
        for name in d2_queries:
            t0 = time.time()
            try:
                QUERIES[name](spark, sf10eq).write.mode(
                    "overwrite").format("noop").save()
            except Exception as e:
                decade2[name] = {"10eq": f"error: {type(e).__name__}"}
                print(f"{name} sf10eq: ERROR {e}"[:300], flush=True)
                continue
            dt = round(time.time() - t0, 3)
            decade2[name] = {"10eq": dt}
            print(f"{name} sf10eq: {dt:.2f}s", flush=True)
        # output-driven evidence: the true pair count at each scale
        decade2["_setsim_output_rows"] = {
            lbl: QUERIES["q_setsim_prefix_join"](spark, d).count()
            for lbl, d in [("0.1", "/root/testdata/sf0.1"),
                           ("1eq", sf1eq), ("10eq", sf10eq)]
        }
        decade2["_build_sf10eq_sec"] = build10_sec

    out = {
        "build_sf1eq_sec": build_sec,
        "load1_start": load1_start,
        "load1_end": round(os.getloadavg()[0], 2),
        "results": results,
        "factors_01_to_1eq": {
            n: round(r["1eq"] / r["0.1"], 2)
            for n, r in results.items()
            if isinstance(r.get("0.1"), float) and r.get("0.1", 0) > 0
            and isinstance(r.get("1eq"), float)
        },
        "decade2": decade2,
        "factors_1eq_to_10eq": {
            n: round(d["10eq"] / results[n]["1eq"], 2)
            for n, d in decade2.items()
            if isinstance(d, dict)
            and isinstance(d.get("10eq"), float)
            and isinstance(results.get(n, {}).get("1eq"), float)
            and results[n]["1eq"] > 0
        },
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["factors_01_to_1eq"], indent=1))
    print(json.dumps(out["factors_1eq_to_10eq"], indent=1))


if __name__ == "__main__":
    main()
