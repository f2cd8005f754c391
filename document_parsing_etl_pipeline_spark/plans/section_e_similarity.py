"""SURVEY §2.E — similarity search: the @register query
definitions for this section (split out of the former monolithic
plans/queries.py in round 11; shared helpers live in
plans/_prelude.py, re-exported through plans/queries.py).
Importing this module registers the queries into the shared
QUERIES/ORACLES dicts."""

from __future__ import annotations

from ._prelude import *  # noqa: F401,F403



@register("knn_brute_cosine", f"""
WITH scored AS (
    SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
           round({_COS_SQL}, 4) AS cosine
    FROM embeddings q, embeddings e
    WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id
), ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, vec_id) AS rank
    FROM scored
)
SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= 5
""")
def q_knn_brute(spark, sf_dir):
    df = similarity.knn_brute_cosine(
        load_table(spark, sf_dir, "embeddings"), num_queries=5, k=5
    )
    return _long(df, "rank")


@register("knn_ivf_bucketed", f"""
WITH bucketed AS (
    SELECT vec_id, embedding,
           (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
            + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
            + CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END
            + CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS bucket
    FROM embeddings
), scored AS (
    SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
           round({_COS_SQL}, 4) AS cosine
    FROM bucketed q JOIN bucketed e ON q.bucket = e.bucket
    WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id
), ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, vec_id) AS rank
    FROM scored
)
SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= 5
""")
def q_knn_ivf(spark, sf_dir):
    df = similarity.knn_ivf_bucketed(
        load_table(spark, sf_dir, "embeddings"), num_queries=5, k=5
    )
    return _long(df, "rank")


@register("knn_ivf_probe", f"""
WITH {_IVF_CTES}
SELECT query_id, vec_id, cosine, rank FROM ap_probe
""")
def q_knn_ivf_probe(spark, sf_dir):
    """True IVF ANN (FAISS IVFFlat shape): nearest-centroid posting
    lists + per-query nprobe list scan — the measured-recall scale
    path for similarity search (92-100% recall at a 1/4 scan fraction
    vs 16-20% for sign buckets; see q_ivf_recall_audit).
    operators/similarity.py:knn_ivf_probe."""
    df = similarity.knn_ivf_probe(
        load_table(spark, sf_dir, "embeddings"),
        num_queries=5, k=5, num_centroids=_IVF_C, nprobe=_IVF_NPROBE,
    )
    return _long(df, "rank")


@register("q_ivf_recall_audit", f"""
WITH {_IVF_CTES}, bucketed AS (
    SELECT vec_id, embedding,
           (CASE WHEN embedding[1] >= 0 THEN 1 ELSE 0 END
            + CASE WHEN embedding[2] >= 0 THEN 2 ELSE 0 END
            + CASE WHEN embedding[3] >= 0 THEN 4 ELSE 0 END
            + CASE WHEN embedding[4] >= 0 THEN 8 ELSE 0 END) AS bucket
    FROM embeddings
), ap_sign AS (
    SELECT query_id, vec_id FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY round({_COS_SQL}, 4) DESC,
                                           e.vec_id) AS rank
        FROM bucketed q JOIN bucketed e ON q.bucket = e.bucket
        WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id
    ) WHERE rank <= 5
), ex AS (
    SELECT query_id, vec_id FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY round({_COS_SQL}, 4) DESC,
                                           e.vec_id) AS rank
        FROM embeddings q, embeddings e
        WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id
    ) WHERE rank <= 5
)
SELECT 'ivf_probe' AS method,
       CAST(count(*) AS BIGINT) AS n_exact,
       CAST(count(a.vec_id) AS BIGINT) AS n_hits,
       CAST(count(a.vec_id) * 1000 // count(*) AS BIGINT)
           AS recall_permille,
       CAST({_IVF_PROBE_FLOOR} AS BIGINT) AS floor_permille,
       TRUE AS meets_floor
FROM ex LEFT JOIN ap_probe a USING (query_id, vec_id)
UNION ALL
SELECT 'ivf_sign',
       CAST(count(*) AS BIGINT),
       CAST(count(a.vec_id) AS BIGINT),
       CAST(count(a.vec_id) * 1000 // count(*) AS BIGINT),
       CAST({_IVF_SIGN_FLOOR} AS BIGINT),
       TRUE
FROM ex LEFT JOIN ap_sign a USING (query_id, vec_id)
""")
def q_ivf_recall_audit(spark, sf_dir):
    """ANN recall contract, measured not trusted (the sketch-audit
    rule from SURVEY §4 applied to similarity search): recall@5 of
    BOTH approximate KNN paths against the exact brute-force top-5,
    with per-method floors pinned TRUE in the oracle — a regression
    that drops probe-IVF recall below 800‰ (or sign-bucket below
    100‰) flips meets_floor to FALSE and fails the hash gate.
    Integer permille via floor division — no ratio rounding drift."""
    emb = load_table(spark, sf_dir, "embeddings")
    # NOT checkpointed (round 13, measured 2.12 -> 2.86 s with a
    # localCheckpoint here): the brute kernel IS referenced twice,
    # but both evaluations run concurrently inside the one action —
    # an eager checkpoint serializes them into two jobs and loses.
    brute = similarity.knn_brute_cosine(emb, num_queries=5, k=5).select(
        "query_id", "vec_id"
    )

    def row(approx: DataFrame, method: str, floor: int) -> DataFrame:
        hit = approx.select("query_id", "vec_id").withColumn(
            "hit", F.lit(1)
        )
        return (
            brute.join(hit, ["query_id", "vec_id"], "left")
            .agg(
                F.count("*").cast("long").alias("n_exact"),
                F.count("hit").cast("long").alias("n_hits"),
            )
            .select(
                F.lit(method).alias("method"),
                "n_exact",
                "n_hits",
                F.expr("n_hits * 1000 div n_exact").alias(
                    "recall_permille"
                ),
                F.lit(floor).cast("long").alias("floor_permille"),
                (F.expr("n_hits * 1000 div n_exact") >= F.lit(floor))
                    .alias("meets_floor"),
            )
        )

    probe = similarity.knn_ivf_probe(
        emb, num_queries=5, k=5, num_centroids=_IVF_C, nprobe=_IVF_NPROBE
    )
    sign = similarity.knn_ivf_bucketed(emb, num_queries=5, k=5)
    return row(probe, "ivf_probe", _IVF_PROBE_FLOOR).unionAll(
        row(sign, "ivf_sign", _IVF_SIGN_FLOOR)
    )


@register("knn_all_topk", f"""
WITH scored AS (
    SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
           round({_COS_SQL}, 4) AS cosine
    FROM embeddings q, embeddings e
    WHERE e.vec_id <> q.vec_id
), ranked AS (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, vec_id) AS rank
    FROM scored
)
SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= 3
""")
def q_knn_all_topk(spark, sf_dir):
    # block_size 512 → 16 block-pair tasks at sf0.1 (parallelism over
    # one monolithic matmul); partial rows stay N·k·n_blocks.
    df = similarity.knn_all_topk(
        load_table(spark, sf_dir, "embeddings"), k=3, block_size=512
    )
    return _long(df, "rank")

@register("q_pq_codebook_audit", f"""
WITH vals AS (
    SELECT e.vec_id, (i.i - 1)::BIGINT AS dim,
           (e.embedding[i.i])::DOUBLE AS v
    FROM embeddings e,
         unnest(generate_series(1, len(e.embedding))) AS i(i)
), cent_ids AS (
    SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {_PQ_K}
), cents AS (
    SELECT v.vec_id AS cid, v.dim // {_PQ_SDIM} AS sub,
           v.dim % {_PQ_SDIM} AS sdim, v.v AS cv
    FROM vals v JOIN cent_ids c ON c.vec_id = v.vec_id
), pts AS (
    SELECT vec_id, dim // {_PQ_SDIM} AS sub, dim % {_PQ_SDIM} AS sdim,
           v
    FROM vals
), dist AS (
    SELECT p.vec_id, p.sub, c.cid,
           sum(((p.v - c.cv) * (p.v - c.cv))::DECIMAL(28,12)) AS d2
    FROM pts p JOIN cents c ON c.sub = p.sub AND c.sdim = p.sdim
    GROUP BY 1, 2, 3
), best AS (
    SELECT vec_id, sub, cid, d2,
           row_number() OVER (PARTITION BY vec_id, sub
                              ORDER BY d2, cid) AS rk
    FROM dist
)
SELECT sub AS subspace, count(*)::BIGINT AS n_vectors,
       count(DISTINCT cid)::BIGINT AS codes_used,
       {_PQ_K} AS codebook_size,
       round(sum(d2)::DOUBLE / (count(*) * {_PQ_SDIM}), 6)
           AS mse_per_dim,
       {_PQ_SUBS * _PQ_SDIM * 4} AS bytes_before,
       {_PQ_SUBS} AS bytes_after
FROM best WHERE rk = 1 GROUP BY sub
""")
def q_pq_codebook_audit(spark, sf_dir):
    """Product-quantization codebook audit (Jegou et al. IVFPQ's PQ
    half): split the 64-dim space into {_PQ_SUBS} subspaces of
    {_PQ_SDIM} dims, take the deterministic {_PQ_K}-point init
    codebook per subspace (the {_PQ_K} lowest vec_ids — the k-means
    SEED step; Lloyd refinement is the documented at-scale path,
    same shape as q_kmeans_clusters), assign every subvector to its
    nearest code and report per-subspace MSE and codebook
    utilization — the 'is {_PQ_SUBS} bytes per vector good enough?'
    decision (32x compression here) made from measured distortion,
    BEFORE wiring PQ under the IVF lists (q_knn_ivf_probe). Exact
    parity: per-dim squared deviations are single-rounded doubles
    accumulated in DECIMAL(28,12), argmin compares those exact
    decimals with cid tiebreak. The {_PQ_K}x fanout join is per
    subspace (never all-pairs); vectors stream through one pass."""
    emb = load_table(spark, sf_dir, "embeddings")
    # Round 10 plan (same values, hash-identical vs the unchanged
    # oracle): instead of posexploding to |vecs|x64 per-dim rows and
    # paying a x{_PQ_K} join fanout + a regroup (|vecs|x1024 shuffled
    # rows measured 3.8 s at sf0.1 — the most expensive idle query),
    # keep each subvector as an ARRAY: inline to |vecs|x{_PQ_SUBS}
    # slice rows, broadcast-join the {_PQ_K}x{_PQ_SUBS}-row codebook on
    # sub (fanout x{_PQ_K} of SLICE rows, 8x fewer than per-dim), and
    # compute d2 inside whole-stage codegen via zip_with+aggregate.
    # Exact parity is preserved operation-for-operation: each per-dim
    # deviation is (double - double) squared THEN cast to
    # DECIMAL(28,12), and the 8-term accumulation is decimal addition
    # (order-independent, re-cast each step; no overflow at these
    # magnitudes). The argmin is min(struct(d2, cid)) — the same
    # (d2, cid) lexicographic order row_number used.
    d2_expr = (
        "aggregate(zip_with(vs, cvs, (x, y) ->"
        " CAST((CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
        " * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
        " AS DECIMAL(28,12))),"
        " CAST(0 AS DECIMAL(28,12)),"
        " (acc, e) -> CAST(acc + e AS DECIMAL(28,12)))"
    )
    slices = F.inline(F.array(*[
        F.struct(
            F.lit(sub).alias("sub"),
            F.slice("embedding", sub * _PQ_SDIM + 1, _PQ_SDIM)
            .alias("vs"),
        )
        for sub in range(_PQ_SUBS)
    ]))
    # spread_scan (round 13): the x256 broadcast fanout below keeps
    # the probe side's partitioning, so all |vecs| x 8 x 256
    # interpreted zip_with/aggregate evaluations ran on the local
    # file's ONE scan split (no-op on a multi-split production scan)
    vals = spread_scan(emb, key="vec_id").select("vec_id", slices)
    cent_ids = emb.select("vec_id").orderBy("vec_id").limit(_PQ_K)
    cents = (
        emb.join(
            F.broadcast(
                cent_ids.withColumnsRenamed({"vec_id": "cid_src"})
            ),
            emb["vec_id"] == F.col("cid_src"),
        )
        .select(F.col("vec_id").alias("cid"), slices)
        .withColumnRenamed("vs", "cvs")
    )
    dist = (
        vals.join(F.broadcast(cents), ["sub"])
        .select("vec_id", "sub", "cid", F.expr(d2_expr).alias("d2"))
    )
    best = (
        dist.groupBy("vec_id", "sub")
        .agg(F.min(F.struct("d2", "cid")).alias("m"))
        .select("vec_id", "sub", F.col("m.d2").alias("d2"),
                F.col("m.cid").alias("cid"))
    )
    return best.groupBy(F.col("sub").alias("subspace")).agg(
        F.count("*").cast("long").alias("n_vectors"),
        F.countDistinct("cid").cast("long").alias("codes_used"),
        F.lit(_PQ_K).cast("long").alias("codebook_size"),
        F.expr(
            f"round(CAST(sum(d2) AS DOUBLE)"
            f" / (count(*) * {_PQ_SDIM}), 6)"
        ).alias("mse_per_dim"),
        F.lit(_PQ_SUBS * _PQ_SDIM * 4).cast("long").alias("bytes_before"),
        F.lit(_PQ_SUBS).cast("long").alias("bytes_after"),
    )


@register("q_ivf_nprobe_curve", f"""
WITH cents AS (
    SELECT vec_id AS centroid_id, embedding AS cv FROM embeddings
    WHERE vec_id < {_IVF_C}
), cscored AS (
    SELECT e.vec_id, e.embedding, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY round({_IVF_ASSIGN_COS}, 4) DESC,
                                       c.centroid_id) AS rn
    FROM embeddings e, cents c
), assign AS (
    SELECT vec_id, centroid_id FROM cscored WHERE rn = 1
), ex AS (
    SELECT query_id, vec_id FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY round({_COS_SQL}, 4) DESC,
                                           e.vec_id) AS rank
        FROM embeddings q, embeddings e
        WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id
    ) WHERE rank <= 5
), {_ivf_curve_cte(1)}, {_ivf_curve_cte(2)}, {_ivf_curve_cte(4)}
SELECT * FROM row_n1
UNION ALL SELECT * FROM row_n2
UNION ALL SELECT * FROM row_n4
""")
def q_ivf_nprobe_curve(spark, sf_dir):
    """The ANN cost/recall PLANNING CURVE: recall@5 against the exact
    brute-force top-5 AND the measured candidate-scan volume for
    nprobe in (1, 2, 4) — the number an index operator actually
    tunes (q_ivf_recall_audit pins ONE operating point's floor; this
    shows the whole trade-off so the 100 TB deployment can pick the
    cheapest nprobe that clears its recall SLO, and a curve that
    flattens early says the centroid count, not the probe count, is
    the binding constraint). ONE n x C centroid-scoring pass + ONE
    candidate join at nprobe=4 serves all three curve points: each
    vector lives in exactly one posting list, so the nprobe=np
    candidate set is exactly probe_rn <= np of the nprobe=4 relation
    (operators/similarity.py:ivf_probe_candidates with_probe_rank).
    The shared candidate relation and the brute baseline are
    localCheckpointed, and ALL THREE curve points come out of ONE
    window pass + ONE conditional aggregation: the per-nprobe top-5
    rank is a running conditional count over the (cosine desc,
    vec_id) order — rank-within-subset equals row_number over the
    probe_rn<=np filtered set because the sort is a strict total
    order — so no per-point window/join/union re-rounds remain (the
    round-10 verdict's 3x recompute, removed in two steps). Scan
    volume is COUNTED from the candidate relation, not inferred from
    nprobe/C."""
    emb = load_table(spark, sf_dir, "embeddings")
    brute = similarity.knn_brute_cosine(emb, num_queries=5, k=5).select(
        "query_id", "vec_id").localCheckpoint()
    cand_all = similarity.ivf_probe_candidates(
        emb, num_queries=5, num_centroids=_IVF_C, nprobe=4,
        with_probe_rank=True,
    ).localCheckpoint()
    n_emb = emb.agg(F.count("*").cast("long").alias("n_emb"))
    nex = brute.agg(F.count("*").cast("long").alias("n_exact"))
    w = (
        Window.partitionBy("query_id")
        .orderBy(F.col("cosine").desc(), "vec_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = cand_all.select(
        "query_id", "vec_id", "probe_rn",
        *[
            F.sum(F.when(F.col("probe_rn") <= np_val, 1).otherwise(0))
            .over(w).alias(f"rk{np_val}")
            for np_val in (1, 2, 4)
        ],
    )
    j = ranked.join(
        brute.withColumn("_b", F.lit(1)),
        ["query_id", "vec_id"], "left",
    )
    stats = j.agg(*[
        a
        for np_val in (1, 2, 4)
        for a in (
            F.sum(F.when(F.col("probe_rn") <= np_val, 1).otherwise(0))
            .cast("long").alias(f"scanned{np_val}"),
            F.sum(F.when(
                (F.col("probe_rn") <= np_val)
                & (F.col(f"rk{np_val}") <= 5)
                & F.col("_b").isNotNull(), 1).otherwise(0))
            .cast("long").alias(f"hits{np_val}"),
        )
    ])
    unpivot = ", ".join(
        f"{np_val}L, hits{np_val}, scanned{np_val}"
        for np_val in (1, 2, 4)
    )
    return (
        stats.crossJoin(F.broadcast(nex))
        .crossJoin(F.broadcast(n_emb))
        .select(
            F.expr(f"stack(3, {unpivot})")
            .alias("nprobe", "n_hits", "scanned_pairs"),
            "n_exact", "n_emb",
        )
        .select(
            "nprobe", "n_exact", "n_hits",
            F.expr("CAST(n_hits * 1000 div n_exact AS BIGINT)")
            .alias("recall_permille"),
            "scanned_pairs",
            F.expr("CAST(scanned_pairs * 1000"
                   " div (5 * (n_emb - 1)) AS BIGINT)")
            .alias("scan_permille"),
        )
    )
