"""Adversarial-data parity: the Spark↔DuckDB oracle contract must
hold on degenerate documents (empty / whitespace-only / unicode /
CRLF / symbol-heavy), not just the generator's clean corpus.

Found real latent bugs once: DuckDB ``array_to_string([])`` is NULL
where Spark's ``array_join`` is '' — md5(NULL) then poisoned the
dedup hashes. The oracles now coalesce; this test keeps them honest.
"""

import duckdb
import pytest

from document_parsing_etl_pipeline_spark.plans.queries import (
    ORACLES, QUERIES,
)

EDGE_DOCS = [
    (0, "", "en", "edge", 0),
    (1, "   ", "en", "edge", 3),
    (2, "\t\n\t\n", "en", "edge", 4),
    (3, "word", "en", "edge", 4),
    (4, "a " * 200, "en", "edge", 400),
    (5, "Café naïve résumé 中文文档 😀 emoji", "fr", "edge", 30),
    (6, "x" * 500, "en", "edge", 500),
    (7, "the the the and and of to a " * 10, "en", "edge", 280),
    (8, "line1\nline2\n- bullet\n- b2\nend...", "en", "edge", 32),
    (9, "MiXeD CaSe TEXT with  double  spaces", "de", "edge", 36),
    (10, "tab\there\nnew\nlines\r\ncarriage", "es", "edge", 29),
    (11, "123 456 789 #### ... ... $$$", "en", "edge", 28),
]

# documents-only queries that exercise the text/token/hash paths
EDGE_QUERIES = [
    "doc_normalize", "doc_metadata", "doc_chunk", "doc_chunk_tokens",
    "dedup_exact", "dedup_materialize", "quality_score", "token_count",
    "lang_id", "q_gopher_filters", "q_unigram_logprob", "fingerprint",
    "q_repetition_ratio", "q_sequence_pack",
    "q_bm25_scores", "q_dsir_weights", "q_shard_assignment",
    "q_bpe_merge_step",
    # session-2 additions: the exact similarity join must return the
    # brute-force answer even on empty/whitespace/unicode docs (no
    # shingles => no pairs, never a crash); triangle/bigram/cluster
    # paths must agree on zero-token and repeated-token degenerates
    "q_setsim_prefix_join", "q_triangle_count", "q_bigram_logprob",
    "q_dedup_cluster_sizes", "q_uniform_sample_exact",
    # round-6 additions: degenerate docs must rank/sample/bucket
    # identically — zero-token docs vanish from the CCNet buckets on
    # BOTH engines (no surprisal row), appear in quantile norm with
    # the greatest(...,1) guard, and the weighted sample's k exceeds
    # the corpus (top-k returns everything, ranked)
    "q_domain_cap_sample", "q_spearman_rank_corr", "q_zipf_slope",
    "q_weighted_sample", "q_quality_quantile_norm", "q_ccnet_buckets",
    "q_source_dup_rates", "q_incremental_components",
    "q_dedup_threshold_curve",
    # round-9 additions: the span-dedup pair must agree on zero-token
    # and shorter-than-one-window docs (n_windows = 0 -> zero spans,
    # never a crash or a negative length)
    "q_span_dedup", "q_span_longest_match",
]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory, spark):
    import shutil

    d = tmp_path_factory.mktemp("edge_sf")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        shutil.copyfile(f"/root/testdata/sf0.001/{t}.parquet",
                        str(d / f"{t}.parquet"))
    con = duckdb.connect()
    con.execute("create table d(doc_id BIGINT, text VARCHAR, "
                "lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    con.executemany("insert into d values (?,?,?,?,?)", EDGE_DOCS)
    con.execute(
        f"copy d to '{d}/documents.parquet' (format parquet)"
    )
    return str(d)


def _normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                # repr = shortest round-trip: distinct doubles always
                # differ (the %.6g form masked the r08 q_gumbel_maxima
                # 4th-decimal divergence; the driver hashes full
                # precision, so must this gate)
                v = repr(v)
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_parity(spark, edge_dir, name):
    got = QUERIES[name](spark, edge_dir)
    cols = got.columns
    got_n = _normalize([tuple(r) for r in got.collect()], cols)

    con = duckdb.connect()
    con.execute(
        "create view documents as select * from "
        f"read_parquet('{edge_dir}/documents.parquet')"
    )
    res = con.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    want_n = _normalize(res.fetchall(), ocols)
    assert sorted(cols) == sorted(ocols)
    assert got_n == want_n


EDGE_EMB_QUERIES = [
    "knn_brute_cosine", "knn_ivf_bucketed", "knn_all_topk",
    "dedup_embedding", "cluster_assign", "q_embedding_quantize",
]


@pytest.fixture(scope="module")
def edge_emb_dir(tmp_path_factory, spark):
    import random
    import shutil

    d = tmp_path_factory.mktemp("edge_emb")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents"):
        shutil.copyfile(f"/root/testdata/sf0.001/{t}.parquet",
                        str(d / f"{t}.parquet"))
    rng = random.Random(3)
    rows = []
    for i in range(40):
        if i == 0:
            v = [0.0] * 64                  # zero vector (NaN trap)
        elif i == 1:
            v = [0.0] * 63 + [1.0]          # one-hot
        elif i == 2:
            v = [1e-6] * 64                 # tiny magnitudes
        else:
            v = [rng.gauss(0, 1) for _ in range(64)]
        rows.append((i, [float(x) for x in v], i % 5))
    con = duckdb.connect()
    con.execute("create table e(vec_id BIGINT, embedding FLOAT[], "
                "label INTEGER)")
    con.executemany("insert into e values (?,?,?)", rows)
    con.execute(f"copy e to '{d}/embeddings.parquet' (format parquet)")
    return str(d)


@pytest.mark.parametrize("name", EDGE_EMB_QUERIES)
def test_edge_embedding_parity(spark, edge_emb_dir, name):
    """Zero-norm vectors must score cosine 0 (not NaN) identically on
    both engines — NaN ordering diverges between them."""
    got = QUERIES[name](spark, edge_emb_dir)
    cols = got.columns
    got_n = _normalize([tuple(r) for r in got.collect()], cols)

    con = duckdb.connect()
    con.execute(
        "create view embeddings as select * from "
        f"read_parquet('{edge_emb_dir}/embeddings.parquet')"
    )
    res = con.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    want_n = _normalize(res.fetchall(), ocols)
    assert sorted(cols) == sorted(ocols)
    assert got_n == want_n


EDGE_EVENTS = [
    (0, '2024-01-01 00:00:00', 1, 'click', 1.5, '{"k": 5}'),
    (1, '2024-01-01 00:01:00', 1, 'click', 2.5, '{"k": "17"}'),
    (2, '2024-01-01 00:02:00', 2, 'view', 0.5, '{"other": 1}'),
    (3, '2024-01-01 00:03:00', 2, 'view', 1.0, 'not json'),
    (4, '2024-01-01 00:04:00', 3, 'purchase', 9.0, ''),
    (5, '2024-01-01 00:05:00', 3, 'view', 2.0, None),
    (6, '2024-01-01 00:06:00', 4, 'click', 3.0, '{"k": {"nested": 1}}'),
    (7, '2024-01-01 00:07:00', 4, 'click', 4.0, '{"k": 25.7}'),
    (8, '2024-01-01 00:08:00', 5, 'view', 5.0, '{"k": null}'),
    (9, '2024-01-01 00:09:00', 5, 'view', 6.0, '[1,2,3]'),
    # timestamp TIES (same user, same instant, different event_id):
    # every window ordered by (ts, event_id) must break them the same
    # way on both engines
    (10, '2024-01-01 00:09:00', 5, 'click', 7.0, None),
    (11, '2024-01-01 00:09:00', 5, 'purchase', 8.0, None),
    # exact midnight day boundary + a multi-day gap (streak break,
    # gapfill zero-days, decay ages)
    (12, '2024-01-02 00:00:00', 1, 'view', 1.0, None),
    (13, '2024-01-02 23:59:59', 1, 'view', 2.0, None),
    (14, '2024-01-05 12:00:00', 1, 'purchase', 3.0, None),
    (15, '2024-01-05 12:00:00', 2, 'click', -4.5, None),  # negative value
]

EDGE_EVENT_QUERIES = [
    "q_events_json_props", "q_events_windowed", "q_event_transitions",
    "q_events_gap_detection", "q_funnel_conversion", "q_events_anomaly",
    # session-2 additions: tie-breaks, day boundaries, gap days, and
    # negative values must replay identically
    "q_events_sessionize", "q_session_paths", "q_rate_limit_audit",
    "q_decayed_counts", "q_new_vs_returning", "q_autocorr_daily",
    "q_activity_streaks", "q_timeseries_gapfill", "q_k_anonymity",
    "q_mad_outliers", "q_audience_overlap", "q_ab_split_audit",
    "q_events_percentiles",
    # round-6 additions: sequence-pattern counts, session-scoped
    # funnels, leaderboard ties, dow profiles, and the l-diversity
    # cells must replay identically on ties/negatives/day boundaries
    "q_event_pattern_match", "q_session_conversion",
    "q_trending_terms", "q_seasonal_anomaly", "q_l_diversity",
    "q_conversion_wilson", "q_ab_lift_test", "q_median_ci",
]


@pytest.fixture(scope="module")
def edge_ev_dir(tmp_path_factory, spark):
    import shutil

    d = tmp_path_factory.mktemp("edge_ev")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        shutil.copyfile(f"/root/testdata/sf0.001/{t}.parquet",
                        str(d / f"{t}.parquet"))
    # write through pyarrow as TIMESTAMP(NANOS): driver testdata has
    # shipped both NANOS (rounds 1-3) and MICROS (round 4) for
    # events.ts; the real sf dirs exercise whichever the driver
    # currently generates, and this fixture deliberately keeps the
    # nanos-as-long leg of catalog.load_table's normalization covered
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime

    tbl = pa.table({
        "event_id": pa.array([r[0] for r in EDGE_EVENTS], pa.int64()),
        "ts": pa.array(
            [datetime.fromisoformat(r[1]) for r in EDGE_EVENTS],
            pa.timestamp("ns"),
        ),
        "user_id": pa.array([r[2] for r in EDGE_EVENTS], pa.int64()),
        "event_type": pa.array([r[3] for r in EDGE_EVENTS], pa.string()),
        "value": pa.array([r[4] for r in EDGE_EVENTS], pa.float64()),
        "props": pa.array([r[5] for r in EDGE_EVENTS], pa.string()),
    })
    pq.write_table(tbl, f"{d}/events.parquet", version="2.6",
                   coerce_timestamps=None)
    return str(d)


@pytest.mark.parametrize("name", EDGE_EVENT_QUERIES)
def test_edge_events_parity(spark, edge_ev_dir, name):
    """Messy JSON props (malformed / nested / float / string-number /
    null / array-root) must bucket identically on both engines."""
    got = QUERIES[name](spark, edge_ev_dir)
    cols = got.columns
    got_n = _normalize([tuple(r) for r in got.collect()], cols)

    con = duckdb.connect()
    con.execute(
        "create view events as select * from "
        f"read_parquet('{edge_ev_dir}/events.parquet')"
    )
    res = con.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    want_n = _normalize(res.fetchall(), ocols)
    assert sorted(cols) == sorted(ocols)
    assert got_n == want_n


EDGE_ORDERS = [
    # classic double-rounding traps: x.xx5 values whose binary
    # representation sits just above/below the decimal half — the
    # integer-cents protocol (DECIMAL accumulate -> x100 -> round
    # ONCE) must floor identically on both engines
    (1, 1, 'O', 0.005, '1995-03-01', '1-URGENT'),
    (2, 1, 'O', 1.005, '1996-03-01', '1-URGENT'),
    (3, 2, 'O', 2.675, '1995-06-01', '2-HIGH'),
    (4, 2, 'O', 1234.565, '1997-06-01', '2-HIGH'),
    (5, 3, 'O', 0.015, '1995-01-01', '3-MEDIUM'),
    (6, 3, 'O', 99999.995, '1998-01-01', '3-MEDIUM'),
    (7, 4, 'O', 10.0, '1995-01-01', '4-NOT'),
]

EDGE_ORDER_QUERIES = [
    "q_cohort_ltv", "q_yoy_growth", "q_revenue_gini",
    # round 6: equi-depth cuts must floor the x.xx5 double traps
    # identically (floor-to-dollars, integer rank cuts)
    "q_equi_depth_histogram",
]


@pytest.fixture(scope="module")
def edge_ord_dir(tmp_path_factory, spark):
    import shutil

    d = tmp_path_factory.mktemp("edge_ord")
    for t in ("region", "nation", "customer", "supplier", "part",
              "lineitem", "events", "documents", "embeddings"):
        shutil.copyfile(f"/root/testdata/sf0.001/{t}.parquet",
                        str(d / f"{t}.parquet"))
    con = duckdb.connect()
    con.execute(
        "create table o(o_orderkey BIGINT, o_custkey BIGINT, "
        "o_orderstatus VARCHAR, o_totalprice DOUBLE, "
        "o_orderdate TIMESTAMP, o_orderpriority VARCHAR)"
    )
    con.executemany("insert into o values (?,?,?,?,?,?)", EDGE_ORDERS)
    con.execute(f"copy o to '{d}/orders.parquet' (format parquet)")
    return str(d)


@pytest.mark.parametrize("name", EDGE_ORDER_QUERIES)
def test_edge_money_rounding_parity(spark, edge_ord_dir, name):
    got = QUERIES[name](spark, edge_ord_dir)
    cols = got.columns
    got_n = _normalize([tuple(r) for r in got.collect()], cols)

    con = duckdb.connect()
    con.execute(
        "create view orders as select * from "
        f"read_parquet('{edge_ord_dir}/orders.parquet')"
    )
    res = con.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    want_n = _normalize(res.fetchall(), ocols)
    assert sorted(cols) == sorted(ocols)
    assert got_n == want_n


# --- q_bollinger_bands boundary fixture (round-8 regression) -------
#
# The r07 driver hash FAIL: sigma = round(sqrt(double), 3) flipped at
# a .0005 boundary between Spark (BigDecimal HALF_UP on the binary
# double) and DuckDB (x1000-then-round). The round-8 rewrite makes
# the band flags EXACT integer predicates: (n*v - s)^2 vs
# 4*(n*ssq - s^2). This fixture pins the worst case — a day sitting
# EXACTLY ON the band: four days at a=1000 cents then b=1300 cents
# gives, for the 5-day window, D = n*ssq - s^2 = 4*(a-b)^2 and
# dev = n*b - s = 4*(b-a), so dev^2 == 4*D exactly. Strict > must
# call it NOT a breakout on both engines; one extra cent must flip it.

BOLLINGER_DAYS = [
    ("2024-01-01", 10.00),   # n=1: D=0, dev=0 -> inside
    ("2024-01-02", 10.00),
    ("2024-01-03", 10.00),
    ("2024-01-04", 10.00),
    ("2024-01-05", 13.00),   # dev^2 == 4D exactly: ON the band
    ("2024-01-06", 50.00),   # spike: dev^2 = 388.09M > 4D = 312.2M
    ("2024-01-07", -100.00), # crash: dev^2 = 4.94G > 4D = 3.66G
]


@pytest.fixture(scope="module")
def edge_boll_dir(tmp_path_factory, spark):
    import shutil
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("edge_boll")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        shutil.copyfile(f"/root/testdata/sf0.001/{t}.parquet",
                        str(d / f"{t}.parquet"))
    tbl = pa.table({
        "event_id": pa.array(range(len(BOLLINGER_DAYS)), pa.int64()),
        "ts": pa.array(
            [datetime.fromisoformat(f"{day} 12:00:00")
             for day, _ in BOLLINGER_DAYS],
            pa.timestamp("us"),
        ),
        "user_id": pa.array([1] * len(BOLLINGER_DAYS), pa.int64()),
        "event_type": pa.array(["m"] * len(BOLLINGER_DAYS), pa.string()),
        "value": pa.array([v for _, v in BOLLINGER_DAYS], pa.float64()),
        "props": pa.array([None] * len(BOLLINGER_DAYS), pa.string()),
    })
    pq.write_table(tbl, f"{d}/events.parquet")
    return str(d)


def test_bollinger_on_band_boundary_parity(spark, edge_boll_dir):
    got = QUERIES["q_bollinger_bands"](spark, edge_boll_dir)
    cols = got.columns
    rows = {r["day"]: r.asDict() for r in got.collect()}
    got_n = _normalize(
        [tuple(r) for r in QUERIES["q_bollinger_bands"](
            spark, edge_boll_dir).collect()], cols)

    # the exactly-on-band day must NOT flag (strict >) ...
    on_band = rows[min(rows) + 4]
    assert on_band["v_cents"] == 1300
    assert on_band["above_band"] is False and on_band["below_band"] is False
    # ... its sigma is the exact integer path: D = 4*300^2,
    # sqrt = 600, (1e6*600)//5 = 120_000_000 micro-cents
    assert on_band["sigma_micro_cents"] == 120_000_000
    # genuine breakouts on both sides still flag (strict > satisfied
    # with integer slack, no boundary involved)
    assert rows[min(rows) + 5]["above_band"] is True
    assert rows[min(rows) + 6]["below_band"] is True

    con = duckdb.connect()
    con.execute(
        "create view events as select * from "
        f"read_parquet('{edge_boll_dir}/events.parquet')"
    )
    res = con.execute(ORACLES["q_bollinger_bands"])
    ocols = [d[0] for d in res.description]
    want_n = _normalize(res.fetchall(), ocols)
    assert sorted(cols) == sorted(ocols)
    assert got_n == want_n


# --- q_gumbel_maxima literal-typing fixture (round-9 regression) ----
#
# The r08 driver hash FAIL: the return-level term ln(-ln(1 - 1/52))
# written inline typed `1.0 - 1.0/52` as DECIMAL(8,6) in Spark
# (lnln -3.941538) vs double in DuckDB (-3.941550). The fix
# interpolates ONE Python-precomputed 6dp literal into both engine
# texts. This fixture makes beta large enough (~30) that the old
# 1.2e-5 constant gap would shift the 4dp return level by ~3.6e-4 —
# a guaranteed full-precision divergence on the old code.

GUMBEL_WEEK_PEAKS = [10, 30, 60, 100]


@pytest.fixture(scope="module")
def edge_gumbel_dir(tmp_path_factory, spark):
    import shutil
    from datetime import datetime, timedelta

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("edge_gumbel")
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "documents", "embeddings"):
        shutil.copyfile(f"/root/testdata/sf0.001/{t}.parquet",
                        str(d / f"{t}.parquet"))
    # 2024-01-04 is epoch day 19726 = 7*2818: each peak sits in its
    # own day//7 block, so weekly maxima are exactly GUMBEL_WEEK_PEAKS
    base = datetime(2024, 1, 4, 12, 0, 0)
    ts, eid = [], 0
    for w, peak in enumerate(GUMBEL_WEEK_PEAKS):
        for day in range(7):
            n = peak if day == 0 else 1
            for _ in range(n):
                ts.append(base + timedelta(days=7 * w + day))
                eid += 1
    tbl = pa.table({
        "event_id": pa.array(range(eid), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1] * eid, pa.int64()),
        "event_type": pa.array(["m"] * eid, pa.string()),
        "value": pa.array([1.0] * eid, pa.float64()),
        "props": pa.array([None] * eid, pa.string()),
    })
    pq.write_table(tbl, f"{d}/events.parquet")
    return str(d)


def test_gumbel_return_level_parity(spark, edge_gumbel_dir):
    import math

    got = QUERIES["q_gumbel_maxima"](spark, edge_gumbel_dir)
    cols = got.columns
    row = got.collect()[0].asDict()
    assert row["n_blocks"] == len(GUMBEL_WEEK_PEAKS)
    assert row["max_weekly_peak"] == max(GUMBEL_WEEK_PEAKS)
    # beta must be large enough that the old constant gap (1.2e-5)
    # would move the 4dp-rounded return level — i.e. this fixture
    # would have caught the r08 bug
    assert row["gumbel_beta"] * 1.2e-5 > 2e-4

    con = duckdb.connect()
    con.execute(
        "create view events as select * from "
        f"read_parquet('{edge_gumbel_dir}/events.parquet')"
    )
    res = con.execute(ORACLES["q_gumbel_maxima"])
    ocols = [d[0] for d in res.description]
    assert sorted(cols) == sorted(ocols)
    got_n = _normalize([tuple(r) for r in
                        QUERIES["q_gumbel_maxima"](
                            spark, edge_gumbel_dir).collect()], cols)
    want_n = _normalize(res.fetchall(), ocols)
    assert got_n == want_n

    # the composed value is the closed form from the shared constants
    peaks = GUMBEL_WEEK_PEAKS
    nb = len(peaks)
    mean = sum(peaks) / nb
    var = (nb * sum(p * p for p in peaks) - sum(peaks) ** 2) \
        / (nb * (nb - 1))
    beta = round(math.sqrt(var) * 0.7796968012336761, 6)
    mu = round(mean - 0.5772156649 * beta, 6)
    lnln = round(math.log(-math.log(1 - 1 / 52)), 6)
    assert row["return_level_52wk"] == round(mu - beta * lnln, 4)
