"""Rounded-double comparison protocol lint (round 8).

After q_bollinger_bands failed the driver value-hash in round 7
(round(sqrt(double), 3) fed a band comparison and flipped at a .0005
boundary), this test ratchets the whole registry: every oracle site
where a ``round(<expr>, k>=1)`` result feeds a comparison, ORDER BY
rank, re-round, or integer cast must carry a whitelist entry with a
written justification. A NEW rounded-comparison site fails here until
it is converted to the integer protocol or justified below.

Why round(double, k>=1) is asymmetric between engines (measured, see
test_half_grid_divergence_exists): Spark rounds the shortest decimal
representation of the double (BigDecimal HALF_UP); DuckDB multiplies
by 10^k in floating point first. A value whose binary expansion sits
within ~ulp(x * 10^k) of a half-grid point (odd multiple of
0.5 * 10^-k) can round differently. round-to-INTEGER (k=0) has no
pre-scaling and is always engine-identical on the same double.

Justification classes:

- RATIO_BOUNDED: the rounded value is a ratio/cosine/jaccard/
  probability with |x| <= ~10, so |x * 10^k| <= ~1e7 and the
  divergence window is ~ulp(1e7)/0.5 ~ 4e-9 per row (continuous-
  valued rule, SURVEY §4). Grid-exact cases (power-of-two
  denominators) are exactly representable and round half-away-from-
  zero on BOTH engines (Java HALF_UP == C++ std::round for them).
- MEDIAN_OF_INTEGERS: quantile_cont over integer-valued data yields
  k or k+0.5 exactly (representable); round at >=1 dp is identity.
- ROUND_THEN_RESCALE: the value was already placed on a decimal grid
  by an earlier round; the consumer re-rounds after scaling by 10^j
  (j <= k), so inputs sit within ulp of the consumer's OWN grid
  points — never near the .5-offset boundary.
- GRID_INPUT_IDENTITY: source data is decimal-grid valued (2dp TPC-H
  money), every derived value lands on the k-dp grid, round is
  identity on both engines.
- IDENTICAL_DERIVATION: both comparison sides are computed from the
  same rounded columns by the same expression tree in both engines —
  the comparison sees bit-identical doubles on both sides, so it
  cannot flip at this site (any divergence must originate upstream,
  where it is covered by one of the other classes).
- EXACT_CONSTANT: round of a literal constant expression — the same
  double on both engines.

NOT justifiable (convert to the integer protocol instead — the
bollinger/embedding-norms/dim-variance lesson): a quantile over
GRID-VALUED data re-rounded at the same grid (midpoints are exact
half-grid points with ~1/2 probability, a coin flip per dataset),
or any rounded transcendental carrying more than ~7 significant
digits into a comparison.
"""

import sys

import pytest

sys.path.insert(0, "/root/repo")

from document_parsing_etl_pipeline_spark.plans.queries import ORACLES
from scripts.round_lint import lint_oracles

# (query, k, first-40-chars-of-inner-expr) -> justification class
_J = "len(list_filter(ta.tokens, t -> list_con"  # shingle jaccard
WHITELIST = {
    # --- jaccard threshold joins (ratio of small ints in [0,1]) ---
    ("dedup_components", 4, _J): "RATIO_BOUNDED",
    ("dedup_components_star", 4, _J): "RATIO_BOUNDED",
    ("dedup_ngram_jaccard", 4, _J): "RATIO_BOUNDED",
    ("q_cluster_density", 4, _J): "RATIO_BOUNDED",
    ("q_component_lookup", 4, _J): "RATIO_BOUNDED",
    ("q_cluster_purity", 4, _J): "RATIO_BOUNDED",
    ("q_dedup_cluster_sizes", 4, _J): "RATIO_BOUNDED",
    ("q_dedup_recall_capture", 4, _J): "RATIO_BOUNDED",
    ("q_dedup_threshold_curve", 4, _J): "RATIO_BOUNDED",
    ("q_degree_distribution", 4, _J): "RATIO_BOUNDED",
    ("q_dup_rate_by_length", 4, _J): "RATIO_BOUNDED",
    ("q_dup_source_matrix", 4, _J): "RATIO_BOUNDED",
    ("q_graph_assortativity", 4, _J): "RATIO_BOUNDED",
    ("q_graph_modularity", 4, _J): "RATIO_BOUNDED",
    ("q_lsh_band_planner", 4, _J): "RATIO_BOUNDED",
    ("q_neardup_materialize", 4, _J): "RATIO_BOUNDED",
    ("q_powerlaw_alpha", 4, _J): "RATIO_BOUNDED",
    # --- cosine thresholds / rank keys (|cos| <= 1) ---
    ("dedup_embedding", 4, "list_inner_product(a.embedding::DOUBLE[]"):
        "RATIO_BOUNDED",
    ("knn_ivf_probe", 4, "CASE WHEN list_inner_product(e.embedding"):
        "RATIO_BOUNDED",
    ("knn_ivf_probe", 4, "CASE WHEN list_inner_product(p.qv::DOUBL"):
        "RATIO_BOUNDED",
    ("q_ivf_nprobe_curve", 4, "CASE WHEN list_inner_product(e.embedding"):
        "RATIO_BOUNDED",
    ("q_ivf_nprobe_curve", 4, "CASE WHEN list_inner_product(q.embedding"):
        "RATIO_BOUNDED",
    ("q_ivf_recall_audit", 4, "CASE WHEN list_inner_product(e.embedding"):
        "RATIO_BOUNDED",
    ("q_ivf_recall_audit", 4, "CASE WHEN list_inner_product(p.qv::DOUBL"):
        "RATIO_BOUNDED",
    ("q_ivf_recall_audit", 4, "CASE WHEN list_inner_product(q.embedding"):
        "RATIO_BOUNDED",
    ("q_semdedup", 4, "CASE WHEN list_inner_product(x.embedding"):
        "RATIO_BOUNDED",
    # --- bounded ratios / probabilities vs fixed thresholds ---
    ("q_conversion_wilson", 6,
     "((x * cast(1.0 as double) / n) + cast(3."): "RATIO_BOUNDED",
    ("q_conversion_wilson", 6, "(x * cast(1.0 as double) / n)"):
        "RATIO_BOUNDED",
    ("q_corpus_curation", 4, "len(list_distinct(w.words)) / greatest(l"):
        "RATIO_BOUNDED",
    ("q_corpus_curation", 4, "r.top_ratio"): "ROUND_THEN_RESCALE",
    ("q_gopher_filters", 4, "word_chars / nw"): "RATIO_BOUNDED",
    ("q_gopher_filters", 4, "n_symbols / nw"): "RATIO_BOUNDED",
    ("q_gopher_filters", 4, "alpha_words / nw"): "RATIO_BOUNDED",
    ("q_gopher_filters", 4, "bullet_lines / n_lines"): "RATIO_BOUNDED",
    ("q_gopher_filters", 4, "ellipsis_lines / n_lines"): "RATIO_BOUNDED",
    ("q_embedding_quantize", 6, "scale"): "RATIO_BOUNDED",
    # --- 6dp-grid values rescaled to integer micro units ---
    ("q_bloom_planner", 6, "pow(1.0 - round(exp(-(CAST(round(cfg.mpn"):
        "ROUND_THEN_RESCALE",
    ("q_bm25_scores", 6, "ln(((t.n_docs - d.df)::DOUBLE + 0.5) / ("):
        "ROUND_THEN_RESCALE",
    ("q_reciprocal_rank_fusion", 6,
     "ln(((t.n_docs - d.df)::DOUBLE + 0.5) / ("): "ROUND_THEN_RESCALE",
    ("q_kneser_ney_bigram", 6, "(g.c - 0.75e0) / u.c1 + (0.75e0 * u.n1f "):
        "ROUND_THEN_RESCALE",
    ("q_kneser_ney_bigram", 6, "g.c::DOUBLE / u.c1"):
        "ROUND_THEN_RESCALE",
    # --- medians of integer-valued series (exact k or k+0.5) ---
    ("q_peak_detection", 4, "quantile_cont(n, 0.5)"):
        "MEDIAN_OF_INTEGERS",
    ("q_regime_runs", 4, "quantile_cont(n, 0.5)"): "MEDIAN_OF_INTEGERS",
    ("q_runs_test", 4, "quantile_cont(x, 0.5)"): "MEDIAN_OF_INTEGERS",
    # --- 2dp money: round(sum(DECIMAL)::DOUBLE, 2) is identity ---
    ("q_orders_monthly_trend", 2, "sum(o_totalprice::DECIMAL(18,6))::DOUBLE"):
        "GRID_INPUT_IDENTITY",
    ("q_rfm_segments", 2, "sum(o_totalprice::DECIMAL(18,6))::DOUBLE"):
        "GRID_INPUT_IDENTITY",
    # --- both compare sides from the same rounded columns ---
    ("q_sprt_status", 4, "xb * round(ln(p1 / p0), 6) + (nb - xb) *"):
        "IDENTICAL_DERIVATION",
    ("q_zipf_slope", 6, "(n * (sxy::DOUBLE) - (sx::DOUBLE) * (sy:"):
        "IDENTICAL_DERIVATION",
}

_CLASSES = {
    "RATIO_BOUNDED", "MEDIAN_OF_INTEGERS", "ROUND_THEN_RESCALE",
    "GRID_INPUT_IDENTITY", "IDENTICAL_DERIVATION", "EXACT_CONSTANT",
}


def test_no_unjustified_rounded_comparisons():
    findings = lint_oracles(ORACLES)
    unjustified = []
    for name, items in findings.items():
        for it in items:
            key = (name, it["k"], it["expr"][:40])
            if key not in WHITELIST:
                unjustified.append((key, it["contexts"]))
    assert not unjustified, (
        "rounded-double results feeding comparisons without a protocol "
        "justification (convert to the integer protocol — see "
        "q_bollinger_bands round-8 rewrite — or add a whitelist entry "
        f"with a justification class): {unjustified}"
    )


def test_whitelist_entries_still_exist():
    """A whitelist entry whose site disappeared is stale — prune it so
    the list stays an accurate inventory."""
    findings = lint_oracles(ORACLES)
    live = {
        (name, it["k"], it["expr"][:40])
        for name, items in findings.items()
        for it in items
    }
    stale = [k for k in WHITELIST if k not in live]
    assert not stale, f"stale whitelist entries: {stale}"
    bad = {k: v for k, v in WHITELIST.items() if v not in _CLASSES}
    assert not bad, f"unknown justification class: {bad}"


def test_no_unwhitelisted_literal_divisions():
    """Round-9 lint (after the q_gumbel_maxima driver FAIL): a bare
    decimal literal in a division with no double-forcing marker on
    either operand is decimal division in Spark but double division in
    DuckDB. Every such site must be rewritten (e-notation `1.0e0` /
    CAST AS DOUBLE / a Python-precomputed shared constant) or carry a
    written whitelist justification in scripts/round_lint.py."""
    from scripts.round_lint import lint_literal_typing

    findings = lint_literal_typing(ORACLES)
    assert not findings, (
        "decimal-literal divisions with engine-divergent typing "
        f"(fix with e-notation or whitelist with a scale argument): "
        f"{findings}"
    )


def test_literal_typing_whitelist_not_stale():
    from scripts.round_lint import (_DOUBLE_MARK, _LIT,
                                    _LIT_DIV_WHITELIST, _operand_left,
                                    _operand_right)
    import re

    live = set()
    for name, sql in ORACLES.items():
        for m in re.finditer(r"(?<![/])/(?![/])", sql):
            i = m.start()
            lo = _operand_left(sql, i)
            ro = _operand_right(sql, i + 1)
            if not (_LIT.search(lo) or _LIT.search(ro)):
                continue
            if _DOUBLE_MARK.search(lo) or _DOUBLE_MARK.search(ro):
                continue
            site = re.sub(r"\s+", " ",
                          lo.strip()[-44:] + " / " + ro.strip()[:44])
            for (q, frag) in _LIT_DIV_WHITELIST:
                if q == name and frag in site:
                    live.add((q, frag))
    stale = [k for k in _LIT_DIV_WHITELIST if k not in live]
    assert not stale, f"stale literal-typing whitelist entries: {stale}"


def test_bare_decimal_literal_division_diverges(spark):
    """Documents WHY the literal lint exists: `1.0 - 1.0/52` is
    DECIMAL(8,6) in Spark (0.980769, truncated) but DOUBLE in DuckDB —
    the exact q_gumbel_maxima r08 driver FAIL — while the e-notation
    form agrees bit-for-bit."""
    import duckdb
    import math

    con = duckdb.connect()
    expr = "round(ln(-ln(1.0 - 1.0 / 52)), 6)"
    d = con.execute(f"select {expr}").fetchone()[0]
    s = spark.sql(f"select {expr} as r").collect()[0]["r"]
    assert d != s, "engines now agree on bare-decimal ln composition"
    fixed = "round(ln(-ln(1.0e0 - 1.0e0 / 52)), 6)"
    d2 = con.execute(f"select {fixed}").fetchone()[0]
    s2 = spark.sql(f"select {fixed} as r").collect()[0]["r"]
    assert d2 == s2 == round(math.log(-math.log(1 - 1 / 52)), 6)


def test_half_grid_divergence_exists(spark):
    """Documents WHY the protocol exists: Spark and DuckDB measurably
    disagree on round(x, 4) for a double just below a half-grid point
    (this exact value regressed q_bollinger_bands-class queries)."""
    import duckdb
    from pyspark.sql import functions as F

    v = 977.7561499999999  # shortest repr ends ...95: Spark sees .75614999..
    d = duckdb.connect().execute(
        "select round(?::DOUBLE, 4)", [v]).fetchone()[0]
    s = spark.range(1).select(
        F.round(F.lit(v), 4).alias("r")).collect()[0]["r"]
    assert d != s, (
        "engines now agree on the half-grid witness — if DuckDB or "
        "Spark changed rounding semantics, re-evaluate the whitelist "
        "classes above"
    )


def test_round_to_integer_is_engine_identical(spark):
    """The blessed escape hatch: round-to-INTEGER of the same double
    has no pre-scaling asymmetry — both engines agree even exactly on
    half values (HALF_UP == half-away-from-zero for them)."""
    import duckdb
    from pyspark.sql import functions as F

    vals = [2.5, 3.5, -2.5, 0.49999999999999994, 1e15 + 0.5,
            977.75615 * 10000, 4999.999999999999]
    con = duckdb.connect()
    for v in vals:
        d = con.execute("select CAST(round(?::DOUBLE) AS BIGINT)",
                        [v]).fetchone()[0]
        s = spark.range(1).select(
            F.expr(f"CAST(round(CAST({v!r} AS DOUBLE)) AS BIGINT)")
            .alias("r")).collect()[0]["r"]
        assert d == s, f"round-to-int diverged on {v!r}: duck={d} spark={s}"


def test_manifest_bloom_planner_constants_match_tableformat():
    """q_manifest_bloom_planner grades the EXACT bloom the table
    format ships — its m/k constants must track tableformat's."""
    from document_parsing_etl_pipeline_spark.plans import queries as q
    from document_parsing_etl_pipeline_spark.sources import (
        tableformat as tf,
    )

    assert q._MBLOOM_M == tf._BLOOM_M
    assert q._MBLOOM_K == tf._BLOOM_K
    # the ENGAGED rows-per-file decision (round 12): the ingest sizes
    # index files to the largest grid candidate the planner marks
    # unsaturated — one shared grid, one saturation crossing
    from document_parsing_etl_pipeline_spark.streaming import neardup

    assert tuple(q._MBLOOM_NPF) == neardup.BLOOM_NPF_CANDIDATES
    assert neardup.INDEX_ROWS_PER_FILE == max(
        n for n in q._MBLOOM_NPF if n < q._MBLOOM_NSAT
    )


def test_index_optimize_planner_constants_match_neardup():
    """q_index_optimize_planner derives the decision table
    maybe_optimize_index executes — shared constants must agree."""
    from document_parsing_etl_pipeline_spark.plans import queries as q
    from document_parsing_etl_pipeline_spark.streaming import neardup

    # files per simulated batch = the live ingest's own sizing rule
    # applied to the simulated trigger (engaged bloom-planner npf)
    assert q._NDOPT_FPB == neardup.index_files_for(
        q._NDOPT_B * (q._MH_K // q._MH_BAND)
    )
    assert q._NDOPT_TFR == neardup.OPT_TARGET_FILE_ROWS
    assert q._NDOPT_FTRE == neardup.OPT_FTRE
    assert q._NDOPT_HORIZON == neardup.OPT_PAYBACK_HORIZON
    assert q._NDOPT_MINSAVE == neardup.OPT_MIN_FILE_SAVING


def test_popcount_audit_crossings_pin_the_engaged_gate():
    """q_bloom_popcount_audit renders Python-precomputed INTEGER
    crossings as SQL literals; this pins them to the decision the
    engaged gate (tableformat._bloom_prunable) actually makes, for
    every probe size in the audit grid, across a sweep of nbits /
    row-count values spanning each crossing — one shared rule, graded
    and executed, never diverging."""
    from document_parsing_etl_pipeline_spark.plans import queries as q
    from document_parsing_etl_pipeline_spark.sources import (
        tableformat as tf,
    )
    from document_parsing_etl_pipeline_spark.streaming import neardup

    assert q._BPA_DOCS_PER_FILE == (
        neardup.INDEX_ROWS_PER_FILE // (q._MH_K // q._MH_BAND)
    )
    for nk in q._BPA_PROBES:
        nbits_lim, rows_lim = q._BPA_CROSS[nk]
        assert (nbits_lim, rows_lim) == tf.bloom_prunable_crossings(nk)
        for nb in {0, 1, nbits_lim - 1, nbits_lim, nbits_lim + 1,
                   tf._BLOOM_M}:
            e = {"blooms": {"c": {"nbits": nb}}, "rows": 10**9}
            assert tf._bloom_prunable(e, "c", nk) == (nb < nbits_lim), (
                nk, nb)
        for r in {0, 1, rows_lim - 1, rows_lim, rows_lim + 1, 10**7}:
            e = {"blooms": {"c": {"has_null": False}}, "rows": r}
            assert tf._bloom_prunable(e, "c", nk) == (r < rows_lim), (
                nk, r)
    # the audited position expression is _write_files' own: nbits in
    # a manifest written by the engine equals the audit's count for
    # the same keys (cross-checked end-to-end in test_tableformat's
    # popcount test; here we pin the driver-side hash contract)
    ps = tf.bloom_positions(42)
    assert len(ps) == tf._BLOOM_K and all(0 <= p < tf._BLOOM_M
                                          for p in ps)
