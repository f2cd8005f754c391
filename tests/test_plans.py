"""Plan-quality assertions: the scale claims in SURVEY §4, checked
against the optimized plans (pushed filters, broadcast joins, no
Python in JVM-only pipelines)."""

from document_parsing_etl_pipeline_spark.plans.queries import QUERIES

from conftest import SF_DIR


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_pushes_shipdate_filter_to_scan(spark):
    df = QUERIES["q1_pricing_summary"](spark, SF_DIR)
    plan = _executed(df)
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_q1_prunes_columns(spark):
    df = QUERIES["q1_pricing_summary"](spark, SF_DIR)
    plan = _executed(df)
    # scan must not read the unused l_orderkey/l_partkey columns
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" not in read_schema
    assert "l_returnflag" in read_schema


def test_q3_broadcasts_customer_dim(spark):
    df = QUERIES["q3_shipping_priority"](spark, SF_DIR)
    assert "BroadcastHashJoin" in _executed(df)


def test_q5_broadcasts_all_dims(spark):
    df = QUERIES["q5_local_supplier"](spark, SF_DIR)
    plan = _executed(df)
    assert plan.count("BroadcastHashJoin") >= 3


def test_chunker_is_pure_jvm(spark):
    # no BatchEvalPython / ArrowEvalPython in the chunk+NER pipeline
    df = QUERIES["ner_entities"](spark, SF_DIR)
    plan = _executed(df)
    assert "EvalPython" not in plan


def test_all_queries_no_rowbased_python_udf(spark):
    # row-at-a-time Python UDFs are banned in every registered query;
    # only Arrow-batched (MapInPandas) is acceptable, and only in the
    # multimodal pipeline and the block-matrix embedding kernel.
    arrow_ok = {"mm_image_pipeline", "dedup_embedding", "knn_all_topk"}
    for name, fn in QUERIES.items():
        plan = _executed(fn(spark, SF_DIR))
        assert "BatchEvalPython" not in plan, name
        if name not in arrow_ok:
            assert "MapInPandas" not in plan, name
