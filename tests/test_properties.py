"""Property-based tests (hypothesis) for operator invariants."""

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Row

from document_parsing_etl_pipeline_spark.operators.chunking import (
    chunk_documents,
)
from document_parsing_etl_pipeline_spark.operators.dedup import dedup_exact
from document_parsing_etl_pipeline_spark.operators.text_analysis import (
    token_counts,
)

TEXTS = st.text(
    alphabet=st.sampled_from("ab c\tx yz"), min_size=0, max_size=400
)
SLOW_OK = settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(text=TEXTS)
@SLOW_OK
def test_chunks_reconstruct_document(spark, text):
    """With overlap 0 and min_chunk 1, concatenated chunks == text."""
    df = spark.createDataFrame([Row(doc_id=0, text=text)])
    rows = chunk_documents(df, chunk_size=50, overlap=0, min_chunk=1).orderBy(
        "chunk_index"
    ).collect()
    assert "".join(r.text_content for r in rows) == text


@given(text=TEXTS)
@SLOW_OK
def test_ws_tokens_match_python_split(spark, text):
    df = spark.createDataFrame(
        [Row(doc_id=0, text=text, lang="en", source="s", n_chars=len(text))]
    )
    r = token_counts(df).collect()[0]
    assert r.ws_tokens == len(text.split())


@given(text=TEXTS)
@SLOW_OK
def test_exact_dedup_hash_matches_hashlib(spark, text):
    df = spark.createDataFrame([Row(doc_id=0, text=text)])
    r = dedup_exact(df).collect()[0]
    normalized = " ".join(text.lower().split())
    assert r.content_hash == hashlib.md5(normalized.encode()).hexdigest()


def test_approx_percentile_within_tolerance_of_exact(spark):
    """The t-digest/approx swap the percentile query names for 100 TB:
    approx_percentile tracks the exact interpolated percentile within
    a few percent on the events table."""
    from document_parsing_etl_pipeline_spark.catalog import load_table
    from conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    import pyspark.sql.functions as F
    row = ev.agg(
        F.expr("percentile(value, 0.95)").alias("exact"),
        F.expr("approx_percentile(value, 0.95, 1000)").alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) <= 0.05 * abs(row.exact) + 1e-9
