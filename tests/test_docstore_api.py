"""API/repository-surface parity tests over the doc store
(reference api.py endpoints + repository.py CRUD, on sf0.001)."""

import pytest
from pyspark.sql import functions as F

from document_parsing_etl_pipeline_spark.catalog import load_table
from document_parsing_etl_pipeline_spark.sources import docstore, objectstore

from conftest import SF_DIR


@pytest.fixture(scope="module")
def tables(spark):
    return docstore.build_docstore(load_table(spark, SF_DIR, "documents"))


def test_documents_list_pagination(tables):
    page = tables["documents"].where(
        (F.col("doc_id") >= 10) & (F.col("doc_id") < 20)
    ).collect()
    assert len(page) == 10
    assert all(r.total_chunks >= 1 for r in page)


def test_document_detail_join(tables):
    detail = tables["documents"].join(tables["chunks"], "doc_id").where(
        F.col("doc_id") == 7
    ).collect()
    assert len(detail) == detail[0].total_chunks


def test_chunk_range_scan(tables):
    rows = tables["chunks"].where(
        (F.col("doc_id") == 7) & F.col("chunk_index").between(0, 1)
    ).collect()
    assert [r.chunk_index for r in rows] == [0, 1]


def test_update_metadata(tables):
    updated = docstore.update_document_meta(
        tables["documents"], 3, {"lang": "xx"}
    )
    rows = {r.doc_id: r for r in updated.where(F.col("doc_id") < 5).collect()}
    assert rows[3].lang == "xx"
    assert rows[2].lang != "xx"
    # onupdate parity: the touched row's updated_at bumps, others don't
    assert (rows[3].updated_at - rows[3].created_at).days == 1
    assert rows[2].updated_at == rows[2].created_at


def test_reference_schema_parity_columns(tables):
    """Document.metainfo/created_at/updated_at, DocumentChunk.entities
    (typed map) + chunk_metadata, ChartData.info (reference
    schema.py:11-57) all surface in the store."""
    doc = tables["documents"].where(F.col("doc_id") == 7).collect()[0]
    assert doc.metainfo == {"lang": doc.lang, "source": doc.source}
    assert doc.created_at == doc.updated_at
    chunk = tables["chunks"].where(
        (F.col("doc_id") == 7) & (F.col("chunk_index") == 0)
    ).collect()[0]
    assert set(chunk.entities.keys()) == {
        "persons", "organizations", "dates", "locations", "misc"
    }
    assert all(isinstance(v, list) for v in chunk.entities.values())
    assert chunk.chunk_metadata == {"token_count": chunk.token_count}
    chart = tables["charts"].limit(1).collect()[0]
    assert chart.info.type == chart.chart_type
    assert chart.info["index"] == chart.chart_index  # .index is Row method
    assert chart.info.metadata.level == 1 and chart.info.metadata.caption is None


def test_cascade_delete(tables):
    after = docstore.delete_document(tables, 3)
    for name in ("documents", "chunks", "charts"):
        assert after[name].where(F.col("doc_id") == 3).count() == 0
    assert after["documents"].where(F.col("doc_id") == 4).count() == 1


def test_docstore_roundtrip(tmp_path, spark, tables):
    root = str(tmp_path / "store")
    docstore.write_docstore(
        {k: v.where(F.col("doc_id") < 20) for k, v in tables.items()}, root
    )
    back = docstore.read_docstore(spark, root)
    assert back["documents"].count() == 20
    assert "bucket" in back["chunks"].columns  # bucketed layout survives


def test_objectstore_roundtrip(tmp_path, spark):
    root = str(tmp_path / "blobs")
    blobs = objectstore.put_images(
        spark, [(objectstore.object_path(1, 1), b"\x89PNGdata", "image/png")]
    )
    objectstore.write_blobs(blobs, root)
    got = objectstore.read_blob(spark, root, 1, 1).collect()
    assert len(got) == 1 and bytes(got[0].content).startswith(b"\x89PNG")
    assert objectstore.delete_blob(blobs, 1, 1).count() == 0


def test_sql_view_facade(spark):
    """The engine's tables register as temp views → spark.sql works
    as a first-class query interface."""
    from document_parsing_etl_pipeline_spark.catalog import register_views
    register_views(spark, SF_DIR)
    out = spark.sql("""
        SELECT d.lang, count(*) AS n
        FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
        GROUP BY d.lang ORDER BY n DESC
    """).collect()
    assert sum(r.n for r in out) == 500


def test_bucketed_tables_join_without_shuffle(spark, tables):
    """Co-bucketed doc_id tables must join with no Exchange — the
    write-time partitioning property that carries the API surface at
    scale."""
    small = {k: v.where(F.col("doc_id") < 50) for k, v in tables.items()
             if k in ("documents", "chunks")}
    docstore.write_bucketed_tables(small, database="store_t", n_buckets=4)
    try:
        d = spark.table("store_t.documents").hint("merge")
        c = spark.table("store_t.chunks")
        joined = d.join(c, "doc_id").select("doc_id", "chunk_index")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS store_t.documents")
        spark.sql("DROP TABLE IF EXISTS store_t.chunks")
        spark.sql("DROP DATABASE IF EXISTS store_t")


def test_document_detail_runs_exchange_free_on_bucketed_store(spark, tables):
    """The ACTUAL §B detail query (docstore.document_detail) over the
    bucketed catalog: zero Exchange on the doc_id join path, and the
    result matches the raw-frame run row for row."""
    small = {k: v.where(F.col("doc_id") < 50) for k, v in tables.items()
             if k in ("documents", "chunks")}
    docstore.write_bucketed_tables(small, database="store_d", n_buckets=4)
    try:
        detail = docstore.document_detail(
            spark.table("store_d.documents").hint("merge"),
            spark.table("store_d.chunks"),
        )
        plan = detail._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        bucketed = sorted(map(tuple, detail.collect()))
        raw = sorted(map(tuple, docstore.document_detail(
            small["documents"], small["chunks"]
        ).collect()))
        assert bucketed == raw and len(bucketed) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS store_d.documents")
        spark.sql("DROP TABLE IF EXISTS store_d.chunks")
        spark.sql("DROP DATABASE IF EXISTS store_d")


def test_upsert_merge_semantics(spark, tables):
    from datetime import datetime, timezone

    def ts(doc_id):
        return datetime.fromtimestamp(
            docstore.INGEST_EPOCH_S + doc_id, tz=timezone.utc
        )

    docs = tables["documents"].where(F.col("doc_id") < 10)
    updates = spark.createDataFrame(
        [(3, "doc_3_v2.txt", "fr", "src3", 999,
          {"lang": "fr", "source": "src3"}, ts(3), ts(3), 1, 10, 10),
         (100, "doc_100.txt", "en", "new", 5,
          {"lang": "en", "source": "new"}, ts(100), ts(100), 1, 2, 2)],
        docs.schema,
    )
    merged = docstore.upsert_documents(docs, updates)
    assert merged.count() == 11  # 10 existing, 1 replaced, 1 new
    by_id = {r.doc_id: r for r in merged.collect()}
    assert by_id[3].filename == "doc_3_v2.txt" and by_id[3].lang == "fr"
    assert by_id[100].source == "new"
    assert by_id[2].filename == "doc_2.txt"  # untouched rows survive
