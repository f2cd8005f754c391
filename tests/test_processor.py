"""Facade parity tests: the reference's processor/API call sequence
(demo.py + api.py flows) against DocumentProcessor."""

import pytest
from pyspark.sql import Row

from document_parsing_etl_pipeline_spark.processor import DocumentProcessor


@pytest.fixture(scope="module")
def proc(spark, tmp_path_factory):
    docs = spark.createDataFrame([
        Row(doc_id=1, text="table data vector spark customer " * 10,
            lang="en", source="s1", n_chars=330),
        Row(doc_id=2, text="short one", lang="en", source="s2", n_chars=9),
    ])
    p = DocumentProcessor(
        spark, store_root=str(tmp_path_factory.mktemp("store"))
    )
    p.process_documents(docs)
    return p


def test_list_documents(proc):
    rows = proc.get_documents().collect()
    assert [r.doc_id for r in rows] == [1, 2]
    assert rows[0].total_chunks > 1


def test_document_info_roundtrip(proc):
    info = proc.get_document_info(1)
    assert info["filename"] == "doc_1.txt"
    assert len(info["chunks"]) == info["total_chunks"]
    assert all(c["doc_id"] == 1 for c in info["chunks"])
    assert len(info["charts"]) > 0  # 'table'/'vector' markers
    assert proc.get_document_info(999) is None


def test_chunk_range(proc):
    rows = proc.get_document_chunks(1, start_chunk=0, end_chunk=1).collect()
    assert [r.chunk_index for r in rows] == [0, 1]


def test_update_and_delete(proc):
    proc.update_document(2, {"lang": "de"})
    assert proc.get_document_info(2)["lang"] == "de"
    proc.delete_document(2)
    assert proc.get_document_info(2) is None
    assert proc.get_document_chunks(2).count() == 0
    assert proc.get_document_info(1) is not None


def test_upload_document_lands_for_watcher(tmp_path, spark):
    """upload_document drops a file the streaming watcher ingests on
    its next micro-batch — POST /documents/upload parity end to end."""
    from document_parsing_etl_pipeline_spark.processor import (
        DocumentProcessor,
    )
    from document_parsing_etl_pipeline_spark.streaming import watcher

    proc = DocumentProcessor(spark)
    watch = str(tmp_path / "drops")
    path = proc.upload_document(
        7, "uploaded text body with several words", watch
    )
    assert path.endswith("upload_doc_7.json")
    q = watcher.start_pipeline(
        spark, watch, str(tmp_path / "out"), str(tmp_path / "cp"),
        available_now=True,
    )
    q.awaitTermination(120)
    chunks = spark.read.parquet(str(tmp_path / "out"))
    assert chunks.where(chunks.doc_id == 7).count() >= 1
    # re-upload overwrites the same drop file (idempotent landing)
    assert proc.upload_document(7, "new body", watch) == path
