from pyspark.sql import Row

from document_parsing_etl_pipeline_spark.operators.chunking import (
    chunk_documents, chunk_stats,
)


def _docs(spark, *texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_exact_boundary(spark):
    # length == 2*chunk_size → exactly two full chunks
    df = _docs(spark, "x" * 240)
    rows = chunk_documents(df, chunk_size=120, min_chunk=20).collect()
    assert [r.chunk_index for r in rows] == [0, 1]
    assert all(len(r.text_content) == 120 for r in rows)


def test_short_trailing_chunk_dropped(spark):
    # 125 chars → idx0 (120) kept, idx1 (5 chars < min 20) dropped
    df = _docs(spark, "y" * 125)
    rows = chunk_documents(df, chunk_size=120, min_chunk=20).collect()
    assert [r.chunk_index for r in rows] == [0]


def test_short_doc_keeps_single_chunk(spark):
    # shorter than min_chunk, but it's chunk 0 → kept
    df = _docs(spark, "tiny")
    rows = chunk_documents(df).collect()
    assert len(rows) == 1 and rows[0].text_content == "tiny"


def test_empty_doc(spark):
    rows = chunk_documents(_docs(spark, "")).collect()
    assert len(rows) == 1
    assert rows[0].token_count == 0


def test_overlap(spark):
    df = _docs(spark, "abcdefghij")
    rows = chunk_documents(
        df, chunk_size=4, overlap=2, min_chunk=1
    ).orderBy("chunk_index").collect()
    assert [r.text_content for r in rows[:3]] == ["abcd", "cdef", "efgh"]


def test_token_count_matches_python_split(spark):
    df = _docs(spark, "one two  three\tfour")
    rows = chunk_documents(df).collect()
    assert rows[0].token_count == len("one two  three\tfour".split())


def test_chunk_stats(spark):
    df = _docs(spark, "a " * 200, "b")
    stats = {r.doc_id: r for r in chunk_stats(chunk_documents(df)).collect()}
    assert stats[0].total_chunks > 1
    assert stats[1].total_chunks == 1


def test_token_chunking_budget(spark):
    from document_parsing_etl_pipeline_spark.operators.chunking import (
        chunk_documents_by_tokens,
    )
    df = _docs(spark, " ".join(f"w{i}" for i in range(65)), "only three words")
    rows = chunk_documents_by_tokens(df, tokens_per_chunk=30).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    c0 = sorted(by_doc[0], key=lambda r: r.chunk_index)
    assert [r.token_count for r in c0] == [30, 30, 5]
    assert c0[0].text_content.startswith("w0 w1 ")
    assert c0[2].text_content == "w60 w61 w62 w63 w64"
    assert by_doc[1][0].token_count == 3


def test_sequence_pack_next_fit(spark):
    from pyspark.sql import Row
    from document_parsing_etl_pipeline_spark.operators.chunking import (
        sequence_pack,
    )
    chunks = spark.createDataFrame(
        [Row(doc_id=1, chunk_index=i, token_count=tc)
         for i, tc in enumerate([10, 20, 25, 48, 5])]
        + [Row(doc_id=2, chunk_index=0, token_count=60),
           Row(doc_id=2, chunk_index=1, token_count=10)]
    )
    rows = sequence_pack(chunks, budget=48).collect()
    d1 = sorted((r for r in rows if r.doc_id == 1),
                key=lambda r: r.chunk_index)
    assert [r.seq_id for r in d1] == [0, 0, 1, 2, 3]
    assert [r.seq_fill for r in d1] == [10, 30, 25, 48, 5]
    # an oversize first chunk owns seq 0 (next-fit never splits)
    d2 = sorted((r for r in rows if r.doc_id == 2),
                key=lambda r: r.chunk_index)
    assert [(r.seq_id, r.seq_fill) for r in d2] == [(0, 60), (1, 10)]
