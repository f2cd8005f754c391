"""Doc store: the engine's analog of the reference's Postgres schema.

Reference parity: tables documents / document_chunks / chart_data
(reference services/parser/src/database/schema.py:11-57) re-expressed
as partitioned parquet datasets written by Spark. JSON columns become
typed structs; auto-increment ids become deterministic content-derived
ids (idempotent re-ingest, no sequence bottleneck at 1000 executors).

Layout (under a root path):
    documents/   — bucketed by doc_id hash (``bucket`` partition col)
    chunks/      — same bucketing → doc⋈chunks co-partitioned
    charts/      — same bucketing

Bucketing by the join key means the API-surface queries
(detail/chunk-range/charts-by-doc) prune to one bucket and join
without a shuffle of the big side.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.chunking import chunk_documents, chunk_stats
from ..operators.charts import chart_inventory
from ..operators.entities import extract_entities

N_BUCKETS = 64


def _with_bucket(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(id_col)), F.lit(N_BUCKETS))
    )


def build_docstore(docs: DataFrame) -> dict[str, DataFrame]:
    """Run the full parse pipeline and produce the three store tables."""
    documents = docs.select(
        "doc_id",
        F.concat(F.lit("doc_"), F.col("doc_id").cast("string"), F.lit(".txt")).alias(
            "filename"
        ),
        "lang",
        "source",
        "n_chars",
    )
    # chunk records carry their entity annotations, mirroring
    # DocumentChunk.entities JSON (reference schema.py:17); arrays are
    # dropped in favor of the flat count + joined-term columns.
    chunks = extract_entities(
        chunk_documents(docs), text_col="text_content"
    )
    chunks = chunks.select(
        "doc_id", "chunk_index", "text_content", "token_count",
        F.concat_ws(",", "organizations").alias("org_terms"),
        "n_persons", "n_organizations", "n_dates", "n_locations", "n_misc",
    )
    stats = chunk_stats(chunks)
    documents = documents.join(stats, "doc_id", "left").fillna(
        {"total_chunks": 0, "total_tokens": 0}
    )
    charts = chart_inventory(docs)
    return {"documents": documents, "chunks": chunks, "charts": charts}


def write_docstore(tables: dict[str, DataFrame], root: str) -> None:
    for name, df in tables.items():
        (_with_bucket(df)
         .write.mode("overwrite")
         .partitionBy("bucket")
         .parquet(os.path.join(root, name)))


def write_bucketed_tables(
    tables: dict[str, DataFrame],
    database: str = "docstore",
    n_buckets: int = 8,
) -> None:
    """Persist the store as bucketed+sorted catalog tables.

    Hash-bucketing both sides of the doc_id join at write time means
    the API-surface joins (documents⋈chunks⋈charts) run WITHOUT a
    shuffle exchange — the physical property that matters most at
    100 TB, where re-shuffling the chunk table per query would
    dominate. Verified by plan assertion in tests.
    """
    spark = next(iter(tables.values())).sparkSession
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    for name, df in tables.items():
        (df.write.mode("overwrite")
         .bucketBy(n_buckets, "doc_id")
         .sortBy("doc_id")
         .format("parquet")
         .saveAsTable(f"{database}.{name}"))


def read_docstore(spark: SparkSession, root: str) -> dict[str, DataFrame]:
    return {
        name: spark.read.parquet(os.path.join(root, name))
        for name in ("documents", "chunks", "charts")
    }


def upsert_documents(existing: DataFrame, updates: DataFrame,
                     key: str = "doc_id") -> DataFrame:
    """MERGE semantics: rows in ``updates`` replace same-key rows in
    ``existing``; new keys append. Expressed as anti-join + union —
    the shuffle is on the key both sides, and with the bucketed store
    layout the anti-join co-partitions without an exchange.

    (BaseRepository.update/create parity at dataset scale; on a real
    deployment this is the Delta/Iceberg MERGE INTO statement.)
    """
    kept = existing.join(updates.select(key), key, "left_anti")
    return kept.unionByName(updates.select(*existing.columns))


# ----------------------------- repository-surface update/delete parity

def update_document_meta(documents: DataFrame, doc_id: int,
                         updates: dict) -> DataFrame:
    """BaseRepository.update parity (reference base.py:38-53):
    overwrite columns for one id — expressed as a declarative
    projection (at scale this is a MERGE against the store)."""
    out = documents
    for col, val in updates.items():
        out = out.withColumn(
            col,
            F.when(F.col("doc_id") == doc_id, F.lit(val)).otherwise(F.col(col)),
        )
    return out


def delete_document(tables: dict[str, DataFrame], doc_id: int) -> dict[str, DataFrame]:
    """Cascade delete parity (reference schema.py:43-44 cascade):
    anti-filter on every table of the store."""
    return {
        name: df.where(F.col("doc_id") != doc_id)
        for name, df in tables.items()
    }
