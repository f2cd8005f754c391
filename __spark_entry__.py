"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship pipeline on sf0.001 (parse → chunk → NER →
                doc-store rollup).
queries()     — one entry per implemented operator from SURVEY.md §2.
oracle_sql()  — DuckDB-equivalent SQL per query (omitted only for the
                non-SQL-expressible entries — binary decode
                [mm_image_pipeline, mm_audio_features, mm_video_frames] and the
                iterative eigensolve/clustering pair
                [q_pca_projection, q_kmeans_clusters] — which get the
                weaker rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from document_parsing_etl_pipeline_spark.plans.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full parse pipeline document rollup at sf0.001."""
    return QUERIES["q_documents_list"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
