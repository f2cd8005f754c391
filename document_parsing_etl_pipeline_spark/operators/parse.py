"""Document parse stage: normalization + metadata extraction.

Reference parity: docling conversion post-processing and PyMuPDF
metadata extraction (reference services/parser/main.py:58-83 — page
count / file size / extraction date become char/word/line counts and a
size bucket on the text-native documents table).

All ops are narrow per-row projections: no shuffle, fully inside
whole-stage codegen, linear scale to 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# One canonical whitespace regex used across parse/chunk/NER so token
# boundaries agree between stages (and with the DuckDB oracles).
WS = r"\s+"


def normalize_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Trim, collapse whitespace runs, lowercase → `norm_text`."""
    return docs.withColumn(
        "norm_text",
        F.lower(F.regexp_replace(F.trim(F.col(text_col)), WS, " ")),
    )


def document_metadata(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document metadata projection.

    char_count/word_count/size_bucket mirror the reference watcher's
    metadata dict (page_count/file_size analogs for a text corpus).
    """
    trimmed = F.trim(F.col(text_col))
    word_count = F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, WS))
    )
    return docs.select(
        "doc_id",
        "source",
        "lang",
        F.length(F.col(text_col)).alias("char_count"),
        word_count.alias("word_count"),
        (F.size(F.split(F.col(text_col), r"\n")) ).alias("line_count"),
        F.when(F.length(F.col(text_col)) < 200, F.lit("small"))
        .when(F.length(F.col(text_col)) < 400, F.lit("medium"))
        .otherwise(F.lit("large"))
        .alias("size_bucket"),
    )
