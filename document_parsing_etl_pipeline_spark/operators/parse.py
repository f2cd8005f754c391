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

TOKEN = r"\S+"  # token = non-whitespace run (== Python str.split())


def tokens(c) -> "F.Column":
    return F.regexp_extract_all(F.lower(c), F.lit(TOKEN), 0)


def normalize_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace-normalize + lowercase → `norm_text`
    (== ``" ".join(text.lower().split())``)."""
    return docs.withColumn(
        "norm_text", F.array_join(tokens(F.col(text_col)), " ")
    )


def document_metadata(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document metadata projection.

    char_count/word_count/size_bucket mirror the reference watcher's
    metadata dict (page_count/file_size analogs for a text corpus).
    """
    word_count = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(TOKEN), 0)
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
