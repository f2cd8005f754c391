"""PySpark-native document-parsing ETL engine.

A from-scratch Spark re-expression of the capabilities of
danielsyahputra/document-parsing-etl-pipeline (see SURVEY.md): document
ingest → parse → chunk → NER → chart extraction → doc-store persistence
+ the relational query surface of its API layer, plus LLM-data-pipeline
operators (dedup, similarity search, multimodal columns, text analysis)
designed for 100 TB scale.
"""

__version__ = "0.1.0"
