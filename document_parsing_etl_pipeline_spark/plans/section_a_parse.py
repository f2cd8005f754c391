"""SURVEY §2.A — parse / chunk / NER / charts: the @register query
definitions for this section (split out of the former monolithic
plans/queries.py in round 11; shared helpers live in
plans/_prelude.py, re-exported through plans/queries.py).
Importing this module registers the queries into the shared
QUERIES/ORACLES dicts."""

from __future__ import annotations

from ._prelude import *  # noqa: F401,F403



@register("doc_normalize", """
SELECT doc_id,
       coalesce(array_to_string(regexp_extract_all(lower(text), '\\S+'), ' '),
                '') AS norm_text,
       length(coalesce(array_to_string(
                  regexp_extract_all(lower(text), '\\S+'), ' '), ''))
           AS norm_len
FROM documents
""")
def q_doc_normalize(spark, sf_dir):
    df = parse.normalize_documents(load_table(spark, sf_dir, "documents"))
    return _long(
        df.select("doc_id", "norm_text", F.length("norm_text").alias("norm_len")),
        "norm_len",
    )


@register("doc_metadata", """
SELECT doc_id, source, lang,
       length(text) AS char_count,
       len(regexp_extract_all(text, '\\S+')) AS word_count,
       len(regexp_split_to_array(text, '\\n')) AS line_count,
       CASE WHEN length(text) < 200 THEN 'small'
            WHEN length(text) < 400 THEN 'medium'
            ELSE 'large' END AS size_bucket
FROM documents
""")
def q_doc_metadata(spark, sf_dir):
    df = parse.document_metadata(load_table(spark, sf_dir, "documents"))
    return _long(df, "char_count", "word_count", "line_count")


@register("doc_chunk", f"WITH {CHUNK_CTE} SELECT * FROM chunks_f")
def q_doc_chunk(spark, sf_dir):
    df = chunking.chunk_documents(load_table(spark, sf_dir, "documents"))
    return _long(df, "chunk_index", "token_count")


@register("doc_chunk_stats", f"""
WITH {CHUNK_CTE}
SELECT doc_id, count(*) AS total_chunks,
       sum(token_count)::BIGINT AS total_tokens,
       max(token_count)::BIGINT AS max_chunk_tokens
FROM chunks_f GROUP BY doc_id
""")
def q_doc_chunk_stats(spark, sf_dir):
    df = chunking.chunk_stats(
        chunking.chunk_documents(load_table(spark, sf_dir, "documents"))
    )
    return _long(df, "total_chunks", "total_tokens", "max_chunk_tokens")


@register("doc_chunk_tokens", f"""
WITH words_t AS (
    SELECT doc_id, regexp_extract_all(text, '\\S+') AS words FROM documents
), idx AS (
    SELECT doc_id, words,
           unnest(generate_series(
               0, greatest(ceil(len(words) / {_TOK_CHUNK}.0)::BIGINT, 1) - 1))
               AS chunk_index
    FROM words_t
)
SELECT doc_id, chunk_index,
       coalesce(array_to_string(words[chunk_index*{_TOK_CHUNK}+1 :
                             chunk_index*{_TOK_CHUNK}+{_TOK_CHUNK}], ' '), '')
           AS text_content,
       len(words[chunk_index*{_TOK_CHUNK}+1 :
                 chunk_index*{_TOK_CHUNK}+{_TOK_CHUNK}]) AS token_count
FROM idx
""")
def q_doc_chunk_tokens(spark, sf_dir):
    df = chunking.chunk_documents_by_tokens(
        load_table(spark, sf_dir, "documents"), tokens_per_chunk=_TOK_CHUNK
    )
    return _long(df, "chunk_index", "token_count")


@register("ner_entities", _NER_ORACLE)
def q_ner_entities(spark, sf_dir):
    ch = chunking.chunk_documents(load_table(spark, sf_dir, "documents"))
    df = entities.entity_counts(ch.drop("token_count"), text_col="text_content")
    return _long(
        df, "chunk_index", "n_persons", "n_organizations", "n_dates",
        "n_locations", "n_misc",
    )


@register("entity_rollup", f"""
WITH {CHUNK_CTE}, ents AS (
    SELECT 'organization' AS entity_type,
           unnest(regexp_extract_all(text_content, '{entities.RE_ORG}')) AS term
    FROM chunks_f
    UNION ALL
    SELECT 'location', unnest(regexp_extract_all(text_content, '{entities.RE_LOC}'))
    FROM chunks_f
    UNION ALL
    SELECT 'date', unnest(regexp_extract_all(text_content, '{entities.RE_DATE}'))
    FROM chunks_f
)
SELECT entity_type, term, count(*) AS occurrences FROM ents
GROUP BY entity_type, term
""")
def q_entity_rollup(spark, sf_dir):
    ch = chunking.chunk_documents(load_table(spark, sf_dir, "documents"))
    return entities.entity_rollup(ch, text_col="text_content")


@register("chart_inventory", f"WITH {_CHARTS_CTE} SELECT * FROM charts_f")
def q_chart_inventory(spark, sf_dir):
    df = charts_op.chart_inventory(load_table(spark, sf_dir, "documents"))
    return _long(
        df.select("doc_id", "chart_type", "chart_index", "image_path"),
        "chart_index",
    )


@register("ner_gazetteer_join", f"""
WITH gaz(term, entity_type) AS (VALUES {_gazetteer_values()}),
toks AS (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '\\S+')) AS term
    FROM documents
)
SELECT t.doc_id, g.entity_type,
       count(*) AS n_mentions,
       count(DISTINCT t.term) AS n_distinct_terms
FROM toks t JOIN gaz g USING (term)
GROUP BY t.doc_id, g.entity_type
""")
def q_ner_gazetteer_join(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    gaz = entities.default_gazetteer(spark)
    return entities.gazetteer_join_entities(docs, gaz)


@register("q_source_quality", """
WITH q AS (
    SELECT d.source,
           round(len(list_distinct(regexp_extract_all(d.text, '\\S+')))
                 / greatest(len(regexp_extract_all(d.text, '\\S+')), 1), 4)
               AS unique_ratio,
           len(regexp_extract_all(d.text, '\\S+')) AS word_count
    FROM documents d
)
SELECT source, count(*) AS n_docs,
       round(sum(unique_ratio::DECIMAL(18,6))::DOUBLE / count(*), 4)
           AS avg_unique_ratio,
       round(sum(word_count::DECIMAL(18,6))::DOUBLE / count(*), 2)
           AS avg_words
FROM q GROUP BY source
""")
def q_source_quality(spark, sf_dir):
    """Per-source quality report (the 'which crawl sources are junk'
    rollup; decimal-exact averages for parity)."""
    docs = load_table(spark, sf_dir, "documents")
    q = ta.quality_score(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    cnt = F.count("*")
    return q.groupBy("source").agg(
        cnt.alias("n_docs"),
        F.round(F.sum(_dec(F.col("unique_ratio"))).cast("double") / cnt, 4)
            .alias("avg_unique_ratio"),
        F.round(F.sum(_dec(F.col("word_count"))).cast("double") / cnt, 2)
            .alias("avg_words"),
    )
