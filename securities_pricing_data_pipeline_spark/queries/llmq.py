"""LLM-training-data pipeline operators over `documents` / `embeddings`
(query-registry adapters; implementations live in
``securities_pricing_data_pipeline_spark/llmdata/``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from securities_pricing_data_pipeline_spark.llmdata.dedup import exact_dedup
from securities_pricing_data_pipeline_spark.llmdata.text import (
    fingerprint_md5,
    token_count,
    quality_score,
)
from securities_pricing_data_pipeline_spark.queries.helpers import load


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return exact_dedup(docs, text_col="text", id_col="doc_id")


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return token_count(docs)


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return quality_score(docs)


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return fingerprint_md5(docs)


QUERIES = {
    "dedup_exact": dedup_exact,
    "text_token_count": text_token_count,
    "text_quality_score": text_quality_score,
    "text_fingerprint": text_fingerprint,
}

ORACLES = {
    "dedup_exact": """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY text
""",
    "text_token_count": """
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tokens
FROM documents
""",
    "text_quality_score": """
SELECT doc_id,
       CAST(length(text) AS INT) AS n_chars,
       CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) AS n_tokens,
       CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS INT) AS n_punct,
       CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                            t -> lower(t) IN ('the','a','of','and','to','in','is'))) AS INT)
         AS n_stopwords
FROM documents
""",
    "text_fingerprint": """
SELECT doc_id, md5(lower(trim(text))) AS fingerprint FROM documents
""",
}
