"""LLM-training-data pipeline operators over `documents` / `embeddings`
(query-registry adapters; implementations live in
``securities_pricing_data_pipeline_spark/llmdata/``), plus the as-of join
extension over events×bars."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from securities_pricing_data_pipeline_spark.llmdata.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dups,
)
from securities_pricing_data_pipeline_spark.llmdata.multimodal import (
    assets_from_documents,
    extract_features,
)
from securities_pricing_data_pipeline_spark.llmdata.similarity import brute_force_topk, lsh_topk
from securities_pricing_data_pipeline_spark.llmdata.text import (
    fingerprint_md5,
    lang_id,
    token_count,
    quality_score,
)
from securities_pricing_data_pipeline_spark.operators.asof import asof_join_backward
from securities_pricing_data_pipeline_spark.queries.bars import BARS_SQL, bars_df
from securities_pricing_data_pipeline_spark.queries.helpers import load


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return exact_dedup(docs, text_col="text", id_col="doc_id")


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, n=3, threshold=0.8)


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, n=3, threshold=0.5)


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return simhash_near_dups(docs, max_hamming=3)


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return token_count(docs)


def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return quality_score(docs)


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return fingerprint_md5(docs)


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return lang_id(docs)


def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return brute_force_topk(emb, queries, k=5)


def sim_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return lsh_topk(emb, queries, k=5)


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return extract_features(assets_from_documents(docs))


def asof_event_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event is aligned to the most recent bar of its
    symbol at-or-before a deterministic in-range event date."""
    ev = load(spark, sf_dir, "events")
    micros = F.expr("ts div 1000")
    offset = (F.dayofmonth(F.timestamp_micros(micros)) * 73 + F.col("user_id") * 7) % 2400
    left = ev.select(
        "event_id",
        F.concat(F.lit("P"), (F.col("user_id") % 200).cast("string")).alias("symbol"),
        F.date_add(F.lit("1995-01-01").cast("date"), offset.cast("int")).alias("event_date"),
    )
    b = bars_df(spark, sf_dir).select("symbol", "trade_date", F.col("close").cast("double").alias("close"))
    joined = asof_join_backward(
        left, b, key=["symbol"], left_time="event_date", right_time="trade_date",
        value_cols=["close"],
    )
    return joined.filter(F.col("asof_time").isNotNull()).select(
        "event_id", "symbol", "event_date", F.col("asof_time").alias("bar_date"), "close"
    )


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "text_token_count": text_token_count,
    "text_quality_score": text_quality_score,
    "text_fingerprint": text_fingerprint,
    "text_lang_id": text_lang_id,
    "sim_bruteforce_topk": sim_bruteforce_topk,
    "sim_lsh_topk": sim_lsh_topk,
    "multimodal_features": multimodal_features,
    "asof_event_bars": asof_event_bars,
}

# integer-grid dot product (parity with llmdata/similarity.py: snap each
# elementwise product to 1e-13 units, fold as exact integers)
def _dot_sql(a: str, b: str) -> str:
    return (
        f"CAST(list_sum(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(round(p[1] * p[2] * 1e13) AS BIGINT))) AS DOUBLE)"
    )


def _cos_expr(a: str, b: str) -> str:
    return f"({_dot_sql(a, b)}) / sqrt(({_dot_sql(a, a)}) * ({_dot_sql(b, b)}))"


ORACLES = {
    "dedup_exact": """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
FROM documents GROUP BY text
""",
    "dedup_ngram_jaccard": """
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t FROM documents
), grams AS (
  SELECT doc_id, unnest([array_to_string(t[i+1:i+3], ' ') for i in range(len(t) - 2)]) AS g
  FROM toks
), sh AS (
  SELECT DISTINCT doc_id, g FROM grams
), cnt AS (
  SELECT doc_id, COUNT(*) AS c FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, CAST(i AS DOUBLE) / (ca.c + cb.c - i) AS jaccard
FROM inter
JOIN cnt ca ON id_a = ca.doc_id
JOIN cnt cb ON id_b = cb.doc_id
WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= 0.8
""",
    "text_lang_id": """
WITH toks AS (
  SELECT doc_id, text, list_distinct(string_split_regex(lower(trim(text)), '\\s+')) AS t
  FROM documents
), hits AS (
  SELECT doc_id, text, 'en' AS lang,
         len(list_intersect(t, ['the','and','of','to','in','is','that','it','for','was'])) AS h FROM toks
  UNION ALL
  SELECT doc_id, text, 'es',
         len(list_intersect(t, ['el','la','de','que','y','en','los','del','se','las'])) FROM toks
  UNION ALL
  SELECT doc_id, text, 'de',
         len(list_intersect(t, ['der','die','und','das','von','zu','den','mit','ist','im'])) FROM toks
  UNION ALL
  SELECT doc_id, text, 'fr',
         len(list_intersect(t, ['le','la','de','et','les','des','en','du','une','est'])) FROM toks
), best AS (
  SELECT doc_id, text, lang, h,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY h DESC, lang DESC) AS rn
  FROM hits
)
SELECT doc_id,
       CASE WHEN length(regexp_replace(text, '[^一-鿿]', '', 'g')) * 2 > length(text) THEN 'zh'
            WHEN h > 0 THEN lang
            ELSE 'und' END AS pred_lang
FROM best WHERE rn = 1
""",
    "sim_bruteforce_topk": f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id < 10
), c AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings
), scored AS (
  SELECT query_id, neighbor_id, {_cos_expr('qv', 'cv')} AS cos_sim
  FROM c, q WHERE neighbor_id != query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cos_sim, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 5
""",
    "multimodal_features": """
SELECT doc_id AS asset_id, 'image' AS media_type,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       md5(text) AS digest
FROM documents
""",
    "asof_event_bars": BARS_SQL
    + """
, ev AS (
  SELECT event_id,
         'P' || CAST(user_id % 200 AS VARCHAR) AS symbol,
         DATE '1995-01-01'
           + CAST((EXTRACT(DAY FROM ts) * 73 + user_id * 7) % 2400 AS INT) AS event_date
  FROM events
)
SELECT e.event_id, e.symbol, e.event_date, b.trade_date AS bar_date,
       CAST(b.close AS DOUBLE) AS close
FROM ev e ASOF JOIN bars b
  ON e.symbol = b.symbol AND e.event_date >= b.trade_date
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
