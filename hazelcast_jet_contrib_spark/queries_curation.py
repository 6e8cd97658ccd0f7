"""Training-data curation queries over the documents table: stratified
sampling, context-window packing, vocabulary building, PII redaction.
Every query is deterministic (LCG sample hash both engines can compute;
PII planted from doc_id identically on both sides), so the DuckDB
oracle pins exact row sets, not just shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hazelcast_jet_contrib_spark.operators.curation import (
    LCG_M,
    ngram_vocab,
    pack_token_budget,
    pii_match_counts,
    redact_pii,
    stratified_sample,
)
from hazelcast_jet_contrib_spark.registry import query, table

# rate thresholds, precomputed so the SQL literal and the Python int()
# truncation agree exactly
_T_EN = int(0.25 * LCG_M)  # 1073741824
_T_ZH = int(0.80 * LCG_M)  # 3435973836
_T_DEF = int(0.50 * LCG_M)  # 2147483648


@query(
    "stratified_sample_by_lang",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE (doc_id * 2654435761) % 4294967296 <
          CASE lang WHEN 'en' THEN {_T_EN} WHEN 'zh' THEN {_T_ZH}
               ELSE {_T_DEF} END
    """,
)
def stratified_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language Bernoulli sample (downsample English to
    25%, upweight Chinese to 80%, 50% elsewhere) — the corpus-rebalance
    primitive. Zero shuffle: the whole sample is a scan-level filter."""
    docs = table(spark, sf_dir, "documents")
    return stratified_sample(
        docs, "lang", "doc_id", rates={"en": 0.25, "zh": 0.80}, default_rate=0.50
    ).select("doc_id", "lang")


@query(
    "pack_token_budget_shards",
    oracle="""
    WITH s AS (
        SELECT doc_id, n_chars,
               CAST(((doc_id * 2654435761) % 4294967296) % 8 AS INT) AS shard
        FROM documents
    )
    SELECT doc_id, shard,
           CAST(FLOOR(COALESCE(SUM(n_chars) OVER (
               PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 2000.0)
           AS BIGINT) AS pack_id
    FROM s
    """,
)
def pack_token_budget_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing at a 2000-char budget across 8 hash
    shards: each shard packs independently (the window never sees more
    than ~1/8 of the corpus), so the plan scales by adding shards."""
    docs = table(spark, sf_dir, "documents")
    return pack_token_budget(
        docs, "doc_id", "n_chars", budget=2000, n_shards=8
    ).select("doc_id", "shard", "pack_id")


@query(
    "ngram_vocab_top100",
    oracle="""
    WITH toks AS (
        SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS t FROM documents
    ),
    grams AS (
        SELECT UNNEST(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS ngram
        FROM toks WHERE len(t) >= 2
    )
    SELECT ngram, CAST(COUNT(*) AS BIGINT) AS n
    FROM grams GROUP BY ngram
    ORDER BY n DESC, ngram LIMIT 100
    """,
)
def ngram_vocab_top100(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 word bigrams by corpus frequency — vocabulary building.
    One explode + one n-gram-keyed shuffle with map-side partials."""
    return ngram_vocab(table(spark, sf_dir, "documents"), "text", n=2, top_k=100)


# PII is planted deterministically from doc_id (the synthetic corpus has
# none) identically on both sides: every 7th doc an email, every 11th a
# phone number — so the redaction stats are non-trivial at every SF.
_PLANT_SQL = """
        SELECT lang,
               text ||
               CASE WHEN doc_id % 7 = 0
                    THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
                    ELSE '' END ||
               CASE WHEN doc_id % 11 = 0
                    THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                    ELSE '' END AS text
        FROM documents
"""


def _planted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    email = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(F.lit(" contact user"), F.col("doc_id").cast("string"), F.lit("@example.com")),
    ).otherwise(F.lit(""))
    phone = F.when(
        F.col("doc_id") % 11 == 0,
        F.concat(
            F.lit(" call +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    return docs.select("lang", F.concat("text", email, phone).alias("text"))


@query(
    "pii_redaction_stats",
    oracle=f"""
    WITH aug AS ({_PLANT_SQL}),
    m AS (
        SELECT lang,
               len(regexp_extract_all(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS n_email,
               len(regexp_extract_all(text,
                   '\\+?[0-9]{{1,3}}-[0-9]{{3}}-[0-9]{{4}}')) AS n_phone,
               length(text)
                 - length(regexp_replace(regexp_replace(regexp_replace(text,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '[PII]', 'g'),
                     '\\+?[0-9]{{1,3}}-[0-9]{{3}}-[0-9]{{4}}', '[PII]', 'g'),
                     '[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}\\.[0-9]{{1,3}}', '[PII]', 'g'))
                 AS removed
        FROM aug
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_email) AS BIGINT) AS n_emails,
           CAST(SUM(n_phone) AS BIGINT) AS n_phones,
           CAST(SUM(removed) AS BIGINT) AS chars_removed
    FROM m GROUP BY lang
    """,
)
def pii_redaction_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language PII audit over a corpus with planted emails/phones:
    match counts per kind plus characters removed by redaction. Pure
    Catalyst regex expressions — no Python anywhere in the row path."""
    aug = _planted(spark, sf_dir)
    counts = pii_match_counts("text")
    removed = F.length("text") - F.length(redact_pii("text"))
    return (
        aug.select(
            "lang",
            counts["email"].alias("n_email"),
            counts["phone"].alias("n_phone"),
            removed.alias("removed"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_email").cast("bigint").alias("n_emails"),
            F.sum("n_phone").cast("bigint").alias("n_phones"),
            F.sum("removed").cast("bigint").alias("chars_removed"),
        )
    )
