"""Training-data pipeline operators (dedup, similarity, text analysis,
multimodal) over documents/embeddings/events. Filled in incrementally;
each gets a registry entry + oracle where SQL-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    fingerprint, oracle_fingerprint, oracle_stopword_count,
    oracle_token_count, stopword_count, token_count,
)
from ..registry import query
from ..tables import load


@query(
    "x01_dedup_exact",
    oracle=f"""
    SELECT MIN(doc_id) AS keep_doc_id, COUNT(*) AS dup_count,
           {oracle_fingerprint('text')} AS fp
    FROM documents
    GROUP BY {oracle_fingerprint('text')}
    """,
)
def x01_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content fingerprint hash-groupBy: canonical doc per
    duplicate cluster + cluster size. At 100 TB: one shuffle on a 60-bit
    key, partial-agg'd map-side; the fingerprint is computed in-scan."""
    d = load(spark, sf_dir, "documents")
    return (
        d.withColumn("fp", fingerprint("text"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("dup_count"))
        .select("keep_doc_id", "dup_count", "fp")
    )


@query(
    "x02_text_quality",
    oracle=f"""
    SELECT doc_id,
           {oracle_token_count('text')} AS n_tokens,
           {oracle_stopword_count('text')} AS n_stopwords,
           CAST(length(text) AS BIGINT) AS n_chars_measured,
           CAST(FLOOR({oracle_stopword_count('text')} * 1000000.0 / {oracle_token_count('text')} + 0.5) AS BIGINT) / 1000000.0 AS stopword_ratio
    FROM documents
    """,
)
def x02_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text quality features: token count, stopword count/ratio, length —
    all JVM-side array/higher-order functions, no Python UDF."""
    d = load(spark, sf_dir, "documents")
    nt = token_count("text")
    ns = stopword_count("text")
    return d.select(
        "doc_id",
        nt.alias("n_tokens"),
        ns.alias("n_stopwords"),
        F.length("text").cast("long").alias("n_chars_measured"),
        (F.floor(ns * F.lit(1000000.0) / nt + F.lit(0.5)) / F.lit(1000000.0)).alias("stopword_ratio"),
    )
