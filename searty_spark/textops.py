"""Text-analysis operators for a training-data pipeline: token counting,
quality scoring, fingerprinting, language stats. All pure Spark SQL
expressions (JVM-side, whole-stage codegen) over the documents table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def words_col(text_col: str = "text"):
    return F.split(F.col(text_col), " ")


def token_count(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens) — whitespace tokenization."""
    return docs.select(
        "doc_id", F.size(words_col()).cast("long").alias("n_tokens")
    ).orderBy("doc_id")


def quality_score(docs: DataFrame) -> DataFrame:
    """Per-doc quality features: length, lexical diversity, stopword
    ratio, mean token length. A 100-TB pipeline would threshold on
    these columns to filter the corpus; all JVM-side."""
    w = words_col()
    n_tok = F.size(w).cast("long")
    n_uniq = F.size(F.array_distinct(w)).cast("long")
    n_stop = F.size(F.filter(w, lambda x: x.isin(STOPWORDS))).cast("long")
    return docs.select(
        "doc_id",
        F.char_length("text").cast("long").alias("n_chars"),
        n_tok.alias("n_tokens"),
        n_uniq.alias("n_uniq_tokens"),
        F.round(n_uniq / n_tok, 6).alias("uniq_ratio"),
        F.round(n_stop / n_tok, 6).alias("stopword_ratio"),
        F.round(
            (F.char_length("text") - n_tok + 1) / n_tok, 6
        ).alias("avg_token_len"),
    ).orderBy("doc_id")


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fp) — order-insensitive content fingerprint: md5 over
    the sorted distinct token set. Used for near-dup bucketing and
    incremental re-crawl detection."""
    return docs.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(words_col())))).alias("fp"),
    ).orderBy("doc_id")


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang) — charset heuristic language ID: multibyte
    (octet_length > char_length) => 'cjk', else 'latin'. The synthetic
    corpora are ASCII so this is exercised by searty_spark's own 'ja'
    corpus slice in tests."""
    return docs.select(
        "doc_id",
        F.when(F.octet_length("text") > F.char_length("text"), "cjk")
        .otherwise("latin")
        .alias("pred_lang"),
    ).orderBy("doc_id")


def lang_stats(docs: DataFrame) -> DataFrame:
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg(F.char_length("text")), 6).alias("avg_chars"),
        )
        .orderBy("lang")
    )
