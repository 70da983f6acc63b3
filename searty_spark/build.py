"""Index construction as DataFrame jobs (SURVEY.md §3.1).

Reference semantics re-expressed Spark-first:

- postings accumulation (ref lib/invertedindex/invertedindex.go:33-40,
  postinglist.go:51-74) -> one ``groupBy(term, doc_id)`` hash
  aggregation with map-side partial aggregation; positions collected
  ascending (``sort_array`` pins order regardless of shuffle).
- term-dictionary upsert (ref lib/indexer/indexer.go:90-102) ->
  ``distinct`` + dense id assignment. Two id methods:
  ``xxhash64`` (scale path: no global sort, stable under any
  partitioning, collision probability ~1e-12 at 10^9 terms) and
  ``rownum`` (dense 0..V-1 via a window, used where the oracle needs
  reproducible small ints).

Everything here is pure Spark SQL — whole-stage codegen end to end;
no Python in the hot path (tokenization is sequence/transform/substring,
see tokenize.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from searty_spark import NGRAM_N
from searty_spark.tokenize import trigrams_col


def token_rows(corpus: DataFrame, text_col: str = "text", n: int = NGRAM_N) -> DataFrame:
    """(doc_id, pos, term) — one row per token occurrence."""
    return corpus.select(
        "doc_id", F.posexplode(trigrams_col(text_col, n)).alias("pos", "term")
    )


def build_postings(
    corpus: DataFrame, text_col: str = "text", n: int = NGRAM_N, with_doc_len: bool = False
) -> DataFrame:
    """(term, doc_id, tf, positions[, doc_len]) — positions ascending (A2).

    ``with_doc_len`` threads doc_len through the aggregation key
    (functionally dependent on doc_id, so cardinality is unchanged) —
    this saves the segment builder a posting-sized shuffle join
    against the doc-stats table.
    """
    from searty_spark.session import spread_input

    corpus = spread_input(corpus)
    rows = corpus.select(
        "doc_id", F.posexplode(trigrams_col(text_col, n)).alias("pos", "term")
    ) if not with_doc_len else corpus.select(
        "doc_id",
        F.greatest(F.char_length(F.col(text_col)) - F.lit(n - 1), F.lit(0))
        .cast("long")
        .alias("doc_len"),
        F.posexplode(trigrams_col(text_col, n)).alias("pos", "term"),
    )
    keys = ["term", "doc_id"] if not with_doc_len else ["term", "doc_id", "doc_len"]
    out = rows.groupBy(*keys).agg(
        F.count("*").cast("int").alias("tf"),
        F.sort_array(F.collect_list("pos")).alias("positions"),
    )
    return out


def doc_stats(corpus: DataFrame, text_col: str = "text", n: int = NGRAM_N) -> DataFrame:
    """(doc_id, doc_len) — doc_len = token count = max(len - n + 1, 0).

    Computed from the text column directly (no shuffle), not from the
    postings table: identical by construction to the tokenizer output.
    """
    return corpus.select(
        "doc_id",
        F.greatest(F.char_length(F.col(text_col)) - F.lit(n - 1), F.lit(0))
        .cast("long")
        .alias("doc_len"),
    )


def corpus_stats(stats: DataFrame) -> DataFrame:
    """1-row (n_docs, avgdl) — joined (broadcast) into scoring plans."""
    return stats.agg(
        F.count("*").alias("n_docs"), F.avg("doc_len").alias("avgdl")
    )


def term_dictionary(postings: DataFrame, method: str = "xxhash64") -> DataFrame:
    """(term, token_id). ``postings`` may be any DF with a term column."""
    terms = postings.select("term").distinct()
    if method == "xxhash64":
        return terms.select("term", F.xxhash64("term").alias("token_id"))
    if method == "rownum":
        w = Window.orderBy("term")
        return terms.select(
            "term", (F.row_number().over(w) - 1).cast("long").alias("token_id")
        )
    raise ValueError(method)


def term_df(postings: DataFrame) -> DataFrame:
    """(term, df) — document frequency; (term, doc_id) is unique in
    postings so a plain count suffices."""
    return postings.groupBy("term").agg(F.count("*").alias("df"))
