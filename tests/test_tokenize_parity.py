"""The three tokenizer implementations (pure Python golden, SQL-native
column, Arrow pandas UDF) must agree on every corpus row — including
multibyte 'ja' docs and the sub-trigram edge doc."""

from pyspark.sql import functions as F

from searty_spark.tokenize import trigrams_col, trigrams_pandas_udf


def test_sql_and_pandas_tokenizers_agree(small_corpus, oracle_index):
    df = small_corpus.select(
        "doc_id",
        trigrams_col("text").alias("sql_toks"),
        trigrams_pandas_udf()(F.col("text")).alias("udf_toks"),
    )
    mismatch = df.filter(F.col("sql_toks") != F.col("udf_toks")).count()
    assert mismatch == 0
    # and both agree with the pure-Python oracle on token counts
    got = {r["doc_id"]: r["sql_toks"] for r in df.collect()}
    assert {d: len(t) for d, t in got.items()} == oracle_index.doc_len
