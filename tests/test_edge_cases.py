"""Degenerate-corpus edges: single doc, empty shards, doc shorter than
a trigram — the full build/query lifecycle must stay well-defined."""

import datetime

from searty_spark.index import load_segments, query_index, write_index
from searty_spark.schema import WEBPAGES


def _one_doc_corpus(spark, text="tiny document body"):
    rows = [
        (0, "https://one/0", datetime.datetime(2024, 1, 1), b"<p>x</p>", text, "en")
    ]
    return spark.createDataFrame(rows, WEBPAGES)


def test_single_doc_index_with_empty_shards(spark, tmp_path):
    corpus = _one_doc_corpus(spark)
    d = str(tmp_path / "one")
    write_index(corpus, d, n_shards=4, n_buckets=4)
    seg = load_segments(spark, d)
    assert seg.select("shard").distinct().count() == 1  # 3 shards empty
    top = query_index(spark, d, "tiny", k=5).collect()
    assert [r["doc_id"] for r in top] == [0]
    assert query_index(spark, d, "zzz", k=5).count() == 0


def test_sub_trigram_docs_index_cleanly(spark, tmp_path):
    rows = [
        (0, "u0", datetime.datetime(2024, 1, 1), b"<p>x</p>", "ab", "en"),
        (1, "u1", datetime.datetime(2024, 1, 1), b"<p>x</p>", "hello world", "en"),
    ]
    corpus = spark.createDataFrame(rows, WEBPAGES)
    d = str(tmp_path / "sub")
    write_index(corpus, d, n_shards=2, n_buckets=2)
    assert query_index(spark, d, "hello", k=5).collect()[0]["doc_id"] == 1
    # doc 0 contributed nothing but didn't break the build
    seg = load_segments(spark, d)
    assert seg.filter(seg["term"] == "ab").count() == 0
