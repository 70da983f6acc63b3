"""Lisp analyzer wired into the on-disk index (SURVEY.md T2 -> A/Q):
kind-composite token identity, kind-filtered query, analyzer guards.

The kind column is the reference's declared-but-never-written
token.kind (ref lib/database/schema.sql:12-16); here it is realized as
the (kind, term) composite key so every index/query path applies
unchanged and kind filtering is an ordinary pushed-down term lookup.
"""

import math

import pytest
from pyspark.sql import functions as F

from searty_spark import BM25_K1
from searty_spark.index import (
    lisp_term,
    load_stats,
    query_index,
    query_index_lisp,
    write_index,
)

# 'target' appears as a SYMBOL in docs 0 and 1, but ONLY inside a
# string (doc 2) or a comment (doc 3) — the kind filter must see
# exactly docs {0, 1}.
DOCS = [
    (0, "u0", "(defun target (x) (+ x 1)) (target 2)"),
    (1, "u1", "(let ((target 3)) target target)"),
    (2, "u2", '(print "target target target")'),
    (3, "u3", "(foo) ; target target\n(bar)"),
    (4, "u4", "#|target|# (baz)"),
]


@pytest.fixture(scope="module")
def lisp_idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("lispidx") / "idx")
    corpus = spark.createDataFrame(DOCS, "doc_id long, url string, text string")
    write_index(corpus, d, n_shards=2, n_buckets=4, analyzer="lisp")
    return d


def _brute_scores(symbol: str):
    """Driver-side oracle: BM25 over SYMBOL-kind occurrences only."""
    from searty_spark.lisp_tokenizer import lisp_tokenize

    toks = {i: lisp_tokenize(t) for i, _, t in DOCS}
    dls = {i: len(ts) for i, ts in toks.items()}
    tf = {
        i: sum(1 for term, _, kind in ts if kind == "SYMBOL" and term == symbol)
        for i, ts in toks.items()
    }
    tf = {i: v for i, v in tf.items() if v}
    n, avgdl = len(DOCS), sum(dls.values()) / len(DOCS)
    idf = math.log((n - len(tf) + 0.5) / (len(tf) + 0.5) + 1.0)
    out = {
        i: round(idf * v * (BM25_K1 + 1.0) / (v + BM25_K1 * (0.25 + 0.75 * dls[i] / avgdl)), 6)
        for i, v in tf.items()
    }
    return sorted(out.items(), key=lambda kv: (-kv[1], kv[0]))


def test_lisp_index_kind_filtered_query(spark, lisp_idx):
    got = [(r["doc_id"], r["score"]) for r in query_index_lisp(spark, lisp_idx, "target").collect()]
    assert [d for d, _ in got] == [1, 0]  # docs 2/3/4 excluded by kind
    assert got == _brute_scores("target")


def test_lisp_index_stats_and_doclen(spark, lisp_idx):
    stats = load_stats(lisp_idx)
    assert stats["analyzer"] == "lisp"
    ds = {r["doc_id"]: r["doc_len"] for r in spark.read.parquet(lisp_idx + "/docstats").collect()}
    from searty_spark.lisp_tokenizer import lisp_tokenize

    assert ds == {i: len(lisp_tokenize(t)) for i, _, t in DOCS}


def test_lisp_dictionary_is_kind_composite(spark, lisp_idx):
    terms = {r["term"] for r in spark.read.parquet(lisp_idx + "/dictionary").collect()}
    assert lisp_term("SYMBOL", "target") in terms
    assert lisp_term("STRING", '"target target target"') in terms
    assert lisp_term("LINE_COMMENT", " target target") in terms


def test_analyzer_guards(spark, lisp_idx, small_corpus, tmp_path_factory):
    from searty_spark.merge import merge_indexes

    with pytest.raises(ValueError, match="query_index_lisp"):
        query_index(spark, lisp_idx, "target")
    tri = str(tmp_path_factory.mktemp("tri") / "idx")
    write_index(small_corpus.filter(F.col("doc_id") < 10), tri, n_shards=2, n_buckets=4)
    with pytest.raises(ValueError, match="not 'lisp'"):
        query_index_lisp(spark, tri, "target")
    with pytest.raises(ValueError, match="different analyzers"):
        merge_indexes(spark, [tri, lisp_idx], str(tmp_path_factory.mktemp("m") / "idx"))
