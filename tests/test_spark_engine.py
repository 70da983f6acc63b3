"""Spark engine vs brute-force oracle on the synthetic corpus —
the rebuild's analogue of the reference's e2e snapshot tests
(lib/indexer/test/indexer_test.go:42-80, lib/searcher/searcher_test.go)."""

import pytest
from pyspark.sql import functions as F

from searty_spark import oracle as O
from searty_spark.build import build_postings, doc_stats, term_dictionary, term_df
from searty_spark.corpus import synth_corpus
from searty_spark.extract import extracted_text_col
from searty_spark.query import (
    bm25_topk,
    filename_search,
    phrase_match_ranges,
    phrase_search,
)

QUERIES = [
    "shared phrase marker",  # multi-doc phrase (FIXTURES.md §2)
    "abcabc",  # overlapping repeats -> coalescing
    "aaaa",  # duplicate trigram (reference panic case)
    "ab",  # sub-trigram -> empty
    "zzqzzqzz",  # absent -> empty
]


def test_corpus_deterministic_across_partitionings(spark):
    a = synth_corpus(spark, 60, seed=42, partitions=2).orderBy("doc_id").collect()
    b = synth_corpus(spark, 60, seed=42, partitions=7).orderBy("doc_id").collect()
    assert a == b


def test_extract_invariant_byte_identical(small_corpus):
    """north-rule per-row invariant: text == extract(html), every url."""
    bad = small_corpus.filter(extracted_text_col("html") != F.col("text")).count()
    assert bad == 0


def test_postings_match_oracle(small_corpus, oracle_index):
    rows = build_postings(small_corpus).collect()
    got = {(r["term"], r["doc_id"]): (r["tf"], r["positions"]) for r in rows}
    want = {
        (t, d): (len(ps), ps)
        for t, pl in oracle_index.postings.items()
        for d, ps in pl.items()
    }
    assert got == want


def test_doc_stats_match_oracle(small_corpus, oracle_index):
    got = {r["doc_id"]: r["doc_len"] for r in doc_stats(small_corpus).collect()}
    assert got == oracle_index.doc_len


def test_term_df_matches_oracle(small_corpus, oracle_index):
    p = build_postings(small_corpus)
    got = {r["term"]: r["df"] for r in term_df(p).collect()}
    want = {t: len(pl) for t, pl in oracle_index.postings.items()}
    assert got == want


def test_term_dictionary_dense_and_unique(small_corpus):
    p = build_postings(small_corpus)
    d = term_dictionary(p, method="rownum").collect()
    ids = sorted(r["token_id"] for r in d)
    assert ids == list(range(len(d)))
    dx = term_dictionary(p, method="xxhash64")
    assert dx.select("token_id").distinct().count() == len(d)


@pytest.mark.parametrize("query", ["marker", "shared phrase", "the", "abc"])
def test_bm25_matches_oracle(small_corpus, oracle_index, query):
    p = build_postings(small_corpus)
    s = doc_stats(small_corpus)
    got = [(r["doc_id"], r["score"]) for r in bm25_topk(p, s, query, k=20).collect()]
    want = O.bm25_topk(oracle_index, query, k=20)
    assert got == want, f"query={query!r}"


@pytest.mark.parametrize("query", QUERIES)
def test_phrase_matches_oracle(small_corpus, oracle_index, query):
    p = build_postings(small_corpus)
    got = [r["doc_id"] for r in phrase_search(p, query).collect()]
    assert got == O.phrase_doc_ids(oracle_index, query), f"query={query!r}"


@pytest.mark.parametrize("query", QUERIES)
def test_phrase_ranges_match_oracle(small_corpus, oracle_index, query):
    p = build_postings(small_corpus)
    got = [(r["doc_id"], r["start"], r["end"]) for r in phrase_match_ranges(p, query).collect()]
    assert got == O.match_ranges(oracle_index, query), f"query={query!r}"


def test_filename_search(small_corpus):
    got = filename_search(small_corpus, "example7.org").collect()
    assert all("example7.org" in r["url"] for r in got)
    assert len(got) == sum(
        1 for r in small_corpus.select("url").collect() if "example7.org" in r["url"]
    )
