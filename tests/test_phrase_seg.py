"""Segment-path phrase search must equal the oracle and the DF path."""

import pytest

from searty_spark import oracle as O
from searty_spark.build import build_postings, doc_stats
from searty_spark.phrase_seg import phrase_ranges_segments, phrase_search_segments
from searty_spark.segments import build_segments

QUERIES = ["shared phrase marker", "abcabc", "aaaa", "ab", "zzqzzqzz", "marker"]


@pytest.fixture(scope="module")
def seg_df(small_corpus):
    p = build_postings(small_corpus)
    s = doc_stats(small_corpus)
    return build_segments(p, s, n_shards=3, n_buckets=8, block_size=16).cache()


@pytest.mark.parametrize("query", QUERIES)
def test_phrase_ranges_segments_match_oracle(seg_df, oracle_index, query):
    got = [
        (r["doc_id"], r["start"], r["end"])
        for r in phrase_ranges_segments(seg_df, query).collect()
    ]
    assert got == O.match_ranges(oracle_index, query), f"query={query!r}"


@pytest.mark.parametrize("query", QUERIES)
def test_phrase_search_segments_match_oracle(seg_df, oracle_index, query):
    got = [r["doc_id"] for r in phrase_search_segments(seg_df, query).collect()]
    assert got == O.phrase_doc_ids(oracle_index, query), f"query={query!r}"
