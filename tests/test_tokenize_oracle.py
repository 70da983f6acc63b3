"""Golden tokenizer vectors (ref lib/tokenizer/tokenizer_test.go:14-23)
and oracle semantics pinned by hand-checked micro-corpora."""

from searty_spark.oracle import (
    bm25_topk,
    build_index,
    match_ranges,
    phrase_doc_ids,
    phrase_match_starts,
)
from searty_spark.tokenize import tokenize


def test_tokenize_golden_ascii():
    assert tokenize("abcdefg") == ["abc", "bcd", "cde", "def", "efg"]


def test_tokenize_golden_multibyte():
    assert tokenize("あいうえお") == ["あいう", "いうえ", "うえお"]


def test_tokenize_short_inputs():
    assert tokenize("") == []
    assert tokenize("ab") == []
    assert tokenize("abc") == ["abc"]


def test_build_index_positions_are_sequence_indices():
    idx = build_index({7: "abcabc"})
    # tokens: abc(0) bca(1) cab(2) abc(3)
    assert idx.postings["abc"][7] == [0, 3]
    assert idx.postings["bca"][7] == [1]
    assert idx.doc_len[7] == 4


def test_phrase_search_basic():
    idx = build_index({1: "hello world", 2: "world hello", 3: "say hello world now"})
    assert phrase_doc_ids(idx, "hello world") == [1, 3]
    assert phrase_doc_ids(idx, "world") == [1, 2, 3]
    # all-or-nothing: one missing trigram kills the query (Q2)
    assert phrase_doc_ids(idx, "hello zzz") == []
    # sub-trigram query => empty
    assert phrase_doc_ids(idx, "he") == []


def test_phrase_duplicate_trigrams_no_panic():
    # the reference panics on 'aaaa' (phrase_searcher.go:26-32);
    # we define dedup-with-offsets semantics.
    idx = build_index({1: "xxaaaayy", 2: "xxaaayy"})
    assert phrase_doc_ids(idx, "aaaa") == [1]
    assert phrase_doc_ids(idx, "aaa") == [1, 2]


def test_match_ranges_coalescing():
    # "abcabc" query "abc": matches at 0 and 3, width 3 => ranges
    # [0,3) and [3,6) — start 3 <= end 3 => merged (ref merges on <=).
    idx = build_index({1: "abcabc"})
    assert match_ranges(idx, "abc") == [(1, 0, 6)]
    # non-overlapping: "abcXabc" -> [0,3) and [4,7) stay separate
    idx2 = build_index({1: "abcXabc"})
    assert match_ranges(idx2, "abc") == [(1, 0, 3), (1, 4, 7)]


def test_match_range_width_equals_query_length():
    idx = build_index({1: "say hello world now"})
    r = match_ranges(idx, "hello world")
    assert r == [(1, 4, 4 + len("hello world"))]


def test_phrase_match_starts_relative_positions():
    idx = build_index({1: "abcdefg"})
    assert phrase_match_starts(idx, 1, tokenize("abcde")) == [0]
    assert phrase_match_starts(idx, 1, tokenize("cdefg")) == [2]


def test_bm25_topk_ranks_higher_tf_first():
    idx = build_index({1: "foo bar baz", 2: "foo foo foo bar", 3: "quux corge"})
    top = bm25_topk(idx, "foo", k=10)
    assert [d for d, _ in top] == [2, 1]
    assert top[0][1] > top[1][1] > 0


def test_bm25_deterministic_tiebreak():
    idx = build_index({2: "same text", 1: "same text"})
    top = bm25_topk(idx, "same", k=10)
    assert [d for d, _ in top] == [1, 2]
    assert top[0][1] == top[1][1]
