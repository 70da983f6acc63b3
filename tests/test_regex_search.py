"""Trigram-accelerated regex search: the literal extractor must be
SOUND (never prunes a true match) and the end result must equal the
brute-force regex scan exactly."""

import pytest
from pyspark.sql import functions as F

from searty_spark.build import build_postings
from searty_spark.query import regex_search, required_literals

EXTRACT_CASES = {
    "spark (join|table)": ["spark "],
    "a|b": [],                      # top-level alternation: nothing required
    "abc.def": ["abc", "def"],
    "xyzw?": ["xyz"],               # optional char dropped
    "xyz{2}": ["xyz"],              # {2,}: char kept
    "ab{0,3}cde": ["cde"],          # {0,..}: char dropped ('a' run too short)
    r"a\.bcd": ["a.bcd"],           # escaped special is a literal
    r"a\d+bcd": ["bcd"],            # \d is a class, breaks the run
    "(x|y)spark": ["spark"],        # group alternation doesn't void outer
    "abc(de)*": ["abc"],
    "[abc]xyz[^d]": ["xyz"],
    "^hello$": ["hello"],
    "...": [],
}


@pytest.mark.parametrize("pattern,want", EXTRACT_CASES.items())
def test_required_literals(pattern, want):
    assert required_literals(pattern) == want


@pytest.mark.parametrize(
    "pattern",
    [
        "shared (phrase|thing)",    # literal-pruned
        "sha.ed phrase",            # two literals
        "m[a-z]rker",               # no usable literal -> full verify scan
        "zzq+zzq",                  # no matches
        "spark|marker",             # top-level alternation
    ],
)
def test_regex_search_equals_brute_scan(spark, small_corpus, pattern):
    from searty_spark.build import doc_stats
    from searty_spark.query import regex_search_segments
    from searty_spark.segments import build_segments

    p = build_postings(small_corpus)
    got = [r["doc_id"] for r in regex_search(small_corpus, p, pattern).collect()]
    want = [
        r["doc_id"]
        for r in small_corpus.filter(F.col("text").rlike(pattern))
        .select("doc_id")
        .orderBy("doc_id")
        .collect()
    ]
    assert got == want, pattern
    seg = build_segments(p, doc_stats(small_corpus), n_shards=2, n_buckets=4)
    got_seg = [
        r["doc_id"]
        for r in regex_search_segments(small_corpus, seg, pattern, n_shards=2).collect()
    ]
    assert got_seg == want, pattern
