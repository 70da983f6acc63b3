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
    # inline flags void everything (soundness: '(?i)spark' matches
    # 'SPARK', which lacks 'spark''s trigrams; '(?x)' drops literal
    # whitespace) — bail to the unpruned scan
    "(?i)spark": [],
    "(?i:spark)join": [],
    "(?ix-m:ab)cde": [],
    "(?x)a b c": [],
    "(?s)abc.def": ["abc", "def"],  # s only changes '.', runs unaffected
    "(?:spark)join": ["join"],      # plain non-capturing group: no flags
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


def test_required_literals_sound_property():
    """Property (hypothesis): for any pattern built from a constrained
    grammar and any matching text, EVERY required literal is a
    substring of the text — the soundness contract that makes index
    pruning safe."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    atom = st.one_of(
        st.text(alphabet="abcxyz ", min_size=1, max_size=6),  # literal run
        st.sampled_from(
            [".", "[ab]", "(de|fg)", "x?", "y*", "z+", r"\d", "(hi)?",
             "(?i:de)", "(?i)", "(?s:fg)"]
        ),
    )
    patterns = st.lists(atom, min_size=1, max_size=6).map("".join)

    @settings(max_examples=300, deadline=None)
    @given(patterns, st.data())
    def check(pattern, data):
        try:
            rx = re.compile(pattern)
        except re.error:
            return
        lits = required_literals(pattern)
        # generate a text and only test when it matches
        # uppercase letters so an unsound '(?i)' extraction would be
        # caught: '(?i)abc' matches 'ABC', which contains no lowercase run
        text = data.draw(st.text(alphabet="abcdexyz hifg0123ABCXYZ", max_size=40))
        if rx.search(text) is None:
            return
        for lit in lits:
            assert lit in text, (pattern, lits, text)

    check()
