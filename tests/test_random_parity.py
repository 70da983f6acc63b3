"""Seeded randomized parity sweep: for dozens of random queries
(substrings actually present in docs, absent strings, multibyte), the
DataFrame path, the compressed segment path and the brute-force oracle
must agree exactly — a randomized version of the reference's snapshot
methodology."""

import numpy as np
import pytest

from searty_spark import oracle as O
from searty_spark.build import build_postings, doc_stats
from searty_spark.phrase_seg import phrase_ranges_segments
from searty_spark.query import bm25_topk, phrase_match_ranges
from searty_spark.segments import build_segments
from searty_spark.wand import wand_topk


def _random_queries(oracle_index, n=24, seed=1234):
    rng = np.random.default_rng(seed)
    doc_ids = sorted(oracle_index.doc_len)
    texts = {}  # rebuilt from postings: cheaper to take from conftest corpus
    qs = []
    # substrings of real docs (guaranteed hits)
    for _ in range(n // 2):
        t = None
        while not t:
            d = int(rng.choice(doc_ids))
            # reconstruct a snippet from any term occurrence
            terms = [x for x in oracle_index.postings if d in oracle_index.postings[x]]
            if terms:
                t = terms[int(rng.integers(len(terms)))]
        ln = int(rng.integers(3, 13))
        qs.append(t[: max(3, min(ln, len(t)))])
    # random garbage (mostly misses)
    alphabet = list("abcdefghij xyz")
    for _ in range(n // 4):
        qs.append("".join(rng.choice(alphabet, int(rng.integers(3, 10)))))
    # short + multibyte
    qs += ["ab", "あいう", "aaaa", " a ", "  "]
    return qs


@pytest.fixture(scope="module")
def everything(small_corpus):
    p = build_postings(small_corpus, with_doc_len=True)
    s = doc_stats(small_corpus)
    seg = build_segments(p, s, n_shards=3, n_buckets=8, block_size=8).cache()
    pc = p.drop("doc_len").cache()
    pc.count()
    seg.count()
    return pc, s.cache(), seg


def test_random_query_parity(everything, oracle_index):
    postings, dstats, seg = everything
    queries = _random_queries(oracle_index)
    assert len(queries) >= 20
    for q in queries:
        want_topk = O.bm25_topk(oracle_index, q, k=15)
        got_df = [(r["doc_id"], r["score"]) for r in bm25_topk(postings, dstats, q, k=15).collect()]
        got_seg = [(r["doc_id"], r["score"]) for r in wand_topk(seg, dstats, q, k=15).collect()]
        assert got_df == want_topk, f"DF bm25 mismatch for {q!r}"
        assert got_seg == want_topk, f"segment bm25 mismatch for {q!r}"

        want_ranges = O.match_ranges(oracle_index, q)
        got_r_df = [
            (r["doc_id"], r["start"], r["end"])
            for r in phrase_match_ranges(postings, q).collect()
        ]
        got_r_seg = [
            (r["doc_id"], r["start"], r["end"])
            for r in phrase_ranges_segments(seg, q).collect()
        ]
        assert got_r_df == want_ranges, f"DF ranges mismatch for {q!r}"
        assert got_r_seg == want_ranges, f"segment ranges mismatch for {q!r}"
