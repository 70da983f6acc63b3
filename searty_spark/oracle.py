"""Brute-force pure-Python oracle.

Replicates, from scratch, the observable semantics of the reference's
searcher pipeline (SURVEY.md Q1-Q8; lib/searcher/phrase_searcher.go:211-245)
plus the BM25 scorer the north rule requires (the reference ships no
scorer — SURVEY.md §2.6 defines it: Okapi BM25, k1=1.2, b=0.75,
idf = ln((N-df+0.5)/(df+0.5)+1)).

The Spark engine must be rank- and score-identical to this module on
every test corpus. Nothing here is distributed — it exists only as the
correctness yardstick, mirroring the reference's snapshot methodology
(lib/testutil/snapshot.go:15-26).
"""

from __future__ import annotations

import math
from collections import defaultdict
from dataclasses import dataclass

from searty_spark import BM25_B, BM25_K1, NGRAM_N, SCORE_NDIGITS
from searty_spark.tokenize import tokenize


@dataclass
class OracleIndex:
    # term -> {doc_id -> [positions ascending]}
    postings: dict[str, dict[int, list[int]]]
    doc_len: dict[int, int]  # doc_id -> token count
    n_docs: int
    avgdl: float


def build_index(docs: dict[int, str], n: int = NGRAM_N) -> OracleIndex:
    """Index construction semantics of ref lib/indexer/indexer.go:77-103."""
    postings: dict[str, dict[int, list[int]]] = defaultdict(dict)
    doc_len: dict[int, int] = {}
    for doc_id, text in docs.items():
        terms = tokenize(text, n)
        doc_len[doc_id] = len(terms)
        for pos, term in enumerate(terms):
            postings[term].setdefault(doc_id, []).append(pos)
    n_docs = len(docs)
    avgdl = (sum(doc_len.values()) / n_docs) if n_docs else 0.0
    return OracleIndex(dict(postings), doc_len, n_docs, avgdl)


def idf(n_docs: int, df: int) -> float:
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def bm25_term_score(tf: int, dl: int, avgdl: float, n_docs: int, df: int) -> float:
    denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
    return idf(n_docs, df) * tf * (BM25_K1 + 1.0) / denom


def bm25_topk(
    index: OracleIndex, query: str, k: int = 10, n: int = NGRAM_N
) -> list[tuple[int, float]]:
    """Disjunctive (OR) BM25 top-k over the query's unique trigrams.

    Query terms are deduplicated (the reference panics on duplicate
    query trigrams — phrase_searcher.go:26-32; we define dedup
    semantics per SURVEY.md §2.5). Ranking key: (round(score, 6) DESC,
    doc_id ASC) — rounding pins cross-engine float determinism.
    """
    terms = sorted(set(tokenize(query, n)))
    scores: dict[int, float] = defaultdict(float)
    for t in terms:
        plist = index.postings.get(t)
        if not plist:
            continue
        df = len(plist)
        for doc_id, positions in plist.items():
            scores[doc_id] += bm25_term_score(
                len(positions), index.doc_len[doc_id], index.avgdl, index.n_docs, df
            )
    ranked = sorted(
        ((d, round(s, SCORE_NDIGITS)) for d, s in scores.items()),
        key=lambda x: (-x[1], x[0]),
    )
    return ranked[:k]


def phrase_doc_ids(index: OracleIndex, query: str, n: int = NGRAM_N) -> list[int]:
    """Conjunctive doc intersection + positional phrase check
    (ref phrase_searcher.go:34-114, Q4+Q5).

    All-or-nothing term resolution (Q2, phrase_searcher.go:196-209):
    any query trigram missing from the dictionary => empty result.
    Query trigrams are deduped but every offset is kept (Q5 uses
    relative positions per offset).
    """
    terms = tokenize(query, n)
    if not terms:
        return []
    if any(t not in index.postings for t in terms):
        return []
    # docs containing every distinct term
    doc_sets = [set(index.postings[t].keys()) for t in dict.fromkeys(terms)]
    candidates = set.intersection(*doc_sets)
    out = []
    for doc_id in sorted(candidates):
        if phrase_match_starts(index, doc_id, terms):
            out.append(doc_id)
    return out


def phrase_match_starts(index: OracleIndex, doc_id: int, terms: list[str]) -> list[int]:
    """Relative-position intersection (Q5, phrase_searcher.go:71-114):
    for the term at query offset i, shift its positions by -i; the
    phrase occurs at every position in the intersection across all
    offsets. Returns ascending match start positions (token == char
    offsets)."""
    acc: set[int] | None = None
    for i, t in enumerate(terms):
        positions = index.postings.get(t, {}).get(doc_id)
        if not positions:
            return []
        rel = {p - i for p in positions}
        acc = rel if acc is None else (acc & rel)
        if not acc:
            return []
    return sorted(acc)


def match_ranges(
    index: OracleIndex, query: str, n: int = NGRAM_N
) -> list[tuple[int, int, int]]:
    """(doc_id, start, end) coalesced match ranges.

    Range extraction (Q6, phrase_searcher.go:116-131): a phrase hit at
    relative position p spans [p, p + len(query_tokens) - 1 + n) — i.e.
    exactly the query's character span. Overlapping/adjacent-overlap
    ranges are merged per doc (Q7, mergeRanges phrase_searcher.go:154-186:
    merge while next.start <= cur.end).
    """
    terms = tokenize(query, n)
    if not terms:
        return []
    if any(t not in index.postings for t in terms):
        return []
    width = len(terms) - 1 + n  # == len(query) in characters
    out: list[tuple[int, int, int]] = []
    doc_sets = [set(index.postings[t].keys()) for t in dict.fromkeys(terms)]
    for doc_id in sorted(set.intersection(*doc_sets)):
        starts = phrase_match_starts(index, doc_id, terms)
        if not starts:
            continue
        cur_s, cur_e = starts[0], starts[0] + width
        for s in starts[1:]:
            e = s + width
            if s <= cur_e:  # overlap => merge (ref merges when start <= end)
                cur_e = max(cur_e, e)
            else:
                out.append((doc_id, cur_s, cur_e))
                cur_s, cur_e = s, e
        out.append((doc_id, cur_s, cur_e))
    return out
