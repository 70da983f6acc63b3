"""Positional phrase search over compressed segments (Q1/Q4-Q7 of
SURVEY.md executed against the segment blobs instead of posting rows).

Per shard, inside one Arrow batch:
- conjunctive docID intersection across the query's distinct terms
  (ref nextEachPosting/nextMinimumPosting cursors,
  lib/searcher/phrase_searcher.go:34-69 — here a numpy intersect1d
  reduction over docID-sorted arrays);
- relative-position alignment per candidate doc (ref
  computeRelativePositions/intersectionPositionsSet,
  phrase_searcher.go:71-114): positions of the term at query offset i
  shifted by -i, intersected across offsets;
- match-range extraction + overlap coalescing (ref extractMatched +
  mergeRanges, phrase_searcher.go:116-186).

Duplicate query trigrams are deduped with all offsets kept — the
defined semantics for the reference's panic case
(phrase_searcher.go:26-32, SURVEY.md §2.5).
"""

from __future__ import annotations

from collections.abc import Iterator
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searty_spark import NGRAM_N
from searty_spark.segments import decode_segment_positions, decode_segment_scores
from searty_spark.tokenize import tokenize
from searty_spark.wand import SCORE_COLS

# phrase matching additionally reads the position streams; cf/bucket
# still never cross the exchange (mapInPandas consumes its child's
# whole schema, so the projection must be explicit — see wand.py)
PHRASE_COLS = SCORE_COLS + ["pos_blob", "pos_block_offset"]


def _blocks_for(row: dict, docs: np.ndarray) -> list[int]:
    """Blocks whose doc range can contain any of ``docs``."""
    last = np.asarray(row["block_last_doc"], dtype=np.int64)
    b = np.unique(np.searchsorted(last, docs))
    return b[b < last.size].tolist()


def _shard_docs_with_all(rows: dict[str, dict], toks: list[str]) -> np.ndarray | None:
    """Conjunctive doc intersection over the SCORE blobs (cheaper than
    positions), rarest term first, progressively block-pruned with
    block_last_doc — the phrase twin of WAND's block skipping. None
    when the shard cannot match (all-or-nothing conjunction)."""
    if any(t not in rows for t in toks):
        return None
    uniq_terms = sorted(set(toks), key=lambda t: rows[t]["df"])
    common: np.ndarray | None = None
    for t in uniq_terms:
        row = rows[t]
        if common is None:
            docs, _, _ = decode_segment_scores(row)
        else:
            blocks = _blocks_for(row, common)
            if not blocks:
                return None
            docs, _, _ = decode_segment_scores(row, blocks)
        common = (
            docs.astype(np.int64)
            if common is None
            else np.intersect1d(common, docs.astype(np.int64))
        )
        if common.size == 0:
            return None
    return common


def _shard_match_starts(
    rows: dict[str, dict], toks: list[str]
) -> tuple[np.ndarray, np.ndarray] | None:
    """rows: term -> segment row dict. Returns (doc_ids, starts) of
    every phrase match start in this shard, sorted by (doc, start), or
    None when the shard has no match.

    Fully vectorized: no Python loop scales with the number of
    candidate docs or matches. The per-offset (doc, rel) pair streams
    are concatenated, and a (doc, rel) pair is a phrase start iff it
    occurs in all len(toks) offset streams (the count-distinct-offsets
    trick of query.py, here as one lexsort + run-length count — pairs
    are unique within an offset because positions are unique per doc).
    """
    common = _shard_docs_with_all(rows, toks)
    if common is None:
        return None
    uniq_terms = sorted(set(toks), key=lambda t: rows[t]["df"])

    # 2) positions decode ONLY for blocks holding surviving candidates
    decoded = {}
    for t in uniq_terms:
        row = rows[t]
        blocks = _blocks_for(row, common)
        decoded[t] = decode_segment_positions(row, blocks)
    n_off = len(toks)
    doc_parts: list[np.ndarray] = []
    rel_parts: list[np.ndarray] = []
    for i, t in enumerate(toks):
        docs, plists = decoded[t]
        idx = np.searchsorted(docs.astype(np.int64), common)
        lens = np.fromiter((plists[j].size for j in idx), dtype=np.int64, count=idx.size)
        doc_parts.append(np.repeat(common, lens))
        rel_parts.append(
            np.concatenate([plists[j] for j in idx]).astype(np.int64) - i
        )
    doc_all = np.concatenate(doc_parts)
    rel_all = np.concatenate(rel_parts)
    order = np.lexsort((rel_all, doc_all))
    d_s, r_s = doc_all[order], rel_all[order]
    first = np.empty(d_s.size, dtype=bool)
    first[0] = True
    first[1:] = (d_s[1:] != d_s[:-1]) | (r_s[1:] != r_s[:-1])
    grp_start = np.flatnonzero(first)
    counts = np.diff(np.append(grp_start, d_s.size))
    keep = grp_start[counts == n_off]
    if keep.size == 0:
        return None
    return d_s[keep], r_s[keep]  # sorted by (doc, start)


def _shard_phrase(rows: dict[str, dict], toks: list[str], width: int) -> pd.DataFrame:
    """(doc_id, start, end) coalesced ranges for one shard.

    Range coalescing exploits that every range has the same width, so
    ends ascend with starts and an island boundary is simply
    ``start > previous end`` within a doc."""
    empty = pd.DataFrame({"doc_id": [], "start": [], "end": []})
    m = _shard_match_starts(rows, toks)
    if m is None:
        return empty
    docs_m, starts_m = m
    ends_m = starts_m + width
    island = np.empty(docs_m.size, dtype=bool)
    island[0] = True
    island[1:] = (docs_m[1:] != docs_m[:-1]) | (starts_m[1:] > ends_m[:-1])
    isl = np.flatnonzero(island)
    last = np.append(isl[1:], docs_m.size) - 1
    return pd.DataFrame(
        {"doc_id": docs_m[isl], "start": starts_m[isl], "end": ends_m[last]}
    )


def phrase_ranges_segments(
    segments: DataFrame,
    query: str,
    n: int = NGRAM_N,
    n_shards: int | None = None,
    pre_partitioned: bool = False,
) -> DataFrame:
    """(doc_id, start, end) coalesced phrase match ranges — identical
    output to query.phrase_match_ranges, from the compressed index.

    ``pre_partitioned``: same warm-server contract as
    wand.wand_topk — the caller asserts ``segments`` is already
    hash-partitioned by shard, and the per-query exchange is skipped."""
    spark = segments.sparkSession
    toks = tokenize(query, n)
    if not toks:
        return spark.createDataFrame([], "doc_id long, start int, end int")
    width = len(toks) - 1 + n
    pruned = segments.filter(F.col("term").isin(sorted(set(toks)))).select(
        *PHRASE_COLS
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        by_shard: dict[int, dict[str, dict]] = {}
        for pdf in batches:
            for rec in pdf.to_dict("records"):
                shard_rows = by_shard.setdefault(int(rec["shard"]), {})
                if rec["term"] in shard_rows:
                    # >1 segment row per (shard, term) means unmerged
                    # partial indexes — silently keeping one would drop
                    # postings; merge_indexes first
                    raise ValueError(
                        f"duplicate segment row for (shard={rec['shard']}, "
                        f"term={rec['term']!r}); merge partial indexes before querying"
                    )
                shard_rows[rec["term"]] = rec
        for shard, rows in by_shard.items():
            yield _shard_phrase(rows, toks, width)

    if pre_partitioned:
        rep = pruned
    else:
        rep = (
            pruned.repartition(n_shards, "shard")
            if n_shards
            else pruned.repartition("shard")
        )
    local = rep.mapInPandas(run, "doc_id long, start int, end int")
    return local.orderBy("doc_id", "start")


def phrase_search_segments(segments: DataFrame, query: str, n: int = NGRAM_N) -> DataFrame:
    """(doc_id) docs containing the phrase, ascending."""
    return phrase_ranges_segments(segments, query, n).select("doc_id").distinct().orderBy("doc_id")


def docs_with_all_terms_segments(
    segments: DataFrame, terms: list[str], n_shards: int | None = None
) -> DataFrame:
    """(doc_id) — docs whose postings contain EVERY given term, from
    the compressed segments (per-shard block-pruned intersection,
    rarest term first). The candidate-generation primitive behind the
    index-accelerated regex search; also useful standalone as a
    conjunctive boolean filter."""
    spark = segments.sparkSession
    if not terms:
        return spark.createDataFrame([], "doc_id long")
    terms = sorted(set(terms))
    # conjunction reads only the score blobs — the position streams
    # stay on disk (SCORE_COLS projection, see wand.py)
    pruned = segments.filter(F.col("term").isin(terms)).select(*SCORE_COLS)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        by_shard: dict[int, dict[str, dict]] = {}
        for pdf in batches:
            for rec in pdf.to_dict("records"):
                shard_rows = by_shard.setdefault(int(rec["shard"]), {})
                if rec["term"] in shard_rows:
                    raise ValueError(
                        f"duplicate segment row for (shard={rec['shard']}, "
                        f"term={rec['term']!r}); merge partial indexes before querying"
                    )
                shard_rows[rec["term"]] = rec
        for shard, rows in by_shard.items():
            common = _shard_docs_with_all(rows, terms)
            if common is not None:
                yield pd.DataFrame({"doc_id": common})

    rep = (
        pruned.repartition(n_shards, "shard") if n_shards else pruned.repartition("shard")
    )
    return rep.mapInPandas(run, "doc_id long")


def _shard_phrase_bm25(
    rows: dict[str, dict], toks: list[str], n_docs: int, avgdl: float
) -> pd.DataFrame:
    """(doc_id, score, n_matches) for one shard: phrase-matching docs
    scored with BM25 over the phrase's distinct trigrams. Every match
    doc contains every term (conjunctive match), so each term's impact
    is gathered by one searchsorted into its block-pruned decode — no
    per-doc Python."""
    from searty_spark.wand import _impacts, _require_df

    empty = pd.DataFrame({"doc_id": [], "score": [], "n_matches": []})
    m = _shard_match_starts(rows, toks)
    if m is None:
        return empty
    docs_m, _ = m
    mdocs, counts = np.unique(docs_m, return_counts=True)
    scores = np.zeros(mdocs.size, dtype=np.float64)
    for t in sorted(set(toks)):
        row = rows[t]
        blocks = _blocks_for(row, mdocs)
        docs, tfs, dls = decode_segment_scores(row, blocks)
        docs = docs.astype(np.int64)
        idx = np.searchsorted(docs, mdocs)
        # clip before gathering: idx == len(docs) (match doc beyond every
        # decoded posting — corrupted/inconsistent index) must surface as
        # the diagnostic below, not as an IndexError on docs[idx]
        if (idx >= docs.size).any() or not np.array_equal(
            docs[np.minimum(idx, docs.size - 1)], mdocs
        ):
            raise AssertionError("phrase match doc missing from term postings")
        scores += _impacts(tfs, dls, n_docs, avgdl, _require_df(row))[idx]
    return pd.DataFrame(
        {
            "doc_id": mdocs,
            "score": np.round(scores, 6),
            "n_matches": counts.astype(np.int64),
        }
    )


def phrase_bm25_topk_segments(
    segments: DataFrame,
    query: str,
    k: int = 10,
    n: int = NGRAM_N,
    n_docs: int | None = None,
    avgdl: float | None = None,
    n_shards: int | None = None,
    df_lookup=None,
    pre_partitioned: bool = False,
) -> DataFrame:
    """(doc_id, score, n_matches) — ranked phrase search over the
    compressed segments: identical output to query.phrase_bm25_topk.
    The phrase intersection prunes to match docs first; BM25 impacts
    then decode only the blocks holding those docs. df_global follows
    the same lookup contract as wand_topk (dict / DataFrame / None);
    ``pre_partitioned`` follows wand_topk's warm-server contract."""
    from searty_spark.wand import _with_df_global

    spark = segments.sparkSession
    toks = tokenize(query, n)
    if not toks:
        return spark.createDataFrame([], "doc_id long, score double, n_matches long")
    assert n_docs is not None and avgdl is not None
    terms = sorted(set(toks))
    pruned = _with_df_global(
        segments.filter(F.col("term").isin(terms)).select(*PHRASE_COLS),
        terms,
        df_lookup,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        by_shard: dict[int, dict[str, dict]] = {}
        for pdf in batches:
            for rec in pdf.to_dict("records"):
                shard_rows = by_shard.setdefault(int(rec["shard"]), {})
                if rec["term"] in shard_rows:
                    raise ValueError(
                        f"duplicate segment row for (shard={rec['shard']}, "
                        f"term={rec['term']!r}); merge partial indexes before querying"
                    )
                shard_rows[rec["term"]] = rec
        for shard, rows in by_shard.items():
            yield _shard_phrase_bm25(rows, toks, n_docs, avgdl)

    if pre_partitioned:
        rep = pruned
    else:
        rep = (
            pruned.repartition(n_shards, "shard")
            if n_shards
            else pruned.repartition("shard")
        )
    local = rep.mapInPandas(run, "doc_id long, score double, n_matches long")
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
