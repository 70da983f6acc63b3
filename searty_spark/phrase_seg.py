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
from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searty_spark import NGRAM_N
from searty_spark.segments import decode_segment_positions
from searty_spark.tokenize import tokenize


def _shard_phrase(rows: dict[str, dict], toks: list[str], width: int) -> pd.DataFrame:
    """rows: term -> segment row dict. Returns (doc_id, start, end)."""
    empty = pd.DataFrame({"doc_id": [], "start": [], "end": []})
    # all-or-nothing within the shard for the conjunction
    if any(t not in rows for t in toks):
        return empty
    decoded = {t: decode_segment_positions(rows[t]) for t in set(toks)}
    common = reduce(
        np.intersect1d, [decoded[t][0].astype(np.int64) for t in dict.fromkeys(toks)]
    )
    if common.size == 0:
        return empty
    out_doc, out_s, out_e = [], [], []
    # per-term doc->positions lookup restricted to common docs
    lookup: dict[str, dict[int, np.ndarray]] = {}
    for t, (docs, plists) in decoded.items():
        idx = np.searchsorted(docs.astype(np.int64), common)
        lookup[t] = {int(common[i]): plists[idx[i]] for i in range(common.size)}
    for d in common.tolist():
        acc: np.ndarray | None = None
        for i, t in enumerate(toks):
            rel = lookup[t][d].astype(np.int64) - i
            acc = rel if acc is None else np.intersect1d(acc, rel)
            if acc.size == 0:
                break
        if acc is None or acc.size == 0:
            continue
        starts = np.sort(acc)
        # coalesce ranges: merge while next.start <= current end
        cur_s, cur_e = int(starts[0]), int(starts[0]) + width
        for s in starts[1:].tolist():
            if s <= cur_e:
                cur_e = max(cur_e, s + width)
            else:
                out_doc.append(d)
                out_s.append(cur_s)
                out_e.append(cur_e)
                cur_s, cur_e = s, s + width
        out_doc.append(d)
        out_s.append(cur_s)
        out_e.append(cur_e)
    return pd.DataFrame({"doc_id": out_doc, "start": out_s, "end": out_e})


def phrase_ranges_segments(
    segments: DataFrame, query: str, n: int = NGRAM_N, n_shards: int | None = None
) -> DataFrame:
    """(doc_id, start, end) coalesced phrase match ranges — identical
    output to query.phrase_match_ranges, from the compressed index."""
    spark = segments.sparkSession
    toks = tokenize(query, n)
    if not toks:
        return spark.createDataFrame([], "doc_id long, start int, end int")
    width = len(toks) - 1 + n
    pruned = segments.filter(F.col("term").isin(sorted(set(toks))))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        by_shard: dict[int, dict[str, dict]] = {}
        for pdf in batches:
            for rec in pdf.to_dict("records"):
                by_shard.setdefault(int(rec["shard"]), {})[rec["term"]] = rec
        for shard, rows in by_shard.items():
            yield _shard_phrase(rows, toks, width)

    rep = (
        pruned.repartition(n_shards, "shard") if n_shards else pruned.repartition("shard")
    )
    local = rep.mapInPandas(run, "doc_id long, start int, end int")
    return local.orderBy("doc_id", "start")


def phrase_search_segments(segments: DataFrame, query: str, n: int = NGRAM_N) -> DataFrame:
    """(doc_id) docs containing the phrase, ascending."""
    return phrase_ranges_segments(segments, query, n).select("doc_id").distinct().orderBy("doc_id")
