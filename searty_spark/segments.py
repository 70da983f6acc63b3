"""Compressed, docID-sorted, block-max posting segments.

The Spark analogue of the reference's ``inverted_index(token_id,
posting_list BLOB)`` table (ref lib/database/schema.sql:19-23, flush
at lib/indexer/indexer.go:46-52), re-architected for 10^12 docs:

- **Sharding**: a posting lives in shard ``doc_id % n_shards``; a
  segment row is one (shard, term). Shards bound row size and give the
  query side its parallelism: each shard computes an exact local
  top-k, the global top-k is their union (exact — a doc lives in
  exactly one shard).
- **Bucketing**: ``bucket = pmod(xxhash64(term), n_buckets)`` is the
  storage partition key (parquet analogue of an Iceberg bucket
  transform); query terms prune to their buckets at scan time.
- **Blocks**: postings are split into blocks of ``block_size`` docs.
  Two blobs per segment row:

  * ``blob``      — score data; per block one varbyte stream
    ``n, doc_delta*n, tf*n, doc_len*n`` (flat sub-streams: decode is
    three numpy slices + a cumsum — no per-posting walk).
  * ``pos_blob``  — positions; per block ``n, npos*n, pos_delta*total``
    (deltas restart at each doc; grouped-cumsum decode).

  Per-block metadata: last_doc, max_tf, exact double ``max_impact``
  (BM25 upper bound with GLOBAL df), byte offsets into both blobs.
  Bounds are exact maxima, so block skipping never changes the top-k.

Encoding runs in ``applyInPandas`` over (shard, bucket) groups, numpy
throughout. doc_len rides inside the block so scoring needs no
norms-table join at query time.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searty_spark import BM25_B, BM25_K1
from searty_spark.codec import varbyte_decode, varbyte_encode

BLOCK_SIZE = 128

SEGMENT_SCHEMA = (
    "shard int, bucket int, term string, df long, df_global long, cf long, "
    "blob binary, pos_blob binary, block_last_doc array<long>, "
    "block_max_tf array<int>, block_max_impact array<double>, "
    "block_offset array<int>, pos_block_offset array<int>"
)

SEGMENT_COLS = [
    "shard", "bucket", "term", "df", "df_global", "cf", "blob", "pos_blob",
    "block_last_doc", "block_max_tf", "block_max_impact",
    "block_offset", "pos_block_offset",
]


def bm25_impact(
    tf: np.ndarray, doc_len: np.ndarray, n_docs: int, avgdl: float, df_global: int
) -> np.ndarray:
    """Exact per-(term,doc) BM25 contribution — the same arithmetic
    order as query.bm25_score_col and oracle.bm25_term_score."""
    idf = math.log((n_docs - df_global + 0.5) / (df_global + 0.5) + 1.0)
    tf = tf.astype(np.float64)
    denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * doc_len.astype(np.float64) / avgdl)
    return idf * tf * (BM25_K1 + 1.0) / denom


def _delta(v: np.ndarray) -> np.ndarray:
    out = v.astype(np.uint64).copy()
    out[1:] = v[1:] - v[:-1]
    return out


def _grouped_delta(flat: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Delta-encode within groups (first element of each group absolute)."""
    out = flat.astype(np.uint64).copy()
    if flat.size:
        out[1:] = flat[1:] - flat[:-1]
        starts = np.zeros(flat.size, dtype=bool)
        starts[0] = True
        starts[np.cumsum(counts)[:-1].astype(np.int64)[np.cumsum(counts)[:-1] < flat.size]] = True
        out[starts] = flat[starts]
    return out


def _grouped_cumsum(deltas: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Inverse of :func:`_grouped_delta`, vectorized: subtract from each
    group the running total just before its first element."""
    if deltas.size == 0:
        return deltas.astype(np.uint64)
    cs = np.cumsum(deltas, dtype=np.uint64)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int64)
    starts = starts[starts < deltas.size]
    grp_base = np.where(starts > 0, cs[np.maximum(starts - 1, 0)], 0).astype(np.uint64)
    reps = np.diff(np.concatenate([starts, [deltas.size]])).astype(np.int64)
    return cs - np.repeat(grp_base, reps)


def encode_score_block(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray) -> bytes:
    n = doc_ids.size
    stream = np.concatenate(
        [
            np.array([n], dtype=np.uint64),
            _delta(doc_ids),
            tfs.astype(np.uint64),
            dls.astype(np.uint64),
        ]
    )
    return bytes(varbyte_encode(stream))


def decode_score_block(part: bytes):
    vals = varbyte_decode(part)
    n = int(vals[0])
    docs = np.cumsum(vals[1 : 1 + n], dtype=np.uint64)
    tfs = vals[1 + n : 1 + 2 * n]
    dls = vals[1 + 2 * n : 1 + 3 * n]
    return docs, tfs, dls


def encode_pos_block(position_lists: list[np.ndarray]) -> bytes:
    counts = np.array([p.size for p in position_lists], dtype=np.uint64)
    flat = (
        np.concatenate(position_lists).astype(np.uint64)
        if position_lists
        else np.empty(0, dtype=np.uint64)
    )
    stream = np.concatenate(
        [
            np.array([len(position_lists)], dtype=np.uint64),
            counts,
            _grouped_delta(flat, counts),
        ]
    )
    return bytes(varbyte_encode(stream))


def decode_pos_block(part: bytes):
    """-> (counts, flat_positions) — flat positions grouped by counts."""
    vals = varbyte_decode(part)
    n = int(vals[0])
    counts = vals[1 : 1 + n]
    flat = _grouped_cumsum(vals[1 + n :], counts)
    return counts, flat


def encode_segment_rows(
    pdf: pd.DataFrame,
    n_docs: int,
    avgdl: float,
    block_size: int = BLOCK_SIZE,
) -> pd.DataFrame:
    """One (shard, bucket) pandas group -> one output row per term."""
    out = []
    for (shard, bucket, term), g in pdf.groupby(["shard", "bucket", "term"], sort=False):
        order = np.argsort(g["doc_id"].to_numpy(), kind="stable")
        doc_ids = g["doc_id"].to_numpy()[order].astype(np.uint64)
        tfs = g["tf"].to_numpy()[order].astype(np.int64)
        dls = g["doc_len"].to_numpy()[order].astype(np.int64)
        df_global = int(g["df_global"].to_numpy()[0])
        poss = [np.asarray(p, dtype=np.uint64) for p in g["positions"].to_numpy()[order]]
        df = len(doc_ids)
        impacts = bm25_impact(tfs, dls, n_docs, avgdl, df_global)
        blob_parts, pos_parts = [], []
        last_doc, max_tf, max_imp, offs, pos_offs = [], [], [], [], []
        off = poff = 0
        for s in range(0, df, block_size):
            e = min(s + block_size, df)
            part = encode_score_block(doc_ids[s:e], tfs[s:e], dls[s:e])
            ppart = encode_pos_block(poss[s:e])
            offs.append(off)
            pos_offs.append(poff)
            off += len(part)
            poff += len(ppart)
            blob_parts.append(part)
            pos_parts.append(ppart)
            last_doc.append(int(doc_ids[e - 1]))
            max_tf.append(int(tfs[s:e].max()))
            max_imp.append(float(impacts[s:e].max()))
        out.append(
            {
                "shard": int(shard),
                "bucket": int(bucket),
                "term": term,
                "df": df,
                "df_global": df_global,
                "cf": int(tfs.sum()),
                "blob": b"".join(blob_parts),
                "pos_blob": b"".join(pos_parts),
                "block_last_doc": last_doc,
                "block_max_tf": max_tf,
                "block_max_impact": max_imp,
                "block_offset": offs,
                "pos_block_offset": pos_offs,
            }
        )
    return pd.DataFrame(out, columns=SEGMENT_COLS)


def decode_segment_scores(row, blocks=None):
    """Segment row -> (doc_ids, tfs, doc_lens) for selected blocks."""
    blob = row["blob"]
    offsets = list(row["block_offset"]) + [len(blob)]
    sel = range(len(offsets) - 1) if blocks is None else blocks
    docs, tfs, dls = [], [], []
    for b in sel:
        d, t, l = decode_score_block(blob[offsets[b] : offsets[b + 1]])
        docs.append(d)
        tfs.append(t)
        dls.append(l)
    if not docs:
        z = np.empty(0, dtype=np.uint64)
        return z, z.copy(), z.copy()
    return np.concatenate(docs), np.concatenate(tfs), np.concatenate(dls)


def decode_segment_positions(row, blocks=None):
    """Segment row -> (doc_ids, list-of-position-arrays per doc)."""
    pos_blob = row["pos_blob"]
    offsets = list(row["pos_block_offset"]) + [len(pos_blob)]
    sel = range(len(offsets) - 1) if blocks is None else blocks
    doc_ids, _, _ = decode_segment_scores(row, blocks)
    plists: list[np.ndarray] = []
    for b in sel:
        counts, flat = decode_pos_block(pos_blob[offsets[b] : offsets[b + 1]])
        bounds = np.cumsum(counts).astype(np.int64)
        prev = 0
        for e in bounds:
            plists.append(flat[prev:e])
            prev = int(e)
    return doc_ids, plists


def build_segments(
    postings: DataFrame,
    dstats: DataFrame,
    n_shards: int = 4,
    n_buckets: int = 32,
    block_size: int = BLOCK_SIZE,
    n_docs: int | None = None,
    avgdl: float | None = None,
    df_lookup: DataFrame | None = None,
) -> DataFrame:
    """postings (term, doc_id, tf, positions) + dstats -> segment rows.

    Two shuffles: the global-df aggregation (the dictionary stage of
    SURVEY.md §3.1) and the (shard, bucket) grouping for encode. The
    doc_len join is a join on doc_id (sort-merge or broadcast by AQE).

    ``df_lookup`` (term, df_global) overrides the local df computation
    — REQUIRED when ``postings`` covers only a slice of the corpus
    (per-shard resumable builds), since idf must use global df.
    """
    if n_docs is None or avgdl is None:
        row = dstats.agg(F.count("*").alias("n"), F.avg("doc_len").alias("a")).collect()[0]
        n_docs, avgdl = int(row["n"]), float(row["a"])
    dfg = (
        df_lookup
        if df_lookup is not None
        else postings.groupBy("term").agg(F.count("*").alias("df_global"))
    )
    if "doc_len" not in postings.columns:
        postings = postings.join(dstats, "doc_id")
    with_keys = (
        postings.join(dfg, "term")
        .select(
            F.pmod(F.col("doc_id"), F.lit(n_shards)).cast("int").alias("shard"),
            F.pmod(F.xxhash64("term"), F.lit(n_buckets)).cast("int").alias("bucket"),
            "term",
            "doc_id",
            "tf",
            "positions",
            "doc_len",
            "df_global",
        )
    )

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        return encode_segment_rows(pdf, n_docs, avgdl, block_size)

    return with_keys.groupBy("shard", "bucket").applyInPandas(encode, SEGMENT_SCHEMA)
