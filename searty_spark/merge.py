"""Hierarchical index merge — the reduce stage (SURVEY.md §3.2,
re-expressing ref lib/indexer/merge.go:455-502 Spark-first).

Differences from the reference, by design:

- No docID remapping (ref merge.go:137-190): doc IDs are globally
  unique at assignment time, so merging posting lists for a term is
  the concatenation of disjoint sorted runs + one argsort
  (the `Push`-descending trick of merge.go:259-262 has no analogue —
  Spark sorts explicitly).
- No tokenID remapping (ref merge.go:192-238): token identity is the
  term string / its xxhash64, stable across indexes.
- Global stats change under merge, so per-block max_impact metadata
  (which bakes in N, avgdl, global df) is recomputed during re-encode.
  df_global of a merged term = sum of source dfs (doc sets disjoint).

One shuffle: unioned segment rows group by (shard, bucket); each group
decodes, concatenates, re-sorts and re-encodes its terms in numpy.
Merging is associative and the result is content-identical to a
single-shot build over the union corpus (tested in
tests/test_merge_index.py — the analogue of FIXTURES.md §6).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searty_spark.index import load_segments, load_stats
from searty_spark.segments import (
    SEGMENT_COLS,
    SEGMENT_SCHEMA,
    decode_segment_positions,
    decode_segment_scores,
    encode_segment_rows,
)


def merge_segment_group(
    pdf: pd.DataFrame, n_docs: int, avgdl: float
) -> pd.DataFrame:
    """One (shard, bucket) group of unioned segment rows (several rows
    per term, disjoint doc sets) -> merged segment rows.

    Per input segment row: decode its arrays once and append them as
    columns (no per-posting Python). The re-sort, duplicate-doc check
    (ref postinglist.go:96-106) and re-encode under the merged global
    stats all happen inside encode_segment_rows.
    """
    cols: dict[str, list] = {k: [] for k in
                             ["shard", "bucket", "term", "doc_id", "tf", "doc_len", "df_global"]}
    pos_col: list[np.ndarray] = []
    for rec in pdf.to_dict("records"):
        docs, tfs, dls = decode_segment_scores(rec)
        _, plists = decode_segment_positions(rec)
        n = docs.size
        cols["shard"].append(np.full(n, rec["shard"], dtype=np.int64))
        cols["bucket"].append(np.full(n, rec["bucket"], dtype=np.int64))
        cols["term"].append(np.full(n, rec["term"], dtype=object))
        cols["doc_id"].append(docs.astype(np.int64))
        cols["tf"].append(tfs.astype(np.int64))
        cols["doc_len"].append(dls.astype(np.int64))
        cols["df_global"].append(np.full(n, rec["df_global_new"], dtype=np.int64))
        pos_col.extend(plists)
    if not pos_col and not cols["doc_id"]:
        return pd.DataFrame(columns=pd.Index(SEGMENT_COLS))
    flat = pd.DataFrame({k: np.concatenate(v) for k, v in cols.items()})
    flat["positions"] = pd.Series(pos_col, dtype=object)
    return encode_segment_rows(flat, n_docs, avgdl)


def merge_indexes(spark: SparkSession, index_dirs: list[str], out_dir: str) -> dict:
    """Merge N on-disk indexes (disjoint doc_id spaces) into one."""
    stats_list = [load_stats(d) for d in index_dirs]
    n_shards = stats_list[0]["n_shards"]
    n_buckets = stats_list[0]["n_buckets"]
    assert all(s["n_shards"] == n_shards and s["n_buckets"] == n_buckets for s in stats_list)
    n_docs = sum(s["n_docs"] for s in stats_list)
    sum_dl = sum(s["sum_dl"] for s in stats_list)
    avgdl = sum_dl / n_docs

    segs = None
    for d in index_dirs:
        s = load_segments(spark, d)
        segs = s if segs is None else segs.unionByName(s)
    dfg = segs.groupBy("term").agg(F.sum("df").cast("long").alias("df_global_new"))
    joined = segs.join(dfg, "term")

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        return merge_segment_group(pdf, n_docs, avgdl)

    merged = joined.groupBy("shard", "bucket").applyInPandas(run, SEGMENT_SCHEMA)

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    # same hive layout write_index produces: segments/shard=N/bucket=M
    merged.write.partitionBy("shard", "bucket").mode("overwrite").parquet(
        str(out / "segments")
    )
    stats = {
        "n_docs": n_docs,
        "sum_dl": sum_dl,
        "avgdl": avgdl,
        "n_shards": n_shards,
        "n_buckets": n_buckets,
    }
    (out / "stats.json").write_text(json.dumps(stats))

    # docstats + dictionary follow by union / re-aggregation
    ds = None
    for d in index_dirs:
        x = spark.read.parquet(str(Path(d) / "docstats"))
        ds = x if ds is None else ds.unionByName(x)
    ds.write.mode("overwrite").parquet(str(out / "docstats"))
    dct = dfg.select(
        "term", F.xxhash64("term").alias("token_id"), F.col("df_global_new").alias("df_global")
    )
    dct.write.mode("overwrite").parquet(str(out / "dictionary"))
    return stats
