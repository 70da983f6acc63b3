"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS   (default 32).

Headline suite:
- index_build     — corpus -> postings + dictionary + doc stats,
                    materialized (the searty-index analogue, §3.1)
- segment_build   — postings -> delta+varbyte block-max segments
- bm25_query_p50/p95 — repeated top-k BM25 over warmed postings
- phrase_query    — positional phrase + range coalescing
- wand_query      — segment-based block-max WAND top-k (if available)
- minhash_dedup   — MinHash LSH near-dup pairs
- ann_topk        — brute-force cosine top-k over embeddings
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from searty_spark import ann, dedup  # noqa: E402
from searty_spark.build import build_postings, doc_stats, term_dictionary  # noqa: E402
from searty_spark.query import bm25_topk, phrase_match_ranges  # noqa: E402
from searty_spark.session import get_spark  # noqa: E402

BM25_QUERIES = ["data", "spark join", "vector group", "window merge", "customer"]
PHRASE_QUERIES = ["spark table", "table table"]
N_REPEAT = 5


def timed(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark(cpus=cpus, app_name="searty_bench")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_docs = docs.count()

    results: dict[str, float] = {}
    extra: dict[str, float] = {}

    # --- index build (postings + dictionary + stats), materialized ---
    def build():
        p = build_postings(docs)
        d = term_dictionary(p, method="xxhash64")
        s = doc_stats(docs)
        return p.count() + d.count() + s.count()

    t, n = timed(build)
    results["index_build"] = round(t, 4)
    extra["index_build_docs_per_sec"] = round(n_docs / t, 2)

    # --- segment build (if the segments module has landed) ---
    try:
        from searty_spark.segments import build_segments

        def seg():
            return build_segments(build_postings(docs), n_buckets=32).count()

        t, n_seg = timed(seg)
        results["segment_build"] = round(t, 4)
        extra["n_segments"] = n_seg
    except ImportError:
        pass

    # --- warmed postings for query benches ---
    postings = build_postings(docs).cache()
    stats = doc_stats(docs).cache()
    postings.count()
    stats.count()

    lats = []
    for i in range(N_REPEAT):
        for q in BM25_QUERIES:
            t, _ = timed(lambda: bm25_topk(postings, stats, q, k=10).collect())
            if i > 0:  # first pass warms
                lats.append(t)
    lats.sort()
    results["bm25_query_p50"] = round(lats[len(lats) // 2], 4)
    results["bm25_query_p95"] = round(lats[int(len(lats) * 0.95)], 4)
    extra["bm25_qps"] = round(len(lats) / sum(lats), 2)

    t, _ = timed(
        lambda: [phrase_match_ranges(postings, q).collect() for q in PHRASE_QUERIES]
    )
    results["phrase_query"] = round(t, 4)

    # --- WAND over segments (if available) ---
    try:
        from searty_spark.segments import build_segments
        from searty_spark.wand import wand_topk

        seg_df = build_segments(postings, n_buckets=32).cache()
        seg_df.count()
        wt = []
        for i in range(N_REPEAT):
            for q in BM25_QUERIES:
                t, _ = timed(lambda: wand_topk(seg_df, stats, q, k=10).collect())
                if i > 0:
                    wt.append(t)
        wt.sort()
        results["wand_query_p50"] = round(wt[len(wt) // 2], 4)
        results["wand_query_p95"] = round(wt[int(len(wt) * 0.95)], 4)
        seg_df.unpersist()
    except ImportError:
        pass

    t, n_pairs = timed(lambda: dedup.minhash_lsh_pairs(docs, threshold=0.2).count())
    results["minhash_dedup"] = round(t, 4)
    extra["minhash_pairs"] = n_pairs

    t, _ = timed(lambda: ann.cosine_topk(emb, 0, k=10).collect())
    results["ann_topk"] = round(t, 4)

    total = round(sum(results.values()), 4)
    out = {
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": sf,
        "n_docs": n_docs,
        "cpus": cpus,
        "extra": extra,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
