"""Isolated per-operator benchmarks (guide §1.4): times each named
operator with the noop sink so the computation is measured, not the
sink or driver collect, and optionally dumps .explain("formatted") to
plans/<tag>/<name>_<suffix>.txt.

Usage:
    python bench_extra.py [--sf-dir DIR] [--plans TAG:SUFFIX] [--reps N] op [op ...]

Ops: ann_dup_lsh, minhash_dedup, prepare_corpus, substring_excise,
     phrase_df, bm25_df, index_build, lm_doc_scores, dedup_clusters,
     clean_corpus, jaccard_pairs, simhash_pairs, ngram_contamination.

Prints one JSON line {"op": sec, ...}. bench.py is FROZEN for driver
measurement; this file exists for optimization-round evidence only.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import shutil
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from searty_spark.session import get_spark  # noqa: E402


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans", default=None, help="TAG:SUFFIX -> write plans/TAG/<op>_SUFFIX.txt")
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("ops", nargs="+")
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(cpus=cpus, app_name="searty_bench_extra")
    sf_dir = args.sf_dir

    from pyspark.sql import functions as F  # noqa: E402

    from searty_spark import ann, dedup, textops  # noqa: E402
    from searty_spark.build import build_postings, doc_stats  # noqa: E402
    from searty_spark.query import bm25_topk, phrase_match_ranges  # noqa: E402

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    import __spark_entry__ as entry  # noqa: E402

    def df_for(op):
        if op == "ann_dup_lsh":
            return ann.cosine_dup_pairs_lsh(emb, threshold=0.45, dim=64)
        if op == "minhash_dedup":
            return dedup.minhash_lsh_pairs(docs, threshold=0.2)
        if op == "prepare_corpus":
            return entry.queries()["prepare_training_corpus"](spark, sf_dir)
        if op == "substring_excise":
            return dedup.excise_duplicates(docs, k=10).filter(F.col("n_removed_tokens") > 0)
        if op == "lm_doc_scores":
            return entry.queries()["lm_doc_scores"](spark, sf_dir)
        if op == "dedup_clusters":
            return dedup.dup_clusters(docs, threshold=0.2)
        if op == "clean_corpus":
            return entry.queries()["clean_corpus"](spark, sf_dir)
        if op == "jaccard_pairs":
            return dedup.jaccard_pairs(docs, threshold=0.2)
        if op == "simhash_pairs":
            return dedup.simhash_pairs(docs)
        if op == "ngram_contamination":
            return entry.queries()["ngram_contamination"](spark, sf_dir)
        raise SystemExit(f"unknown op {op}")

    out = {}
    for op in args.ops:
        spark.sparkContext.setJobDescription(f"bench_extra: {op}")
        if op == "index_build":
            from searty_spark.index import write_index

            walls = []
            for _ in range(args.reps):
                idx_dir = "/tmp/searty_bench_extra_idx"
                shutil.rmtree(idx_dir, ignore_errors=True)
                t0 = time.perf_counter()
                write_index(docs, idx_dir, n_shards=8, n_buckets=32, resume=False)
                walls.append(time.perf_counter() - t0)
                out["index_stage_walls"] = {
                    rec["unit"]: round(rec["wall_sec"], 4)
                    for rec in map(
                        json.loads,
                        Path(idx_dir, "checkpoint.jsonl").read_text().splitlines(),
                    )
                }
            out[op] = [round(w, 4) for w in walls]
            continue
        if op == "phrase_df" or op == "bm25_df":
            postings = build_postings(docs).cache()
            dstats = doc_stats(docs).cache()
            postings.count()
            dstats.count()
            walls = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                if op == "phrase_df":
                    for q in ["spark table", "table table"]:
                        phrase_match_ranges(postings, q).collect()
                else:
                    for q in ["data", "spark join", "vector group", "window merge", "customer"]:
                        bm25_topk(postings, dstats, q, k=10).collect()
                walls.append(time.perf_counter() - t0)
            postings.unpersist()
            dstats.unpersist()
            out[op] = [round(w, 4) for w in walls]
            continue
        df = df_for(op)
        if args.plans:
            tag, suffix = args.plans.split(":")
            pdir = Path(__file__).resolve().parent / "plans" / tag
            pdir.mkdir(parents=True, exist_ok=True)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            (pdir / f"{op}_{suffix}.txt").write_text(buf.getvalue())
        walls = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            _noop(df_for(op))
            walls.append(time.perf_counter() - t0)
        out[op] = [round(w, 4) for w in walls]
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({"sf_dir": sf_dir, "ops": out}))


if __name__ == "__main__":
    main()
