"""Adjudicate the round-4 concurrent-serving regression (VERDICT r4 #1).

BENCH_r04 concurrent_qps fell 9.68 -> 4.22 after bench.py switched the
8-thread server loop to wand_topk(pre_partitioned=True) over one shared
cached DataFrame. batch_wall_8q was flat, implicating concurrent-JOB
scheduling rather than the kernels. This script runs an interleaved A/B:

  shape  A  = r4: pre_partitioned=True (no per-query exchange)
  shape  B  = r3: per-query .repartition(n_shards, "shard")
  sched  fifo = all jobs in one pool (FIFO within pool == r3/r4 setup)
  sched  fair = one FAIR pool PER THREAD (jobs share cores fairly)

Each (shape, sched) cell is measured R times, cells ALTERNATED within
every round (VM throttling here swings +/-40% run-to-run — see
BENCH/BASELINE.md — so only interleaved medians are comparable).
Session runs with spark.scheduler.mode=FAIR; the "fifo" cells pin every
thread to one shared pool whose internal mode is FIFO, which is
scheduling-equivalent to the default FIFO scheduler.

Output: BENCH/concurrent_ab.json with per-cell walls + medians.

Usage: python scripts/bench_concurrent_ab.py [ROUNDS] [IDX_DIR]
"""

from __future__ import annotations

import concurrent.futures as cf
import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from searty_spark.index import load_segments, load_stats, write_index
from searty_spark.session import get_spark
from searty_spark.tokenize import tokenize
from searty_spark.wand import TermDfClient, wand_topk

QUERIES = [
    "data", "spark join", "vector group", "window merge", "customer",
    "table group", "phrase window", "join data",
]
N_SHARDS = 8


def run_cell(spark, seg_pre, seg_raw, stats, df_for, shape, sched):
    """One 8-thread concurrent wall for a (shape, sched) cell."""

    def one(args):
        i, q = args
        if sched == "fair":
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", f"q{i}")
        else:
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", "shared")
        t0 = time.perf_counter()
        wand_topk(
            seg_pre if shape == "pre" else seg_raw,
            None, q, k=10,
            n_docs=stats["n_docs"], avgdl=stats["avgdl"], n_shards=N_SHARDS,
            df_lookup=df_for(q), pre_partitioned=(shape == "pre"),
        ).collect()
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    with cf.ThreadPoolExecutor(max_workers=len(QUERIES)) as ex:
        lats = list(ex.map(one, enumerate(QUERIES)))
    return time.perf_counter() - t0, max(lats)


def main():
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    idx_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/searty_bench_idx"
    spark = get_spark(
        app_name="searty_conc_ab",
        extra_conf={"spark.scheduler.mode": "FAIR"},
    )
    if not Path(idx_dir, "stats.json").exists():
        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        write_index(docs, idx_dir, n_shards=N_SHARDS, n_buckets=32, resume=False)

    stats = load_stats(idx_dir)
    seg_pre = load_segments(spark, idx_dir).repartition(N_SHARDS, "shard").cache()
    seg_pre.count()
    seg_raw = load_segments(spark, idx_dir)  # r3 shape: exchange per query
    dic = TermDfClient(spark, idx_dir)

    def df_for(q):
        return dic.lookup(sorted(set(tokenize(q))))

    for q in QUERIES:  # fill the df cache so no cell pays the lookup
        df_for(q)

    cells = [("pre", "fifo"), ("rep", "fifo"), ("pre", "fair"), ("rep", "fair")]
    walls: dict[str, list[float]] = {f"{s}_{m}": [] for s, m in cells}
    p95s: dict[str, list[float]] = {f"{s}_{m}": [] for s, m in cells}
    for s, m in cells:  # warmup each path once
        run_cell(spark, seg_pre, seg_raw, stats, df_for, s, m)
    for r in range(rounds):
        for s, m in cells:
            w, mx = run_cell(spark, seg_pre, seg_raw, stats, df_for, s, m)
            walls[f"{s}_{m}"].append(round(w, 4))
            p95s[f"{s}_{m}"].append(round(mx, 4))
        print(f"round {r}: " + " ".join(f"{k}={v[-1]:.3f}" for k, v in walls.items()))

    out = {
        "rounds": rounds,
        "n_queries": len(QUERIES),
        "idx_dir": idx_dir,
        "walls": walls,
        "max_lat": p95s,
        "median_wall": {k: round(statistics.median(v), 4) for k, v in walls.items()},
        "median_qps": {
            k: round(len(QUERIES) / statistics.median(v), 2) for k, v in walls.items()
        },
    }
    Path("BENCH").mkdir(exist_ok=True)
    Path("BENCH/concurrent_ab.json").write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out["median_qps"]))


if __name__ == "__main__":
    main()
