"""Sustained-scale evidence (VERDICT r2 #1): a 1M-doc index build at
local[32] with per-stage walls, query latency re-measured on the 1M
index (the "p95 flat across corpus growth" claim at another 10x), and
an adversarial Zipf-head skew stress (one trigram in >=60% of docs)
showing the (shard, bucket) encoder groups stay bounded — the shard
dimension is the implicit salt for hot terms.

Writes BENCH/scale_1m.json. Heavy: ~40 min wall on this VM.

Usage: python scripts/bench_scale_1m.py [n_docs] [skew_docs]
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

WORK = Path("/tmp/searty_scale1m")
N_SHARDS, N_BUCKETS = 16, 32


def _env():
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env["PYSPARK_PYTHON"] = sys.executable
    return env


def _cli(args: list[str], timeout: int = 5400) -> str:
    p = subprocess.run(
        [sys.executable, "-m", "searty_spark.cli", *args],
        capture_output=True, text=True, cwd=str(REPO), timeout=timeout, env=_env(),
    )
    if p.returncode != 0:
        print(p.stdout[-2000:], p.stderr[-4000:])
        raise SystemExit(f"cli failed: {args[:4]}")
    return [l for l in p.stdout.splitlines() if l.startswith("{")][-1]


def _stage_walls(idx: str) -> dict:
    out = {}
    for line in (Path(idx) / "checkpoint.jsonl").read_text().splitlines():
        rec = json.loads(line)
        out[rec["unit"]] = round(rec["wall_sec"], 2)
    return out


def gen_corpus(n_docs: int, path: str, skew: bool, cpus: int = 32) -> None:
    """Deterministic corpus; ``skew=True`` prefixes 60% of docs with a
    hot string so the trigrams 'hot'/'oth'/'tho' hit df >= 0.6 * N."""
    if Path(path).exists():
        return
    from pyspark.sql import functions as F

    from searty_spark.corpus import synth_corpus
    from searty_spark.session import get_spark

    spark = get_spark(cpus=cpus, app_name="gen1m")
    df = synth_corpus(spark, n_docs).select("doc_id", "url", "text", "lang")
    if skew:
        df = df.withColumn(
            "text",
            F.when(
                F.pmod("doc_id", F.lit(5)) < 3,
                F.concat(F.lit("hothothothothot "), F.col("text")),
            ).otherwise(F.col("text")),
        )
    df.write.mode("overwrite").parquet(path)
    spark.stop()


def group_size_stats(corpus: str, cpus: int = 32) -> dict:
    """Token-count distribution over the (shard, bucket) encoder groups
    — the direct driver of per-group encode wall (the kernel is linear
    in its token count)."""
    from pyspark.sql import functions as F

    from searty_spark.session import get_spark
    from searty_spark.tokenize import trigrams_col

    spark = get_spark(cpus=cpus, app_name="groupstats")
    docs = spark.read.parquet(corpus)
    toks = docs.select(
        "doc_id", F.posexplode(trigrams_col("text")).alias("pos", "term")
    )
    sizes = (
        toks.groupBy(
            F.pmod("doc_id", F.lit(N_SHARDS)).alias("shard"),
            F.pmod(F.xxhash64("term"), F.lit(N_BUCKETS)).alias("bucket"),
        )
        .count()
        .collect()
    )
    counts = sorted(r["count"] for r in sizes)
    hot = (
        toks.filter(F.col("term") == "hot")
        .groupBy(F.pmod("doc_id", F.lit(N_SHARDS)).alias("shard"))
        .agg(F.count_distinct("doc_id").alias("df"))
        .collect()
    )
    spark.stop()
    mean = sum(counts) / len(counts)
    return {
        "n_groups": len(counts),
        "mean_tokens": round(mean, 1),
        "max_tokens": counts[-1],
        "p99_tokens": counts[int(len(counts) * 0.99)],
        "max_over_mean": round(counts[-1] / mean, 3),
        "hot_term_df_per_shard_max": max((r["df"] for r in hot), default=0),
    }


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    skew_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    WORK.mkdir(parents=True, exist_ok=True)
    report: dict = {"n_docs": n_docs, "skew_docs": skew_docs,
                    "n_shards": N_SHARDS, "n_buckets": N_BUCKETS, "cpus": 32}

    # --- 1M sustained build ------------------------------------------------
    corpus = str(WORK / "corpus_1m.parquet")
    t0 = time.perf_counter()
    gen_corpus(n_docs, corpus, skew=False)
    report["gen_wall_sec"] = round(time.perf_counter() - t0, 1)
    idx = str(WORK / "idx_1m")
    shutil.rmtree(idx, ignore_errors=True)
    out = json.loads(_cli(["--cpus", "32", "build", "--corpus", corpus,
                           "--out", idx, "--shards", str(N_SHARDS),
                           "--buckets", str(N_BUCKETS), "--no-resume"]))
    report["build_wall_sec"] = round(out["wall_sec"], 1)
    report["docs_per_sec"] = round(n_docs / out["wall_sec"], 1)
    report["stage_walls"] = _stage_walls(idx)
    report["index_bytes"] = sum(
        f.stat().st_size for f in Path(idx).rglob("*") if f.is_file()
    )

    # --- query latency on the 1M index --------------------------------------
    q = json.loads(_cli(["--cpus", "32", "bench-queries", "--index", idx,
                         "--repeat", "5", "the", "and", "ing", "qu", "abcdef"],
                        timeout=1800))
    report["query_1m"] = {k: round(v, 4) for k, v in q.items()}

    # --- Zipf-head skew stress ----------------------------------------------
    skew_report = {}
    for label, skew in (("uniform", False), ("zipf_head", True)):
        c = str(WORK / f"corpus_skew_{label}.parquet")
        gen_corpus(skew_docs, c, skew=skew)
        skew_report[label] = {"groups": group_size_stats(c)}
        walls = []
        for rep in range(2):  # interleaved repeats: VM wall noise
            d = str(WORK / f"idx_skew_{label}")
            shutil.rmtree(d, ignore_errors=True)
            o = json.loads(_cli(["--cpus", "32", "build", "--corpus", c,
                                 "--out", d, "--shards", str(N_SHARDS),
                                 "--buckets", str(N_BUCKETS), "--no-resume"]))
            walls.append(o["wall_sec"])
        skew_report[label]["build_wall_sec_median"] = round(statistics.median(walls), 1)
        skew_report[label]["build_walls"] = [round(w, 1) for w in walls]
    skew_report["wall_ratio_zipf_over_uniform"] = round(
        skew_report["zipf_head"]["build_wall_sec_median"]
        / skew_report["uniform"]["build_wall_sec_median"], 3,
    )
    report["skew"] = skew_report

    (REPO / "BENCH" / "scale_1m.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report))


if __name__ == "__main__":
    main()
