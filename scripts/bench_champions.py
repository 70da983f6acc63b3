"""Champion-seeding latency evidence (round-4 item: 1M-index p95 below
0.55 s idle, identity preserved).

Builds (or reuses) the 1M-doc index of bench_scale_1m.py — which now
includes the champion sidecar — and measures warmed bench-queries
latency in INTERLEAVED A/B rounds: seeded (champions present) vs
unseeded (sidecar temporarily moved aside; ChampionClient degrades to
theta0=0, the round-3 behavior). Interleaving at the process level
means VM throttling drift hits both conditions equally; medians over
rounds are reported.

Writes BENCH/champions_1m.json.

Usage: python scripts/bench_champions.py [n_docs] [rounds]
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
# r3-comparable set (BENCH/scale_1m.json used exactly these) + the
# decode-heavy set: the corpus's true Zipf head by df ("url" is in
# ~95% of docs, "he " in ~17%) — the workload where posting decode
# and shuffled bytes dominate instead of job overhead
QUERY_SETS = {
    "r3set": ["the", "and", "ing", "qu", "abcdef"],
    "head": ["url", "he ", "nd "],
}


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


def ensure_index(n_docs: int) -> str:
    from scripts.bench_scale_1m import gen_corpus

    WORK.mkdir(parents=True, exist_ok=True)
    corpus = str(WORK / "corpus_1m.parquet")
    gen_corpus(n_docs, corpus, skew=False)
    idx = str(WORK / "idx_1m")
    stats_p = Path(idx) / "stats.json"
    ok = stats_p.exists() and json.loads(stats_p.read_text()).get("n_docs") == n_docs
    if not ok:
        shutil.rmtree(idx, ignore_errors=True)
        _cli(["--cpus", "32", "build", "--corpus", corpus, "--out", idx,
              "--shards", str(N_SHARDS), "--buckets", str(N_BUCKETS),
              "--no-resume"])
    if not (Path(idx) / "champions").exists():
        # the sidecar is derived post-hoc from the segments (exactly
        # what write_index's champions stage does) — graft it onto a
        # pre-champion index instead of rebuilding 1M docs
        from searty_spark.champions import write_champions
        from searty_spark.index import load_segments, load_stats
        from searty_spark.session import get_spark

        spark = get_spark(cpus=32, app_name="champ-graft")
        stats = load_stats(idx)
        t0 = time.perf_counter()
        n = write_champions(
            load_segments(spark, idx), idx, stats["n_docs"], stats["avgdl"]
        )
        print(f"grafted champions: {n} terms in {time.perf_counter() - t0:.1f}s",
              flush=True)
        spark.stop()
    meta_p = Path(idx) / "champions_meta.json"
    needs_stamp = not meta_p.exists() or "sidecar_fingerprint" not in json.loads(
        meta_p.read_text()
    )
    if needs_stamp:
        # sidecar predates the current stamp format but is KNOWN-derived
        # from these exact segments (this script built it); stamp it
        # rather than rebuild 1M docs' champion skim
        from searty_spark.champions import (
            CHAMPION_FORMAT,
            segment_fingerprint,
            sidecar_fingerprint,
        )
        from searty_spark.index import load_segments
        from searty_spark.session import get_spark

        spark = get_spark(cpus=32, app_name="champ-stamp")
        meta_p.write_text(json.dumps({
            "format": CHAMPION_FORMAT,
            "fingerprint": segment_fingerprint(load_segments(spark, idx)),
            "sidecar_fingerprint": sidecar_fingerprint(
                spark.read.parquet(str(Path(idx) / "champions"))
            ),
        }))
        spark.stop()
    return idx


def bench_round(idx: str, queries: list[str], repeat: int = 4) -> dict:
    q = json.loads(_cli(
        ["--cpus", "32", "bench-queries", "--index", idx,
         "--repeat", str(repeat), *queries], timeout=1800))
    return {"p50": q["p50"], "p95": q["p95"], "qps": q["qps"]}


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    idx = ensure_index(n_docs)
    champ_dir = Path(idx) / "champions"
    aside = Path(idx) / "champions.aside"
    n_championed = 0
    report: dict = {"n_docs": n_docs, "rounds": rounds, "query_sets": QUERY_SETS}

    results = {name: {"seeded": [], "unseeded": []} for name in QUERY_SETS}
    try:
        for r in range(rounds):
            t0 = time.perf_counter()
            # alternate the A/B order each round: disk-cache and CPU
            # state warm up across adjacent processes, so a fixed order
            # would bias whichever condition runs second
            order = ["seeded", "unseeded"] if r % 2 == 0 else ["unseeded", "seeded"]
            for cond in order:
                if cond == "unseeded":
                    champ_dir.rename(aside)
                try:
                    for name, qs in QUERY_SETS.items():
                        results[name][cond].append(bench_round(idx, qs))
                finally:
                    if cond == "unseeded":
                        aside.rename(champ_dir)
            print(f"round {r} ({'/'.join(order)}): "
                  + " ".join(f"{n}:{results[n]}" for n in QUERY_SETS)
                  + f" ({time.perf_counter() - t0:.0f}s)", flush=True)
    finally:
        if aside.exists():
            aside.rename(champ_dir)

    def med(rows, key):
        return round(statistics.median(x[key] for x in rows), 4)

    for name in QUERY_SETS:
        report[name] = {
            cond: {k: med(results[name][cond], k) for k in ("p50", "p95", "qps")}
            for cond in ("seeded", "unseeded")
        }
        report[name]["rounds"] = results[name]
        report[name]["p95_ratio_seeded_over_unseeded"] = round(
            report[name]["seeded"]["p95"] / report[name]["unseeded"]["p95"], 3
        )
    report["keep_frac"] = keep_frac(idx)
    (REPO / "BENCH" / "champions_1m.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report))


def keep_frac(idx: str, k: int = 10) -> dict:
    """Per-query-term fraction of blocks the theta0 seed CANNOT prune
    at kernel entry — the datum behind 'champions prune where they can
    help' (VERDICT r4 task 5). A term's block b survives when
    bound(b) + sum(other query terms' max block bounds) >= theta0; for
    a single-term query that reduces to bound(b) >= theta0. keep_frac
    1.0 = theta0 skips nothing (the ultra-common-term worst case);
    lower = real pruning."""
    import numpy as np
    from pyspark.sql import functions as F

    from searty_spark.champions import ChampionClient, champion_theta
    from searty_spark.index import load_segments, load_stats
    from searty_spark.session import get_spark
    from searty_spark.tokenize import tokenize
    from searty_spark.wand import TermDfClient, bm25_impact

    spark = get_spark(cpus=32, app_name="champ-keepfrac")
    stats = load_stats(idx)
    seg = load_segments(spark, idx)
    cc = ChampionClient(spark, idx)
    dic = TermDfClient(spark, idx)
    out: dict = {"stale_sidecar": cc.stale}
    for name, qs in QUERY_SETS.items():
        for q in qs:
            terms = sorted(set(tokenize(q)))
            dfs = dic.lookup(terms)
            ch = cc.lookup(terms)
            theta0 = champion_theta(ch, dfs, k, stats["n_docs"], stats["avgdl"])
            rows = seg.filter(F.col("term").isin(terms)).select(
                "term", "df", "block_max_tf", "block_min_dl"
            ).collect()
            bounds = {}
            for r in rows:
                b = bm25_impact(
                    np.asarray(r["block_max_tf"], dtype=np.float64),
                    np.asarray(r["block_min_dl"], dtype=np.float64),
                    stats["n_docs"], stats["avgdl"], int(dfs[r["term"]]),
                )
                bounds.setdefault(r["term"], []).append(b)
            per_term = {}
            ubs = {t: max(float(b.max()) for b in bs) for t, bs in bounds.items()}
            for t, bs in bounds.items():
                rest = sum(v for x, v in ubs.items() if x != t)
                total = sum(b.size for b in bs)
                kept = sum(int((b + rest >= theta0).sum()) for b in bs)
                per_term[t] = round(kept / total, 4) if total else 1.0
            out[f"{name}:{q}"] = {
                "theta0": round(theta0, 4),
                "df": {t: int(dfs.get(t, 0)) for t in terms},
                "keep_frac": per_term,
            }
    spark.stop()
    return out


if __name__ == "__main__":
    main()
