"""Skew-stress for prepare_training_corpus (VERDICT r5 stretch task):
the r5 1M-doc measurement used uniform synthetic docs; the 100-TB
corpus will instead carry template-duplicated mass (boilerplate crawls).
This re-runs the composite at 1M docs under a skewed duplicate
distribution —

- cluster 0: ONE exact-duplicate template carrying 10% of the corpus
  (100k identical texts -> one 100k-row partition in the stage-4
  keep-first window, pipeline.py:179-183 — the hot-key worst case);
- clusters 1..32: a Zipf tail (cluster c duplicates a template into
  ~6500/c docs);
- the rest unique.

Templates are sampled from the synthetic corpus itself so the cluster
mass SURVIVES the quality gate (run with min_stopword_ratio=0.0 — the
synthetic vocabulary has no English stopwords, the documented
non-prose recalibration path of pipeline.prepare_training_corpus) and actually reaches the dedup window
(a failing template would be dropped in stage 1 and stress nothing).

Interleaved uniform/skew repeats (VM wall noise, CLAUDE.md), medians,
plus per-signal-branch walls (quality / contamination / redaction /
full composite) and a correctness probe: exactly ONE survivor per
template cluster, and it is the cluster's minimum doc_id.

Writes BENCH/skew_composite.json.
Usage: python scripts/bench_skew_composite.py [n_docs] [reps]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

WORK = Path("/tmp/searty_skew_composite")
N_BENCH = 1000
N_ZIPF = 32


def gen(spark, n_docs: int, skew: bool, path: str, bench_path: str) -> None:
    if Path(path).exists():
        return
    from pyspark.sql import functions as F

    from searty_spark.corpus import synth_corpus

    df = synth_corpus(spark, n_docs).select("doc_id", "url", "text", "lang")
    if skew:
        from searty_spark.textops import ngram_contamination, quality_gopher

        # deterministic templates that survive stages 1-2 (gopher-pass
        # AND uncontaminated) — a template dropped upstream would never
        # reach the dedup window and stress nothing
        head = df.filter(F.col("doc_id") < 2000)
        ok = (
            quality_gopher(head, min_stopword_ratio=0.0)
            .filter("gopher_pass")
            .join(
                ngram_contamination(
                    head, spark.read.parquet(bench_path)
                ).filter(~F.col("contaminated")),
                "doc_id",
            )
            .join(head.select("doc_id", "text"), "doc_id")
        )
        tmpl = [
            r["text"]
            for r in ok.orderBy("doc_id").limit(N_ZIPF + 1).collect()
        ]
        assert len(tmpl) == N_ZIPF + 1, len(tmpl)
        # cluster 0: doc_id % 10 == 0 (10% of the corpus, one template).
        # Zipf tail: within doc_id % 10 == 1, bucket b = xxhash64 % 100
        # joins cluster c when b < 65/c summed -> cluster c gets
        # ~n/10 * (65/c - 65/(c+1))/100 docs ~ 6500/c^2... we use the
        # simpler harmonic rule: doc joins cluster c iff
        # pmod(xxhash64(doc_id), 1000) falls in c's harmonic slot.
        text = F.col("text")
        h = F.pmod(F.xxhash64("doc_id"), F.lit(1000))
        lo = 0
        cond = F.when(F.pmod("doc_id", F.lit(10)) == 0, F.lit(tmpl[0]))
        for c in range(1, N_ZIPF + 1):
            width = max(1, int(65 / c))
            cond = cond.when(
                (F.pmod("doc_id", F.lit(10)) == 1) & (h >= lo) & (h < lo + width),
                F.lit(tmpl[c]),
            )
            lo += width
        df = df.withColumn("text", cond.otherwise(text))
    df.write.mode("overwrite").parquet(path)


def run_once(spark, corpus: str, bench_path: str) -> dict:
    from pyspark.sql import functions as F

    from searty_spark.pipeline import prepare_training_corpus
    from searty_spark.textops import ngram_contamination, quality_gopher, redact_pii

    docs = spark.read.parquet(corpus)
    bench = spark.read.parquet(bench_path)
    walls = {}

    t0 = time.perf_counter()
    quality_gopher(docs, min_stopword_ratio=0.0).filter("gopher_pass").count()
    walls["quality"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    ngram_contamination(docs, bench).filter("contaminated").count()
    walls["contamination"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    redact_pii(docs).agg(F.sum("n_redactions")).collect()
    walls["redaction"] = round(time.perf_counter() - t0, 1)

    t0 = time.perf_counter()
    n_out = prepare_training_corpus(
        docs, bench=bench, min_stopword_ratio=0.0
    ).count()
    walls["composite"] = round(time.perf_counter() - t0, 1)
    walls["survivors"] = n_out
    return walls


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    WORK.mkdir(parents=True, exist_ok=True)

    from searty_spark.corpus import synth_corpus
    from searty_spark.session import get_spark

    spark = get_spark(cpus=32, app_name="skew-composite")

    from pyspark.sql import functions as F

    bench_path = str(WORK / f"bench_{N_BENCH}.parquet")
    if not Path(bench_path).exists():
        # different seed -> different texts than the corpus; ids shifted
        # out of the corpus id space
        synth_corpus(spark, N_BENCH, seed=777).select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"), "text"
        ).write.mode("overwrite").parquet(bench_path)

    paths = {}
    for label, skew in (("uniform", False), ("skew", True)):
        p = str(WORK / f"corpus_{label}_{n_docs}.parquet")
        gen(spark, n_docs, skew, p, bench_path)
        paths[label] = p

    runs: dict[str, list[dict]] = {"uniform": [], "skew": []}
    for _ in range(reps):  # interleave: VM wall noise (CLAUDE.md)
        for label in ("uniform", "skew"):
            runs[label].append(run_once(spark, paths[label], bench_path))

    report: dict = {"n_docs": n_docs, "reps": reps, "cpus": 32,
                    "template_cluster_pct": 10, "zipf_clusters": N_ZIPF}
    for label in ("uniform", "skew"):
        rs = runs[label]
        report[label] = {
            k: round(statistics.median(r[k] for r in rs), 1)
            for k in ("quality", "contamination", "redaction", "composite")
        }
        report[label]["survivors"] = rs[0]["survivors"]
        report[label]["all_composite_walls"] = [r["composite"] for r in rs]
    report["composite_skew_over_uniform"] = round(
        report["skew"]["composite"] / report["uniform"]["composite"], 3
    )

    # correctness probe under skew: the 10%-mass template cluster
    # collapses to exactly ONE survivor — its minimum doc_id
    from pyspark.sql import functions as F

    from searty_spark.pipeline import prepare_training_corpus

    docs = spark.read.parquet(paths["skew"])
    bench = spark.read.parquet(bench_path)
    out = prepare_training_corpus(docs, bench=bench, min_stopword_ratio=0.0)
    tmpl_doc = docs.filter(F.pmod("doc_id", F.lit(10)) == 0)
    surv_tmpl = out.join(
        tmpl_doc.select("doc_id"), "doc_id", "left_semi"
    ).select("doc_id").collect()
    # every cluster-0 doc has identical text -> identical clean_text ->
    # exactly one survivor, and the window orders by doc_id so it is
    # the minimum (doc_id 0 is template cluster 0's own min)
    report["skew_probe"] = {
        "template_survivors": len(surv_tmpl),
        "survivor_doc_id": surv_tmpl[0]["doc_id"] if surv_tmpl else None,
    }
    assert len(surv_tmpl) <= 1, surv_tmpl

    (REPO / "BENCH" / "skew_composite.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
