"""Scale/skew stress for the substring-dedup family (round 6.2).

The plan claim under test: the window-text groupBy's map-side partial
aggregation collapses a hot template window per-partition BEFORE the
exchange, so a boilerplate template injected into 10% of the corpus
(every one of its k-windows occurring in n/10 documents — the
hot-key shape a 100-TB crawl actually has) must not cliff the
operator versus a uniform corpus of the same size.

Two corpora of n docs each (deterministic, synth_corpus-derived):

- uniform: synth_corpus as-is (organic duplicated 10-grams only —
  near zero at vocab 2000 / Zipf 1.07);
- skew: every 10th doc gets a fixed 49-token template PREPENDED to
  its own text (substring duplication, not exact-dup: the docs stay
  distinct, exercising spans/excision rather than hash dedup).

Interleaved uniform/skew reps (VM wall noise, CLAUDE.md), medians,
for dup_spans and excise_duplicates, plus correctness probes on the
skew side: every template carrier gets a span starting at token 1,
and excision removes the template coverage from every carrier except
the corpus-wide first (min doc_id).

Writes BENCH/substring_scale.json.
Usage: python scripts/bench_substring.py [n_docs] [reps]
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

WORK = Path("/tmp/searty_substring_scale")
TEMPLATE_LEN = 49
K = 10


def _template() -> str:
    from searty_spark.corpus import _make_vocab

    vocab = _make_vocab()
    return " ".join(vocab[100 : 100 + TEMPLATE_LEN])


def gen(spark, n_docs: int, skew: bool, path: str) -> None:
    if Path(path).exists():
        return
    from pyspark.sql import functions as F

    from searty_spark.corpus import synth_corpus

    df = synth_corpus(spark, n_docs).filter(F.col("lang") != "ja").select("doc_id", "text")
    if skew:
        df = df.withColumn(
            "text",
            F.when(
                F.col("doc_id") % 10 == 0,
                F.concat(F.lit(_template() + " "), F.col("text")),
            ).otherwise(F.col("text")),
        )
    df.write.mode("overwrite").parquet(path)


def run_once(spark, path: str, out: dict, label: str) -> None:
    from pyspark.sql import functions as F

    from searty_spark import dedup

    docs = spark.read.parquet(path)
    t0 = time.monotonic()
    n_spans = dedup.dup_spans(docs, k=K).count()
    out.setdefault(f"{label}_dup_spans_sec", []).append(time.monotonic() - t0)
    out[f"{label}_n_spans"] = n_spans
    t0 = time.monotonic()
    removed = dedup.excise_duplicates(docs, k=K).agg(
        F.sum("n_removed_tokens").alias("s"), F.count("*").alias("n")
    ).collect()[0]
    out.setdefault(f"{label}_excise_sec", []).append(time.monotonic() - t0)
    out[f"{label}_removed_tokens"] = removed["s"]
    out[f"{label}_n_docs"] = removed["n"]


def probe(spark, path: str, n_docs: int) -> dict:
    """Skew-side correctness: carriers get a span at token 1; excision
    keeps the template only on the first carrier (doc_id 0)."""
    from pyspark.sql import functions as F

    from searty_spark import dedup

    docs = spark.read.parquet(path)
    n_carriers = docs.filter(F.col("doc_id") % 10 == 0).count()
    spans1 = (
        dedup.dup_spans(docs, k=K)
        .filter((F.col("doc_id") % 10 == 0) & (F.col("span_start") == 1))
        .select("doc_id")
        .distinct()
        .count()
    )
    exc = dedup.excise_duplicates(docs, k=K)
    carriers_excised = exc.filter(
        (F.col("doc_id") % 10 == 0)
        & (F.col("doc_id") != 0)
        & (F.col("n_removed_tokens") >= TEMPLATE_LEN)
    ).count()
    first_kept = exc.filter(F.col("doc_id") == 0).collect()[0]
    return {
        "n_carriers": n_carriers,
        "carriers_with_span_at_1": spans1,
        "carriers_excised_at_least_template": carriers_excised,
        "first_carrier_keeps_template": bool(
            first_kept["clean_text"].startswith(_template())
        ),
    }


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from searty_spark.session import get_spark

    spark = get_spark()
    WORK.mkdir(parents=True, exist_ok=True)
    paths = {
        "uniform": str(WORK / f"uniform_{n_docs}"),
        "skew": str(WORK / f"skew_{n_docs}"),
    }
    gen(spark, n_docs, False, paths["uniform"])
    gen(spark, n_docs, True, paths["skew"])

    out: dict = {"n_docs": n_docs, "reps": reps, "k": K, "template_len": TEMPLATE_LEN}
    for _ in range(reps):  # interleaved: VM throttle hits both arms alike
        run_once(spark, paths["uniform"], out, "uniform")
        run_once(spark, paths["skew"], out, "skew")
    for key in list(out):
        if key.endswith("_sec"):
            out[key.replace("_sec", "_median_sec")] = round(
                statistics.median(out[key]), 3
            )
            out[key] = [round(x, 3) for x in out[key]]
    out["skew_over_uniform_spans"] = round(
        out["skew_dup_spans_median_sec"] / out["uniform_dup_spans_median_sec"], 3
    )
    out["skew_over_uniform_excise"] = round(
        out["skew_excise_median_sec"] / out["uniform_excise_median_sec"], 3
    )
    out["probe"] = probe(spark, paths["skew"], n_docs)

    dest = REPO / "BENCH" / f"substring_scale_{n_docs // 1000}k.json"
    dest.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
