"""ANN lifecycle cost evidence: append scales with the BATCH, rebuild
with the CORPUS. Generates a deterministic synthetic embedding table
(N vectors, 64-dim, clustered), builds the artifact on the first 90%,
appends the last 10% under the frozen codebooks, and compares walls
against a full rebuild of 100% with the same codebooks (the identity
twin). Also times the stored query before/after append.

Writes BENCH/ann_lifecycle.json.

Usage: python scripts/bench_ann_lifecycle.py [n_vectors]
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F

from searty_spark.ann_index import (
    append_ann_index,
    ivf_pq_topk_indexed,
    load_ann_index,
    write_ann_index,
)
from searty_spark.session import get_spark


def gen_embeddings(spark, n: int):
    """Deterministic clustered vectors: 64 dims, value = a hash-mixed
    function of (vec_id, dim) plus a per-cluster offset — no RNG, so
    any engine regenerates the identical table."""
    return (
        spark.range(n)
        .withColumnRenamed("id", "vec_id")
        .select(
            "vec_id",
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda d: (
                    F.pmod(F.xxhash64(F.col("vec_id") * 64 + d), F.lit(1000)) / 1000.0
                    + (F.col("vec_id") % 16).cast("double") * F.when(d % 16 == F.col("vec_id") % 16, 0.5).otherwise(0.0)
                ).cast("float"),
            ).alias("embedding"),
            (F.col("vec_id") % 16).cast("int").alias("label"),
        )
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark(app_name="ann-lifecycle-bench")
    emb = gen_embeddings(spark, n).localCheckpoint()
    emb.count()
    old = emb.filter(F.col("vec_id") < int(n * 0.9))
    new = emb.filter(F.col("vec_id") >= int(n * 0.9))

    base = Path("/tmp/searty_ann_lifecycle")
    shutil.rmtree(base, ignore_errors=True)
    d_main, d_full = str(base / "main"), str(base / "full")

    t0 = time.perf_counter()
    write_ann_index(old, d_main, n_cells=64, m=8, pq_k=16)
    t_build = time.perf_counter() - t0

    ivf_pq_topk_indexed(emb, d_main, 0, k=10, n_probe=8, refine=100).collect()
    t0 = time.perf_counter()
    ivf_pq_topk_indexed(emb, d_main, 0, k=10, n_probe=8, refine=100).collect()
    t_q_before = time.perf_counter() - t0

    # second copy of the 90% artifact: the no-check append isolates the
    # batch-scaled encode+write from the corpus-proportional
    # disjointness semi-join
    d_nochk = str(base / "nochk")
    shutil.copytree(d_main, d_nochk)

    t0 = time.perf_counter()
    stats = append_ann_index(new, d_main)
    t_append = time.perf_counter() - t0

    t0 = time.perf_counter()
    append_ann_index(new, d_nochk, check_disjoint=False)
    t_append_nochk = time.perf_counter() - t0

    _, cents, books, _ = load_ann_index(spark, d_main)
    t0 = time.perf_counter()
    write_ann_index(emb, d_full, cents=cents, books=books)
    t_rebuild = time.perf_counter() - t0

    t0 = time.perf_counter()
    ivf_pq_topk_indexed(emb, d_main, 0, k=10, n_probe=8, refine=100).collect()
    t_q_after = time.perf_counter() - t0

    out = {
        "n_vectors": n,
        "batch_frac": 0.1,
        "build_90pct_sec": round(t_build, 2),
        "append_10pct_sec": round(t_append, 2),
        "append_10pct_nocheck_sec": round(t_append_nochk, 2),
        "rebuild_100pct_sec": round(t_rebuild, 2),
        "append_over_rebuild": round(t_append / t_rebuild, 3),
        "stored_query_before_sec": round(t_q_before, 3),
        "stored_query_after_sec": round(t_q_after, 3),
        "n_vectors_final": stats["n_vectors"],
        "note": "append includes the existing-corpus disjointness semi-join "
                "(check_disjoint=True, the default); rebuild encodes under the "
                "same frozen codebooks (the row-identity twin)",
    }
    (REPO / "BENCH" / "ann_lifecycle.json").write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
