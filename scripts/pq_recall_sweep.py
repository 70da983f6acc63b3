"""PQ recall sweep — flat vs residual, m x k x refine, honest sampling.

Round-4 introduced this sweep with recall averaged over the FIRST
n_queries vec_ids. Round 6.1 found that sample is badly biased on the
sf0.1 fixture: the first-20 queries read 0.94 recall@10 for residual
k16 refine200 where the all-2000-query mean is 0.66 — and the biased
sample even inverted the flat-vs-residual ordering. Queries are now
STRIDED across the whole fixture (every n/n_queries-th vec_id), which
converges to the all-query mean, and the sweep covers the two levers
that actually move adversarial recall: subspace count m (8 vs 16) and
refine depth (50..400).

Measures recall@10 of the PQ ADC + exact-re-rank pipeline against
brute-force cosine truth on:

- the synthetic sf0.1 embeddings (near-uniform directions — the
  ADVERSARIAL case for PQ: all similarities are low and close, so code
  quantization error swamps the signal; also the case where residual
  encoding CANNOT help, because near-uniform directions carry no
  cluster structure for the coarse quantizer to remove);
- a clustered fixture (16 deterministic centers + small noise — the
  shape real text embeddings have), where residual encoding is the
  win and refine=200 is exact.

Codebooks train through ann.pq_train (the real path); the ADC scan is
replayed in numpy with the same helper math (ann._sub_l2_argmin /
_unit_rows) — recall is a property of the trained codebooks and the
candidate rule, which this replays bit-for-bit (the Spark path is
separately oracle-gated for exactness).

Writes BENCH/pq_recall.json.
Usage: python scripts/pq_recall_sweep.py [sf_dir] [n_queries]
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

MS = [8, 16]
REFINES = [50, 100, 200, 400]
KCS = [16, 32]
K = 10


def load_vectors(spark, sf_dir: str) -> np.ndarray:
    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .orderBy("vec_id").collect()
    )
    return np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])


def clustered_fixture(n: int = 2000, dim: int = 64, n_clusters: int = 16) -> np.ndarray:
    """Deterministic clustered embeddings: md5-seeded centers, each
    vector = its cluster center + N(0, 0.15) noise."""
    def rng(tag: str):
        seed = int.from_bytes(hashlib.md5(tag.encode()).digest()[:8], "big")
        return np.random.default_rng(seed)

    centers = rng("centers").normal(size=(n_clusters, dim))
    out = np.empty((n, dim))
    for i in range(n):
        c = i % n_clusters
        out[i] = centers[c] + rng(f"noise-{i}").normal(scale=0.15, size=dim)
    return out


def sweep(spark, V: np.ndarray, n_queries: int) -> dict:
    """Flat PQ and residual IVF-PQ (books trained on v - centroid[cell],
    ADC anchored on the exact <q, centroid> term) side by side, for
    each m in MS, k in KCS, refine in REFINES."""
    from pyspark.sql import types as T

    from searty_spark import ann

    n, dim = V.shape
    Vu = ann._unit_rows(V)
    sims = np.round(Vu @ Vu.T, 6)
    emb_df = spark.createDataFrame(
        [(int(i), V[i].astype(float).tolist()) for i in range(n)],
        T.StructType([
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]),
    )
    stride = max(1, n // n_queries)
    qids = list(range(0, n, stride))[:n_queries]

    def truth(q: int) -> set:
        order = [int(i) for i in np.lexsort((np.arange(n), -sims[q])) if i != q]
        return set(order[:K])

    def measure(m: int, books, codes, base_by_cell=None, cell=None) -> dict:
        dsub = dim // m
        hits = {refine: [] for refine in REFINES}
        for q in qids:
            qv = Vu[q]
            tbl = np.stack([
                books[j] @ qv[j * dsub:(j + 1) * dsub] for j in range(m)
            ])
            tsum = tbl[np.arange(m)[None, :], codes].sum(axis=1)
            if base_by_cell is not None:
                tsum = base_by_cell(qv)[cell] + tsum
            approx = np.round(tsum, 6)
            approx[q] = -np.inf
            # one ADC ordering per query; each refine depth is a prefix
            order = np.lexsort((np.arange(n), -approx))
            tq = truth(q)
            for refine in REFINES:
                cand = order[:refine]
                exact = sims[q, cand]
                top = cand[np.lexsort((cand, -exact))[:K]]
                hits[refine].append(len(set(map(int, top)) & tq) / K)
        return {r: round(float(np.mean(v)), 4) for r, v in hits.items()}

    cents = ann.ivf_train(emb_df, n_cells=32, n_iter=2, sample=4096)
    cell = np.argmax(np.round(Vu @ cents.T, 6), axis=1)
    R = Vu - cents[cell]
    out = {}
    for m in MS:
        dsub = dim // m
        for kc in KCS:
            books = ann.pq_train(emb_df, m=m, k=kc, n_iter=2, sample=4096)
            codes = np.empty((n, m), dtype=np.int64)
            for j in range(m):
                codes[:, j] = ann._sub_l2_argmin(
                    Vu[:, j * dsub:(j + 1) * dsub], books[j]
                )
            for refine, rec in measure(m, books, codes).items():
                out[f"m{m}_k{kc}_refine{refine}"] = rec

            rbooks = ann.pq_train(emb_df, m=m, k=kc, n_iter=2, sample=4096, cents=cents)
            rcodes = np.empty((n, m), dtype=np.int64)
            for j in range(m):
                rcodes[:, j] = ann._sub_l2_argmin(
                    R[:, j * dsub:(j + 1) * dsub], rbooks[j]
                )
            for refine, rec in measure(
                m, rbooks, rcodes, base_by_cell=lambda qv: cents @ qv, cell=cell
            ).items():
                out[f"residual_m{m}_k{kc}_refine{refine}"] = rec
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    from searty_spark.session import get_spark

    spark = get_spark(cpus=8, app_name="pq-recall-sweep")
    report = {
        "m": MS, "k_top": K, "n_queries": n_queries,
        "query_sampling": "strided across the full fixture (round 6.1: "
                          "first-N sampling was biased +0.28 on sf0.1)",
        "synthetic_uniform": sweep(spark, load_vectors(spark, sf_dir), n_queries),
        "clustered_fixture": sweep(spark, clustered_fixture(), n_queries),
    }
    (REPO / "BENCH" / "pq_recall.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
