"""PQ recall sweep (round-4 item: replace the single recall@10 = 0.6
data point with a measured refine/codebook-size trade-off table).

Measures recall@10 of the PQ ADC + exact-re-rank pipeline against
brute-force cosine truth, averaged over the first N_QUERIES query
vectors, for refine in {50, 100, 200} x codebook k in {16, 32}, on:

- the synthetic sf0.1 embeddings (near-uniform directions — the
  ADVERSARIAL case for PQ: all similarities are low and close, so code
  quantization error swamps the signal);
- a clustered fixture (16 deterministic centers + small noise — the
  shape real text embeddings have), where PQ should be near-exact.

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

M = 8
REFINES = [50, 100, 200]
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
    """Flat PQ and residual IVF-PQ (the production default since round
    6: books trained on v - centroid[cell], ADC anchored on the exact
    <q, centroid> term) side by side."""
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

    def truth(q: int) -> set:
        order = [int(i) for i in np.lexsort((np.arange(n), -sims[q])) if i != q]
        return set(order[:K])

    def measure(books, codes, base_by_cell=None, cell=None):
        dsub = dim // M
        res = {}
        for refine in REFINES:
            recalls = []
            for q in range(n_queries):
                qv = Vu[q]
                tbl = np.stack([
                    books[j] @ qv[j * dsub:(j + 1) * dsub] for j in range(M)
                ])
                tsum = tbl[np.arange(M)[None, :], codes].sum(axis=1)
                if base_by_cell is not None:
                    tsum = base_by_cell(qv)[cell] + tsum
                approx = np.round(tsum, 6)
                approx[q] = -np.inf
                cand = np.lexsort((np.arange(n), -approx))[:refine]
                exact = sims[q, cand]
                top = cand[np.lexsort((cand, -exact))[:K]]
                recalls.append(len(set(map(int, top)) & truth(q)) / K)
            res[refine] = round(float(np.mean(recalls)), 4)
        return res

    dsub = dim // M
    cents = ann.ivf_train(emb_df, n_cells=32, n_iter=2, sample=4096)
    cell = np.argmax(np.round(Vu @ cents.T, 6), axis=1)
    R = Vu - cents[cell]
    out = {}
    for kc in KCS:
        books = ann.pq_train(emb_df, m=M, k=kc, n_iter=2, sample=4096)
        codes = np.empty((n, M), dtype=np.int64)
        for j in range(M):
            codes[:, j] = ann._sub_l2_argmin(
                Vu[:, j * dsub:(j + 1) * dsub], books[j]
            )
        for refine, rec in measure(books, codes).items():
            out[f"k{kc}_refine{refine}"] = rec

        rbooks = ann.pq_train(emb_df, m=M, k=kc, n_iter=2, sample=4096, cents=cents)
        rcodes = np.empty((n, M), dtype=np.int64)
        for j in range(M):
            rcodes[:, j] = ann._sub_l2_argmin(
                R[:, j * dsub:(j + 1) * dsub], rbooks[j]
            )
        for refine, rec in measure(
            rbooks, rcodes, base_by_cell=lambda qv: cents @ qv, cell=cell
        ).items():
            out[f"residual_k{kc}_refine{refine}"] = rec
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    from searty_spark.session import get_spark

    spark = get_spark(cpus=8, app_name="pq-recall-sweep")
    report = {
        "m": M, "k_top": K, "n_queries": n_queries,
        "synthetic_uniform": sweep(spark, load_vectors(spark, sf_dir), n_queries),
        "clustered_fixture": sweep(spark, clustered_fixture(), n_queries),
    }
    (REPO / "BENCH" / "pq_recall.json").write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
