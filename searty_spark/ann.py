"""Similarity search over an embedding column (array<float>).

- :func:`cosine_topk` — brute-force cosine top-k, the correctness
  baseline. The dot product is a JVM-side ``zip_with`` +
  sequential ``aggregate`` fold in DOUBLE precision — the fold order
  is deterministic, which is what makes the score reproducible across
  engines and partitionings.
- :func:`ivf_topk` — the scale path: a deterministic IVF variant.
  Vectors are assigned to their nearest centroid (the first
  ``n_cells`` vectors serve as fixed centroids — deterministic, no
  k-means iterations to reproduce); queries probe ``n_probe`` cells.
  At 100 TB the cell assignment is the partitioning key, so a query
  touches 1/n_cells of the data.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(embeddings: DataFrame, query_vec_id: int, k: int = 10) -> DataFrame:
    """(vec_id, cos) top-k by cosine to the query vector, excluding it."""
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb")
    )
    return (
        embeddings.filter(F.col("vec_id") != query_vec_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine_col(F.col("embedding"), F.col("q_emb")), 6).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def cosine_dup_pairs(embeddings: DataFrame, threshold: float = 0.45) -> DataFrame:
    """(vec_id_a, vec_id_b, cos) — embedding-cosine near-duplicate
    pairs by exact all-pairs comparison. This is the CORRECTNESS
    BASELINE / oracle only; the scale path is
    :func:`cosine_dup_pairs_lsh`, which replaces the cartesian with a
    sign-LSH band join and verifies candidates exactly."""
    a = embeddings.select(F.col("vec_id").alias("vec_id_a"), F.col("embedding").alias("ea"))
    b = embeddings.select(F.col("vec_id").alias("vec_id_b"), F.col("embedding").alias("eb"))
    return (
        a.join(b, F.col("vec_id_a") < F.col("vec_id_b"))
        .select(
            "vec_id_a",
            "vec_id_b",
            F.round(cosine_col(F.col("ea"), F.col("eb")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .orderBy("vec_id_a", "vec_id_b")
    )


def _unit_rows(v: np.ndarray) -> np.ndarray:
    """Row-normalize, mapping zero-norm rows to the zero vector instead
    of NaN (cosine against everything is then 0 and argmax over the
    all-zero similarity row deterministically picks cell 0 — never a
    silent NaN propagating into argmax/means)."""
    norms = np.linalg.norm(v, axis=1, keepdims=True)
    return v / np.where(norms > 0, norms, 1.0)


def _lsh_planes(n_bits: int, dim: int):
    """Deterministic Rademacher (+-1) hyperplanes for sign-LSH.

    Seeded per-plane from md5, so every executor regenerates the exact
    same matrix — no randomness crosses the driver/worker boundary and
    results are reproducible across runs, partitionings and engines.
    Rademacher entries are a valid sign-random-projection family
    (Achlioptas 2001-style sparse/binary projections)."""
    m = np.empty((n_bits, dim))
    for j in range(n_bits):
        seed = int.from_bytes(hashlib.md5(f"hyper-{j}".encode()).digest()[:8], "big")
        m[j] = np.random.default_rng(seed).choice([-1.0, 1.0], size=dim)
    return m


def lsh_band_keys(
    embeddings: DataFrame, dim: int, rows_per_band: int = 4, n_bands: int = 16
) -> DataFrame:
    """(vec_id, band, key) — sign-LSH band keys.

    bit_j = sign(<v, plane_j>); band key packs ``rows_per_band`` bits.
    The projection is a single numpy matmul per Arrow batch (a pandas
    UDF beats 64 JVM fold expressions here); everything downstream is
    a JVM equi-join on uniform (band, key) hash keys.

    Collision probability per band for angle theta is
    (1 - theta/pi)^rows_per_band, so BOTH pruning power and recall
    depend on the threshold's margin over the data: at a production
    near-dup threshold (cos >= 0.9) a pair at the boundary collides in
    some band with probability 1 - 2e-13 — recall is effectively exact
    AND ~92% of random pairs are pruned per band. At the adversarially
    low 0.45 the driver gate uses, a boundary pair misses all 16 bands
    with probability ~4.5%: measured recall is 1.0 on the 500-vector
    sf0.001/sf0.01 corpora (asserted by the driver gate vs the exact
    all-pairs oracle) and 141/144 = 0.979 on the 2000-vector sf0.1
    corpus — the expected sign-LSH behavior when the threshold has no
    margin over the background similarity, not an implementation
    defect (raise n_bands to trade compute for recall; at this
    threshold high recall necessarily approaches the all-pairs cost,
    which is why the exact twin exists)."""
    n_bits = rows_per_band * n_bands

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def band_keys(emb: pd.Series) -> pd.Series:
        m = _lsh_planes(n_bits, dim)
        v = np.stack(emb.to_numpy()).astype(np.float64)
        bits = (v @ m.T) > 0
        weights = 1 << np.arange(rows_per_band, dtype=np.int64)
        keys = [
            bits[:, b * rows_per_band : (b + 1) * rows_per_band] @ weights
            for b in range(n_bands)
        ]
        return pd.Series(np.stack(keys, axis=1).tolist())

    return (
        embeddings.select("vec_id", F.posexplode(band_keys("embedding")).alias("band", "key"))
    )


def cosine_dup_pairs_lsh(
    embeddings: DataFrame,
    threshold: float = 0.45,
    dim: int = 64,
    rows_per_band: int = 4,
    n_bands: int = 16,
) -> DataFrame:
    """Embedding near-dup pairs via sign-LSH banding + exact-cosine
    verification — the 100-TB shape of :func:`cosine_dup_pairs`.

    Candidate SEMANTICS are unchanged from the banded formulation: a
    pair is a candidate iff the two vectors share at least one
    (band, key) bucket, and every candidate is verified with the exact
    JVM-side cosine, so the output is deterministic and, whenever band
    recall is 1.0, identical to the all-pairs baseline (the driver
    gates this query against the all-pairs SQL oracle).

    Execution shape (r7): the band keys are computed in the SAME
    projection that carries the vector, each (band, key) bucket's
    near-threshold pairs are found by a blocked numpy matmul INSIDE the
    bucket group (one applyInPandas — no pair row ever exists for a
    sub-threshold pair), and only the surviving candidate ids flow into
    the unchanged exact-cosine verification. The prefilter keeps a
    1e-6 margin under the threshold (covers round-half-up at 6 decimals
    plus float fold-order differences), so it can only ADD candidates
    relative to the final exact filter, never drop one — the output is
    decided by the identical JVM expression either way. The previous
    formulation materialized every within-bucket pair as a row
    (vec_ids joined on (band, key)), distinct-ed them, and shuffled the
    64-float embedding onto every pair TWICE: at 20k vectors / 4-bit
    band keys that is ~2*10^8 pair rows and ~140 GB of joined embedding
    traffic for a 16k-pair answer (measured 393 s; this shape: the
    vectors move once, with their keys, ~176 MB)."""
    n_bits = rows_per_band * n_bands

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def band_keys(emb: pd.Series) -> pd.Series:
        m = _lsh_planes(n_bits, dim)
        v = np.stack(emb.to_numpy()).astype(np.float64)
        bits = (v @ m.T) > 0
        weights = 1 << np.arange(rows_per_band, dtype=np.int64)
        keys = [
            bits[:, b * rows_per_band : (b + 1) * rows_per_band] @ weights
            for b in range(n_bands)
        ]
        return pd.Series(np.stack(keys, axis=1).tolist())

    kv = embeddings.select(
        "vec_id",
        "embedding",
        F.posexplode(band_keys("embedding")).alias("band", "key"),
    )
    # No false negatives: exact filter is round(cos, 6) >= threshold
    # (HALF_UP), so a true cos of threshold - 5e-7 still passes — the
    # prefilter bound must sit below that, plus fold-order slack.
    thr = threshold - 1e-6

    def near_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order].astype(np.int64)
        v = np.stack(pdf["embedding"].to_numpy())[order].astype(np.float64)
        norms = np.linalg.norm(v, axis=1)
        zero = norms == 0.0
        vn = v / np.where(norms > 0, norms, 1.0)[:, None]
        n = ids.size
        out_a: list[np.ndarray] = []
        out_b: list[np.ndarray] = []
        # bound the sims buffer to ~128 MB regardless of bucket size
        blk = max(32, min(1024, (16 * 1024 * 1024) // max(n, 1)))
        for s in range(0, n, blk):
            e = min(s + blk, n)
            sims = vn[s:e] @ vn[s:].T  # row i -> global s+i, col j -> global s+j
            ii, jj = np.nonzero(sims >= thr)
            ii += s
            jj += s
            keep = jj > ii
            out_a.append(ids[ii[keep]])
            out_b.append(ids[jj[keep]])
        if zero.any():
            # a zero-norm vector's JVM cosine is 0/0 — not representable
            # here; emit its pairs conservatively and let the exact
            # verification decide (fixture corpora contain none)
            for z in np.nonzero(zero)[0]:
                others = np.delete(np.arange(n), z)
                lo = np.minimum(ids[z], ids[others])
                hi = np.maximum(ids[z], ids[others])
                out_a.append(lo)
                out_b.append(hi)
        a = np.concatenate(out_a) if out_a else np.empty(0, dtype=np.int64)
        b = np.concatenate(out_b) if out_b else np.empty(0, dtype=np.int64)
        return pd.DataFrame({"vec_id_a": a, "vec_id_b": b})

    cand = (
        kv.groupBy("band", "key")
        .applyInPandas(near_pairs, "vec_id_a long, vec_id_b long")
        .distinct()
    )
    ea = embeddings.select(F.col("vec_id").alias("vec_id_a"), F.col("embedding").alias("ea"))
    eb = embeddings.select(F.col("vec_id").alias("vec_id_b"), F.col("embedding").alias("eb"))
    return (
        cand.join(ea, "vec_id_a")
        .join(eb, "vec_id_b")
        .select(
            "vec_id_a",
            "vec_id_b",
            F.round(cosine_col(F.col("ea"), F.col("eb")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .orderBy("vec_id_a", "vec_id_b")
    )


def ivf_train(
    embeddings: DataFrame, n_cells: int = 32, n_iter: int = 2, sample: int = 4096
) -> np.ndarray:
    """Deterministic spherical k-means centroids, trained driver-side
    on a bounded sample — the production IVF shape: training touches
    ``sample`` vectors regardless of corpus size (at 10^12 rows the
    codebook still trains on a constant-size sample), while assignment
    stays fully distributed (:func:`ivf_assign_centroids`).

    Determinism: the sample is the ``sample`` lowest vec_ids, the init
    is its first ``n_cells`` vectors, and every update runs in fixed
    numpy order — identical centroids on every run/driver. Empty cells
    keep their previous centroid. Assignment decisions compare
    similarities ROUNDED to 6 decimals (ties -> lowest cell), so they
    are engine-agnostic: an independent implementation that sums dot
    products in a different order (the DuckDB oracle does) reaches the
    same cells, which is what makes the trained path gateable."""
    rows = (
        embeddings.orderBy("vec_id").limit(sample).select("vec_id", "embedding").collect()
    )
    v = _unit_rows(np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows]))
    cents = v[:n_cells].copy()
    for _ in range(n_iter):
        sims = np.round(v @ cents.T, 6)
        assign = np.argmax(sims, axis=1)
        for c in range(n_cells):
            members = v[assign == c]
            if members.size:
                m = members.mean(axis=0)
                norm = np.linalg.norm(m)
                if norm > 0:
                    cents[c] = m / norm
    return cents


def ivf_assign_centroids(embeddings: DataFrame, cents: np.ndarray) -> DataFrame:
    """(vec_id, cell) — distributed nearest-centroid assignment against
    an explicit codebook (broadcast as an Arrow-batch constant). One
    numpy matmul per batch; the output cell is the natural partitioning
    key for the vector table at scale."""
    c = np.asarray(cents, dtype=np.float64)

    @F.pandas_udf(T.LongType())
    def best_cell(emb: pd.Series) -> pd.Series:
        v = _unit_rows(np.stack(emb.to_numpy()).astype(np.float64))
        # rounded compare, ties -> lowest cell (see ivf_train docstring)
        return pd.Series(np.argmax(np.round(v @ c.T, 6), axis=1).astype(np.int64))

    return embeddings.select("vec_id", best_cell("embedding").alias("cell"))


def ivf_topk_trained(
    embeddings: DataFrame,
    query_vec_id: int,
    cents: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Approximate top-k against a trained codebook: probe the
    ``n_probe`` cells nearest the query, exact cosine inside them."""
    assign = ivf_assign_centroids(embeddings, cents)
    q_rows = embeddings.filter(F.col("vec_id") == query_vec_id).select("embedding").collect()
    qv = _unit_rows(np.asarray(q_rows[0]["embedding"], dtype=np.float64)[None, :])[0]
    c = np.asarray(cents, dtype=np.float64)
    # stable sort on rounded sims: ties -> lowest cell (engine-agnostic)
    probe = np.argsort(-np.round(c @ qv, 6), kind="stable")[:n_probe].tolist()
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb")
    )
    cand = (
        embeddings.join(assign, "vec_id")
        .filter(F.col("cell").isin(probe))
        .filter(F.col("vec_id") != query_vec_id)
    )
    return (
        cand.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine_col(F.col("embedding"), F.col("q_emb")), 6).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def _sub_l2_argmin(sub: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Nearest-centroid assignment by squared L2, computed in the
    ALGEBRAIC form ||x||^2 - 2 x.c + ||c||^2 and compared ROUNDED to 6
    decimals (ties -> lowest code) — the same engine-agnostic decision
    rule as the IVF path, replayable in SQL."""
    d2 = (
        (sub * sub).sum(axis=1, keepdims=True)
        - 2.0 * (sub @ cents.T)
        + (cents * cents).sum(axis=1)[None, :]
    )
    return np.argmin(np.round(d2, 6), axis=1)


def pq_train(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    n_iter: int = 2,
    sample: int = 4096,
    cents: np.ndarray | None = None,
) -> np.ndarray:
    """Product-quantization codebooks, shape (m, k, dim/m): the vector
    is split into ``m`` subvectors and each subspace gets its own
    ``k``-centroid L2 k-means, trained driver-side on a bounded sample
    of NORMALIZED vectors (constant training cost at any corpus size —
    same regime as ivf_train). Deterministic: sample = lowest vec_ids,
    init = first k sample subvectors, updates are plain means (no
    normalization — PQ approximates the vector, not its direction),
    empty cells keep their previous centroid, every assignment compares
    round(d^2, 6) with ties to the lowest code.

    ``cents`` switches to RESIDUAL training — the FAISS IVF-PQ shape:
    each sample vector is assigned to its nearest IVF centroid (same
    rounded argmax as ivf_assign_centroids) and the codebooks learn
    v - centroid[cell] instead of v, at zero change to query cost.
    Residual encoding helps exactly when the data clusters (the shape
    real text embeddings have): residuals then carry less energy per
    quantized bit — on the clustered sweep fixture it lifts recall@10
    at refine=100 from 0.82 to 0.90 (BENCH/pq_recall.json). On
    near-uniform directions there is no cluster structure for the
    coarse quantizer to remove and residual slightly UNDERPERFORMS
    flat; the lever that moves recall there is ``m`` (more, finer
    subspaces: m=16 flat reads 0.94 at refine=200 where m=8 reads
    0.74) and refine depth. Measured with strided query sampling —
    the earlier first-N sample overstated residual recall by +0.28."""
    rows = (
        embeddings.orderBy("vec_id").limit(sample).select("vec_id", "embedding").collect()
    )
    v = _unit_rows(np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows]))
    if cents is not None:
        c = np.asarray(cents, dtype=np.float64)
        cell = np.argmax(np.round(v @ c.T, 6), axis=1)
        v = v - c[cell]
    dim = v.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = np.empty((m, k, dsub))
    for j in range(m):
        sub = v[:, j * dsub : (j + 1) * dsub]
        cents = sub[:k].copy()
        for _ in range(n_iter):
            assign = _sub_l2_argmin(sub, cents)
            for c in range(k):
                members = sub[assign == c]
                if members.size:
                    cents[c] = members.mean(axis=0)
        books[j] = cents
    return books


def pq_encode(
    embeddings: DataFrame, books: np.ndarray, cents: np.ndarray | None = None
) -> DataFrame:
    """(vec_id, codes array<int>) — distributed PQ encoding: one Arrow
    batch = m small matmuls; the 64-dim float vector compresses to m
    bytes of codes, the representation an ADC scan reads at 10^12
    scale (the raw vectors stay in cold storage for the re-rank).
    ``cents`` encodes RESIDUALS v - centroid[cell] (books must be
    residual-trained) — the twin of pq_train(cents=...)."""
    b = np.asarray(books, dtype=np.float64)
    m, _, dsub = b.shape
    c = None if cents is None else np.asarray(cents, dtype=np.float64)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def enc(emb: pd.Series) -> pd.Series:
        v = _unit_rows(np.stack(emb.to_numpy()).astype(np.float64))
        if c is not None:
            v = v - c[np.argmax(np.round(v @ c.T, 6), axis=1)]
        codes = np.empty((v.shape[0], m), dtype=np.int32)
        for j in range(m):
            codes[:, j] = _sub_l2_argmin(v[:, j * dsub : (j + 1) * dsub], b[j])
        return pd.Series(codes.tolist())

    return embeddings.select("vec_id", enc("embedding").alias("codes"))


def pq_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    books: np.ndarray,
    k: int = 10,
    refine: int = 50,
    candidates: DataFrame | None = None,
    codes: DataFrame | None = None,
    cents: np.ndarray | None = None,
    _qv: np.ndarray | None = None,
) -> DataFrame:
    """(vec_id, cos) — ADC (asymmetric distance computation) top-k:
    approx_cos(q, x) = sum_j <q_j, codebook_j[code_j(x)]> read from a
    broadcast (m x k) lookup table, then the best ``refine`` candidates
    re-rank with the exact cosine and the top-k of THOSE is returned.
    Candidate selection orders by (round(approx, 6) DESC, vec_id), so
    the candidate set and therefore the exact output is engine-agnostic
    (gated against a DuckDB replay of the entire train/encode/ADC
    pipeline).

    ``codes`` (vec_id, codes array<int>) supplies PRECOMPUTED PQ codes
    — the build-once/query-many shape (ann_index.write_ann_index): the
    ADC scan then touches m-byte code rows only and the raw float
    vectors stay cold until the ``refine``-row exact re-rank. Without
    it, codes are derived in-query from the embeddings (self-contained
    fallback — correct, but every query re-encodes the scan set).
    ``candidates`` (one vec_id column) restricts the scan either way —
    the hook the IVF composition uses to scan only the probed cells.

    ``cents`` marks the codes as RESIDUAL (trained/encoded against the
    IVF centroids — pq_train(cents=...)): the ADC estimate becomes
    <q, centroid[cell]> + sum_j <q_j, book_j[code_j]>, one rounded
    total. The cell comes from the ``codes`` table when it carries a
    ``cell`` column (the stored artifact does); otherwise it is
    recomputed in the same kernel (same rounded argmax — identical by
    determinism). Query cost is unchanged: the per-cell base terms are
    an (n_cells,) broadcast next to the (m x k) table."""
    b = np.asarray(books, dtype=np.float64)
    m, kk, dsub = b.shape
    if _qv is None:
        # callers that already fetched the query vector (ivf_pq_topk)
        # pass it through — one driver fetch job per query, not two
        q_rows = embeddings.filter(F.col("vec_id") == query_vec_id).select(
            "embedding"
        ).collect()
        _qv = _unit_rows(np.asarray(q_rows[0]["embedding"], dtype=np.float64)[None, :])[0]
    qv = _qv
    # the ADC lookup table: T[j, c] = <q_j, books[j, c]>
    tbl = np.stack([b[j] @ qv[j * dsub : (j + 1) * dsub] for j in range(m)])
    c_arr = None if cents is None else np.asarray(cents, dtype=np.float64)
    cbase = None if c_arr is None else c_arr @ qv  # <q, centroid[cell]> per cell

    have_cell = codes is not None and "cell" in codes.columns
    if cents is not None and codes is not None and not have_cell:
        raise ValueError(
            "residual codes need their IVF cell: pass a codes table with "
            "a cell column (the stored artifact has one)"
        )
    if codes is None:
        scan = (
            embeddings
            if candidates is None
            else embeddings.join(candidates.select("vec_id"), "vec_id", "left_semi")
        )
        if cents is None:
            codes = pq_encode(scan, books)
        else:
            # one kernel: assign cell + encode residual (identical math
            # to ann_index._assign_encode_udf)
            @F.pandas_udf("cell long, codes array<int>")
            def enc_res(emb: pd.Series) -> pd.DataFrame:
                v = _unit_rows(np.stack(emb.to_numpy()).astype(np.float64))
                cell = np.argmax(np.round(v @ c_arr.T, 6), axis=1).astype(np.int64)
                r = v - c_arr[cell]
                cs = np.empty((v.shape[0], m), dtype=np.int32)
                for j in range(m):
                    cs[:, j] = _sub_l2_argmin(r[:, j * dsub : (j + 1) * dsub], b[j])
                return pd.DataFrame({"cell": cell, "codes": cs.tolist()})

            codes = scan.select("vec_id", enc_res("embedding").alias("vc")).select(
                "vec_id", F.col("vc.cell").alias("cell"), F.col("vc.codes").alias("codes")
            )
            have_cell = True
    elif candidates is not None:
        codes = codes.join(candidates.select("vec_id"), "vec_id", "left_semi")
    codes = codes.select("vec_id", "cell", "codes") if have_cell and cents is not None \
        else codes.select("vec_id", "codes")

    if cents is None:

        @F.pandas_udf(T.DoubleType())
        def adc(codes_s: pd.Series) -> pd.Series:
            cs = np.stack(codes_s.to_numpy()).astype(np.int64)
            return pd.Series(np.round(tbl[np.arange(m)[None, :], cs].sum(axis=1), 6))

        scored = codes.select("vec_id", adc("codes").alias("approx"))
    else:

        @F.pandas_udf(T.DoubleType())
        def adc_res(cell_s: pd.Series, codes_s: pd.Series) -> pd.Series:
            cs = np.stack(codes_s.to_numpy()).astype(np.int64)
            base = cbase[cell_s.to_numpy().astype(np.int64)]
            return pd.Series(
                np.round(base + tbl[np.arange(m)[None, :], cs].sum(axis=1), 6)
            )

        scored = codes.select("vec_id", adc_res("cell", "codes").alias("approx"))

    cand = (
        scored.filter(F.col("vec_id") != query_vec_id)
        .orderBy(F.desc("approx"), F.asc("vec_id"))
        .limit(refine)
    )
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb")
    )
    return (
        embeddings.join(F.broadcast(cand.select("vec_id")), "vec_id", "left_semi")
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine_col(F.col("embedding"), F.col("q_emb")), 6).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )


def ivf_pq_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    cents: np.ndarray,
    books: np.ndarray,
    k: int = 10,
    n_probe: int = 4,
    refine: int = 50,
    assign: DataFrame | None = None,
    codes: DataFrame | None = None,
    residual: bool = False,
) -> DataFrame:
    """The full FAISS-style IVF+PQ architecture: probe the ``n_probe``
    trained-IVF cells nearest the query, ADC-scan ONLY those cells'
    vectors through the PQ codes, exact-rerank the best ``refine``. At
    10^12 vectors this is the shape that works: the coarse quantizer
    prunes the scan to n_probe/n_cells of the data and the PQ codes
    make what remains a table-lookup scan over m-byte rows.

    ``residual=True`` (the actual FAISS IVF-PQ shape, and what the
    persisted artifact stores by default) expects ``books`` trained on
    residuals (pq_train(cents=cents)) and codes encoded likewise; the
    ADC estimate then anchors on the exact <q, centroid> term — a
    recall win exactly when the data clusters (the realistic embedding
    shape: +0.07..0.13 recall@10 at refine<=100 on the clustered sweep
    fixture) at identical query cost; on near-uniform directions it
    slightly trails flat and the lever is ``m``/refine instead
    (BENCH/pq_recall.json, strided sampling). The flag MUST match
    how ``books`` were trained — codebook arrays carry no scheme tag,
    so a mismatch silently degrades scores rather than erroring; that
    is why this raw function defaults to the legacy flat scheme and
    the artifact path (ann_index) drives it from the persisted
    stats.residual instead of a guess.

    ``assign`` (vec_id, cell) and ``codes`` (vec_id, codes) supply the
    PERSISTED build artifacts (ann_index.write_ann_index); when the two
    are one table partitioned by cell, the probe filter becomes
    partition pruning and a query never touches unprobed cells' files.
    Without them each is recomputed in-query (fallback)."""
    q_rows = embeddings.filter(F.col("vec_id") == query_vec_id).select("embedding").collect()
    qv = _unit_rows(np.asarray(q_rows[0]["embedding"], dtype=np.float64)[None, :])[0]
    c = np.asarray(cents, dtype=np.float64)
    probe = np.argsort(-np.round(c @ qv, 6), kind="stable")[:n_probe].tolist()
    res_cents = c if residual else None
    if codes is not None and "cell" in codes.columns:
        # artifact table carries the cell: probe = a partition filter on
        # the codes scan itself, no join at all
        probed = codes.filter(F.col("cell").isin(probe)).select(
            "vec_id", "cell", "codes"
        )
        return pq_topk(
            embeddings, query_vec_id, books, k=k, refine=refine, codes=probed,
            cents=res_cents, _qv=qv,
        )
    if assign is None:
        assign = ivf_assign_centroids(embeddings, cents)
    cand = assign.filter(F.col("cell").isin(probe)).select("vec_id")
    return pq_topk(
        embeddings, query_vec_id, books, k=k, refine=refine, candidates=cand,
        codes=codes, cents=res_cents, _qv=qv,
    )


def ivf_assign(embeddings: DataFrame, n_cells: int = 8) -> DataFrame:
    """(vec_id, cell) — nearest-centroid assignment; centroids are the
    embeddings of vec_id 0..n_cells-1 (fixed, deterministic)."""
    cents = (
        embeddings.filter(F.col("vec_id") < n_cells)
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("c_emb"))
    )
    scored = embeddings.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "cell",
        F.round(cosine_col(F.col("embedding"), F.col("c_emb")), 6).alias("sim"),
    )
    # tie-break: higher sim wins, then LOWER cell id (hence -cell in the max)
    return (
        scored.groupBy("vec_id")
        .agg(F.max(F.struct(F.col("sim"), (-F.col("cell")).alias("negcell"))).alias("best"))
        .select("vec_id", (-F.col("best.negcell")).cast("long").alias("cell"))
    )


def ivf_topk(
    embeddings: DataFrame, query_vec_id: int, k: int = 10, n_cells: int = 8, n_probe: int = 1
) -> DataFrame:
    """Approximate top-k: search only the query's n_probe nearest cells."""
    assign = ivf_assign(embeddings, n_cells)
    cents = embeddings.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("c_emb")
    )
    q = embeddings.filter(F.col("vec_id") == query_vec_id).select(
        F.col("embedding").alias("q_emb")
    )
    probe_cells = (
        cents.crossJoin(F.broadcast(q))
        .select("cell", F.round(cosine_col(F.col("c_emb"), F.col("q_emb")), 6).alias("sim"))
        .orderBy(F.desc("sim"), F.asc("cell"))
        .limit(n_probe)
        .select("cell")
    )
    cand = (
        embeddings.join(assign, "vec_id")
        .join(F.broadcast(probe_cells), "cell", "left_semi")
        .filter(F.col("vec_id") != query_vec_id)
    )
    return (
        cand.crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine_col(F.col("embedding"), F.col("q_emb")), 6).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("vec_id"))
        .limit(k)
    )
