"""Persisted ANN index: build once, query many.

The reference's core contract is that the expensive structure is a
BUILD product, not a query by-product (its inverted index tables,
ref lib/database/schema.sql:19-23, are written by the indexer and only
read at query time). This module gives the ANN surface the same shape:

    <dir>/vectors/batch=B/cell=N/  (vec_id, codes array<int>) parquet,
                            hive-partitioned by ingest batch and IVF
                            cell — a query's probe set becomes a
                            PARTITION FILTER, so unprobed cells' files
                            are never opened
    <dir>/centroids.json    trained IVF codebook (n_cells x dim)
    <dir>/codebooks.json    trained PQ codebooks (m x k x dim/m)
    <dir>/ann_stats.json    {format, params, n_vectors, batches}

    ``batches`` is the COMMIT MANIFEST: readers list exactly the batch
    directories it names, never the filesystem (directory listing is
    not a commit log). An append writes its rows to a fresh batch dir
    first and only then commits by atomically rewriting ann_stats.json
    (os.replace) — a crash in between leaves an orphan directory that
    every reader ignores and that the REPLAYED batch simply overwrites,
    so incremental_ann_stream's checkpoint replay is wedge-free by
    construction (no duplicate-vec_id false positive: the disjointness
    check also sees only committed rows).

Scale shape: training is driver-side on a bounded sample (constant
cost at any corpus size — see ann.ivf_train); assignment + encoding is
ONE distributed pass over the embeddings (a single pandas UDF emits
(cell, codes) together, no join between an assign table and a codes
table); a query reads m-byte code rows from n_probe/n_cells of the
files and touches raw float vectors only for the ``refine`` exact
re-rank — at 10^12 vectors the raw vectors stay in cold storage.

Float round-trip: centroids/codebooks serialize via JSON, whose float
repr round-trips IEEE doubles exactly, so a loaded index reproduces
bit-identical decisions (gated: the stored-artifact queries share the
recompute path's DuckDB oracles).
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searty_spark.ann import (
    _sub_l2_argmin,
    _unit_rows,
    ivf_pq_topk,
    ivf_train,
    pq_topk,
    pq_train,
)

ANN_FORMAT = 3


def _write_stats(out: Path, stats: dict) -> None:
    """Atomic commit point: stats (including the batch manifest) land
    via write-to-temp + os.replace, so readers see the old or the new
    manifest, never a torn one."""
    import os

    tmp = out / "ann_stats.json.tmp"
    tmp.write_text(json.dumps(stats))
    os.replace(tmp, out / "ann_stats.json")


def _read_vectors(spark: SparkSession, index_dir: str, stats: dict) -> DataFrame:
    """The committed rows only: list exactly the manifest's batch dirs
    (basePath keeps batch/cell as partition columns), then drop the
    batch column — it's a commit-protocol detail, not query state."""
    root = Path(index_dir) / "vectors"
    paths = [str(root / f"batch={b}") for b in stats["batches"]]
    return (
        spark.read.option("basePath", str(root))
        .parquet(*paths)
        .select("vec_id", "cell", "codes")
    )


def _assign_encode_udf(cents: np.ndarray, books: np.ndarray, residual: bool = True):
    """One Arrow-batch kernel producing (cell, codes) together — the
    build pass is a single map over the embeddings, no shuffle, no
    assign-join-codes. ``residual=True`` encodes v - centroid[cell]
    (books must be residual-trained: pq_train(cents=...)) — the FAISS
    IVF-PQ shape; the cell is already in hand, so the subtraction is
    free inside the same kernel."""
    c = np.asarray(cents, dtype=np.float64)
    b = np.asarray(books, dtype=np.float64)
    m, _, dsub = b.shape

    @F.pandas_udf("cell long, codes array<int>")
    def enc(emb: pd.Series) -> pd.DataFrame:
        v = _unit_rows(np.stack(emb.to_numpy()).astype(np.float64))
        # same rounded decision rules as ivf_assign_centroids/pq_encode
        cell = np.argmax(np.round(v @ c.T, 6), axis=1).astype(np.int64)
        if residual:
            v = v - c[cell]
        codes = np.empty((v.shape[0], m), dtype=np.int32)
        for j in range(m):
            codes[:, j] = _sub_l2_argmin(v[:, j * dsub : (j + 1) * dsub], b[j])
        return pd.DataFrame({"cell": cell, "codes": codes.tolist()})

    return enc


def write_ann_index(
    embeddings: DataFrame,
    out_dir: str,
    n_cells: int = 32,
    n_iter: int = 2,
    sample: int = 4096,
    m: int = 8,
    pq_k: int = 16,
    cents: np.ndarray | None = None,
    books: np.ndarray | None = None,
    residual: bool = True,
    batch_tag: str | None = None,
) -> dict:
    """Train (bounded driver-side sample) + one distributed
    assign/encode pass + partitioned write. Returns the stats dict.
    Pass pre-trained ``cents``/``books`` to encode under FROZEN
    codebooks instead of training — the twin append_ann_index uses for
    its append == rebuild identity (codes are a pure function of
    (vector, codebooks), so the two must write identical rows).
    ``residual=True`` (default) stores FAISS-shape IVF-PQ residual
    codes (books trained on v - centroid[cell]); the flag persists in
    ann_stats.json and every reader honors it."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    if cents is None:
        cents = ivf_train(embeddings, n_cells=n_cells, n_iter=n_iter, sample=sample)
    if books is None:
        books = pq_train(
            embeddings, m=m, k=pq_k, n_iter=n_iter, sample=sample,
            cents=cents if residual else None,
        )
    cents = np.asarray(cents, dtype=np.float64)
    books = np.asarray(books, dtype=np.float64)
    n_cells, m, pq_k = cents.shape[0], books.shape[0], books.shape[1]
    enc = _assign_encode_udf(cents, books, residual=residual)
    vectors = embeddings.select("vec_id", enc("embedding").alias("vc")).select(
        "vec_id", F.col("vc.cell").alias("cell"), F.col("vc.codes").alias("codes")
    )
    vectors.write.partitionBy("cell").mode("overwrite").parquet(
        str(out / "vectors" / "batch=0")
    )
    stats = {
        "format": ANN_FORMAT,
        "n_cells": n_cells,
        "n_iter": n_iter,
        "sample": sample,
        "m": m,
        "pq_k": pq_k,
        "dim": int(np.asarray(cents).shape[1]),
        "residual": bool(residual),
        "batches": [0],
        # idempotence marker for checkpoint-replayed bootstrap batches
        # (see append_ann_index's batch_tag)
        "batch_tags": {} if batch_tag is None else {batch_tag: 0},
    }
    n_vectors = _read_vectors(embeddings.sparkSession, out_dir, stats).count()
    stats["n_vectors"] = int(n_vectors)
    (out / "centroids.json").write_text(json.dumps(cents.tolist()))
    (out / "codebooks.json").write_text(json.dumps(books.tolist()))
    _write_stats(out, stats)
    return stats


def append_ann_index(
    new_embeddings: DataFrame,
    index_dir: str,
    check_disjoint: bool = True,
    batch_tag: str | None = None,
) -> dict:
    """Incremental ingest (VERDICT r4 task 4): encode a new embedding
    batch under the index's FROZEN codebooks and append its rows to the
    cell partitions — no retraining, no re-encoding of existing
    vectors. EXACT by construction: codes are a pure function of
    (vector, codebooks), so the appended index is row-identical to a
    full rebuild of old ∪ new under the same codebooks (tested).
    Freezing the codebooks is also what keeps every pre-existing code
    valid; retraining would require a full re-encode — that case is a
    rebuild, not an append.

    ``check_disjoint`` guards vec_id uniqueness both WITHIN the batch
    (count vs distinct-count — batch-scaled) and against the store
    (one column-pruned semi-join on the stored vec_id column), all
    before any write (the same fail-before-write policy as
    merge_indexes' schema check). At extreme scale the caller who
    guarantees unique ids upstream can turn it off — the semi-join is
    the only part of append whose cost grows with the EXISTING corpus;
    everything else (encode, write, the n_vectors increment) scales
    with the new batch alone.

    Crash safety: rows land in a FRESH batch directory
    (``vectors/batch=<max+1>``, mode overwrite) and become visible only
    when the manifest in ann_stats.json is atomically replaced. A crash
    BEFORE the commit leaves an orphan dir no reader lists; the replay
    of that batch (same max+1 id — the manifest never advanced)
    overwrites the orphan and commits. For a crash AFTER the commit
    but before the CALLER's own checkpoint commits (the Structured
    Streaming window: foreachBatch ran, the sink's commit-log entry
    didn't), pass a stable ``batch_tag`` (incremental_ann_stream uses
    the epoch id): a tag already in the manifest makes the replay a
    NO-OP instead of a duplicate-vec_id fail-fast, so both halves of
    the replay window are idempotent. Without a tag, the post-commit
    replay correctly refuses (the rows ARE committed) — callers
    without their own checkpointing see the error, not silent
    duplication.

    Reference shape: build-once/query-many + incremental merge,
    ref lib/indexer/merge.go:455-502 — re-expressed as a partitioned-
    table append instead of a posting-list rewrite."""
    spark = new_embeddings.sparkSession
    stats, cents, books, vectors = load_ann_index(spark, index_dir)
    if batch_tag is not None and batch_tag in stats.get("batch_tags", {}):
        return stats  # this batch already committed: replay is a no-op
    # count once up front: it doubles as the WITHIN-batch duplicate
    # check (distinct vs total) and the n_vectors increment after the
    # write — both scale with the batch, never the stored corpus
    agg = new_embeddings.agg(
        F.count("*").alias("n"), F.count_distinct("vec_id").alias("nd")
    ).collect()[0]
    n_new, n_distinct = int(agg["n"]), int(agg["nd"])
    if check_disjoint:
        if n_distinct != n_new:
            raise ValueError(
                f"append batch contains duplicate vec_ids ({n_new} rows, "
                f"{n_distinct} distinct); vec_ids must be unique"
            )
        dup = (
            new_embeddings.select("vec_id")
            .join(vectors.select("vec_id"), "vec_id", "left_semi")
            .limit(1)
            .collect()
        )
        if dup:
            raise ValueError(
                f"append would duplicate vec_id {dup[0]['vec_id']} already in "
                f"{index_dir}; vec_id spaces must be disjoint"
            )
    enc = _assign_encode_udf(cents, books, residual=stats["residual"])
    rows = new_embeddings.select("vec_id", enc("embedding").alias("vc")).select(
        "vec_id", F.col("vc.cell").alias("cell"), F.col("vc.codes").alias("codes")
    )
    out = Path(index_dir)
    bid = max(stats["batches"]) + 1
    rows.write.partitionBy("cell").mode("overwrite").parquet(
        str(out / "vectors" / f"batch={bid}")
    )
    stats["batches"] = stats["batches"] + [bid]
    stats["n_vectors"] = int(stats["n_vectors"]) + n_new
    if batch_tag is not None:
        stats["batch_tags"] = {**stats.get("batch_tags", {}), batch_tag: bid}
    _write_stats(out, stats)
    return stats


def merge_ann_indexes(
    spark: SparkSession,
    index_dirs: list[str],
    out_dir: str,
    check_disjoint: bool = True,
) -> dict:
    """Merge same-codebook ANN artifacts (the text index's
    merge_indexes analogue). Because codes are codebook-relative, the
    merge is a pure partition concat — valid ONLY when every input was
    encoded under bit-identical codebooks; anything else fails fast
    BEFORE any write (JSON text equality: the artifacts serialize
    doubles exactly, so equal text == equal codebooks == equal
    decisions). Params (m, pq_k, n_cells, dim) are covered by that
    same check. One union + partitioned write; no decode, no
    re-encode."""
    if len(index_dirs) < 1:
        raise ValueError("need at least one input index")
    # fail BEFORE any write when out_dir is an input: the union is
    # lazy, so an overwrite onto a source path would delete files that
    # are still being read
    out_res = Path(out_dir).resolve()
    for d in index_dirs:
        if Path(d).resolve() == out_res:
            raise ValueError(
                f"out_dir {out_dir} is also an input index — merging an "
                "index onto itself would overwrite its files mid-read; "
                "write to a fresh directory"
            )
    d0 = Path(index_dirs[0])
    stats0 = json.loads((d0 / "ann_stats.json").read_text())
    if stats0.get("format") != ANN_FORMAT:
        raise ValueError(f"{index_dirs[0]} is format {stats0.get('format')}")
    cents_txt = (d0 / "centroids.json").read_text()
    books_txt = (d0 / "codebooks.json").read_text()
    for d in index_dirs[1:]:
        p = Path(d)
        s = json.loads((p / "ann_stats.json").read_text())
        if s.get("format") != ANN_FORMAT:
            raise ValueError(f"{d} is format {s.get('format')}")
        if (p / "centroids.json").read_text() != cents_txt or (
            p / "codebooks.json"
        ).read_text() != books_txt:
            raise ValueError(
                f"cannot merge {index_dirs[0]} with {d}: codebooks differ — "
                "codes are codebook-relative; re-encode one side "
                "(write_ann_index with the other's cents/books) first"
            )
        if s.get("residual") != stats0.get("residual"):
            raise ValueError(
                f"cannot merge {index_dirs[0]} with {d}: one stores residual "
                "codes and the other flat codes — same codebooks decode "
                "differently under the two schemes; rebuild one side"
            )
    vecs = None
    for d in index_dirs:
        s = json.loads((Path(d) / "ann_stats.json").read_text())
        v = _read_vectors(spark, d, s)
        vecs = v if vecs is None else vecs.unionByName(v)
    if check_disjoint:
        dup = (
            vecs.groupBy("vec_id").count().filter(F.col("count") > 1).limit(1).collect()
        )
        if dup:
            raise ValueError(
                f"vec_id {dup[0]['vec_id']} appears in more than one input; "
                "vec_id spaces must be disjoint"
            )
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    vecs.write.partitionBy("cell").mode("overwrite").parquet(
        str(out / "vectors" / "batch=0")
    )
    (out / "centroids.json").write_text(cents_txt)
    (out / "codebooks.json").write_text(books_txt)
    stats = dict(stats0)
    stats["batches"] = [0]
    stats["n_vectors"] = int(_read_vectors(spark, out_dir, stats).count())
    _write_stats(out, stats)
    return stats


def load_ann_index(
    spark: SparkSession, index_dir: str
) -> tuple[dict, np.ndarray, np.ndarray, DataFrame]:
    """-> (stats, centroids, codebooks, vectors) with a fail-fast
    format check (same policy as index.load_stats)."""
    d = Path(index_dir)
    stats = json.loads((d / "ann_stats.json").read_text())
    if stats.get("format") != ANN_FORMAT:
        raise ValueError(
            f"ANN index at {index_dir} is format {stats.get('format')}, this "
            f"build reads format {ANN_FORMAT} — rebuild with write_ann_index"
        )
    cents = np.asarray(json.loads((d / "centroids.json").read_text()), dtype=np.float64)
    books = np.asarray(json.loads((d / "codebooks.json").read_text()), dtype=np.float64)
    vectors = _read_vectors(spark, index_dir, stats)
    return stats, cents, books, vectors


def pq_topk_indexed(
    embeddings: DataFrame,
    index_dir: str,
    query_vec_id: int,
    k: int = 10,
    refine: int = 50,
) -> DataFrame:
    """ADC top-k over the STORED codes (whole-corpus scan, no coarse
    pruning): the scan reads (vec_id, cell, codes) rows only;
    ``embeddings`` is touched for the query vector and the
    ``refine``-row re-rank. Residual artifacts anchor the ADC on the
    stored cell's centroid term (stats.residual drives it)."""
    spark = embeddings.sparkSession
    stats, cents, books, vectors = load_ann_index(spark, index_dir)
    if stats["residual"]:
        return pq_topk(
            embeddings, query_vec_id, books, k=k, refine=refine,
            codes=vectors.select("vec_id", "cell", "codes"), cents=cents,
        )
    return pq_topk(
        embeddings, query_vec_id, books, k=k, refine=refine,
        codes=vectors.select("vec_id", "codes"),
    )


def ivf_pq_topk_indexed(
    embeddings: DataFrame,
    index_dir: str,
    query_vec_id: int,
    k: int = 10,
    n_probe: int = 4,
    refine: int = 50,
) -> DataFrame:
    """The production query path: stored centroids pick the probe
    cells on the driver, the probe set prunes the partitioned codes
    scan at file-listing time, ADC + exact re-rank as in ann.pq_topk.
    Result-identical to the self-contained ann.ivf_pq_topk (both gated
    against the same DuckDB replay)."""
    spark = embeddings.sparkSession
    stats, cents, books, vectors = load_ann_index(spark, index_dir)
    return ivf_pq_topk(
        embeddings, query_vec_id, cents, books,
        k=k, n_probe=n_probe, refine=refine, codes=vectors,
        residual=stats["residual"],
    )
