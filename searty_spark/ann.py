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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
    pairs. Exact all-pairs at test scale; at 10^12 rows this runs ONLY
    on LSH/IVF candidate pairs (compose with ivf_assign: join on cell
    first), exactly like jaccard_pairs runs after MinHash LSH."""
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
