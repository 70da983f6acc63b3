"""Deduplication operators for training-data pipelines.

Four tiers, scale-first:

- exact           — md5(text) hash groupBy (one shuffle, salt-free).
- n-gram Jaccard  — exact word-shingle Jaccard via shingle self-join;
                    quadratic in df per shingle, so at 100 TB it runs
                    AFTER LSH candidate generation, never standalone.
- MinHash + LSH   — 32 permutations (xxhash64 with per-perm seed),
                    8 bands x 4 rows; candidates = equi-join on
                    (band, band_key); verified with exact Jaccard.
- SimHash         — 64-bit fingerprint via Arrow-batched UDF; banded
                    (4 x 16-bit) candidate join + popcount Hamming.

All shuffles are on hash keys (shingle, band_key) which are uniform by
construction — no skew salting needed here, unlike the Zipf term keys
in the index build.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_PERM = 32
N_BANDS = 8  # 4 rows per band
SIM_BANDS = 4  # 16 bits each


def exact_dup_groups(docs: DataFrame) -> DataFrame:
    """(text_hash, n_docs, min_doc_id) per distinct text."""
    return (
        docs.groupBy(F.md5("text").alias("text_hash"))
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("min_doc_id"))
        .orderBy("text_hash")
    )


def has_shingles_col(k: int = 3):
    """True iff word_shingles would emit >= 1 shingle for this row —
    THE shared definition: dup_clusters' implicit exact-dup edges must
    use exactly the condition under which the LSH universe contains
    the doc, or the collapsed and uncollapsed formulations diverge."""
    return F.size(F.split(F.col("text"), " ")) >= k


def word_shingles(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingle) distinct word k-grams — pure SQL."""
    toks = F.split(F.col("text"), " ")
    sh = F.when(
        has_shingles_col(k),
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - k),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select("doc_id", F.explode(sh).alias("shingle"))
        .distinct()
    )


def jaccard_pairs(docs: DataFrame, threshold: float = 0.4, k: int = 3) -> DataFrame:
    """(doc_a, doc_b, jacc) exact shingle-Jaccard pairs >= threshold."""
    sh = word_shingles(docs, k)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")), 6
            ).alias("jacc"),
        )
        .filter(F.col("jacc") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def jaccard_for_pairs(
    sh: DataFrame, cand: DataFrame, threshold: float
) -> DataFrame:
    """Exact shingle Jaccard computed ONLY for the given candidate
    pairs (doc_a, doc_b) — the verification primitive that runs after
    LSH candidate generation.

    Cost is linear in (candidate pairs x shingles per doc), never
    quadratic in shingle document frequency: the shingle relation is
    first semi-joined down to candidate docs, then each pair's
    intersection is counted by expanding the pair with doc_a's
    shingles and semi-joining against doc_b's. No shingle self-join
    exists in the plan (asserted in tests/test_plans.py).

    Pairs with an empty shingle intersection drop out of the count
    aggregation — their Jaccard is 0, below any positive threshold.
    """
    if threshold <= 0.0:
        raise ValueError("jaccard_for_pairs requires threshold > 0 "
                         "(zero-intersection pairs are pruned, not scored)")
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh_c = sh.join(cand_docs, "doc_id", "left_semi")
    sizes = sh_c.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    pair_sh = cand.join(
        sh_c.withColumnRenamed("doc_id", "doc_a"), "doc_a"
    )  # (doc_a, doc_b, shingle): doc_a's shingles fanned out per pair
    inter = (
        pair_sh.join(
            sh_c.select(F.col("doc_id").alias("doc_b"), "shingle"),
            ["doc_b", "shingle"],
            "left_semi",
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common") / (F.col("na") + F.col("nb") - F.col("n_common")), 6
            ).alias("jacc"),
        )
        .filter(F.col("jacc") >= threshold)
    )


def minhash_signatures(docs: DataFrame, n_perm: int = N_PERM, k: int = 3) -> DataFrame:
    """(doc_id, sig array<long>) — per permutation i, min over shingles
    of xxhash64(shingle, i).

    One hash-aggregation with n_perm min() expressions instead of an
    n_perm-way row explode: the map side combines fully, so the shuffle
    carries ONE row per doc (at 10^12 docs the explode variant shuffles
    32x the shingle count — this shuffles 0.03% of that)."""
    sh = word_shingles(docs, k)
    mins = [
        F.min(F.xxhash64("shingle", F.lit(i))).alias(f"m{i}") for i in range(n_perm)
    ]
    agg = sh.groupBy("doc_id").agg(*mins)
    return agg.select(
        "doc_id", F.array(*[F.col(f"m{i}") for i in range(n_perm)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.4,
    n_perm: int = N_PERM,
    n_bands: int = N_BANDS,
    k: int = 3,
) -> DataFrame:
    """LSH candidate pairs verified by exact Jaccard >= threshold.

    Band key = xxhash64 over the band's sorted (perm, minhash) rows;
    docs sharing any band key become candidates (the standard
    shingle->minhash->band->bucket-join pipeline). Final output is
    deterministic because candidates are verified exactly.
    """
    rows_per_band = n_perm // n_bands
    # nb: the shingle relation feeds three consumers (signatures, the
    # candidate-doc semi-join, the per-pair intersection) and is
    # deliberately RECOMPUTED for each — measured: localCheckpoint
    # materialization costs 2.5-3x more than the three codegen'd
    # re-explodes (21-27 s vs 8.4 s at sf0.1), and caching inside a
    # library function leaks pinned storage the caller can't release.
    sh = word_shingles(docs, k)
    sig = minhash_signatures(docs, n_perm, k)  # same lazy plan as sh feeds
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                    )
                ).alias("band_key"),
            )
            for b in range(n_bands)
        ]
    )
    bands = sig.select("doc_id", F.explode(band_structs).alias("bk")).select(
        "doc_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # Verify with exact Jaccard scoped to the candidate pairs only —
    # NEVER the full-corpus shingle self-join (that would cost >= the
    # brute force LSH exists to avoid; see jaccard_for_pairs).
    return jaccard_for_pairs(sh, cand, threshold).orderBy("doc_a", "doc_b")


def _simhash64(text: str, k: int = 3) -> int:
    toks = text.split(" ")
    shingles = {" ".join(toks[i : i + k]) for i in range(max(len(toks) - k + 1, 0))} or {text}
    weights = [0] * 64
    for s in shingles:
        h = int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")
        for bit in range(64):
            weights[bit] += 1 if (h >> bit) & 1 else -1
    fp = 0
    for bit in range(64):
        if weights[bit] > 0:
            fp |= 1 << bit
    return fp - (1 << 64) if fp >= (1 << 63) else fp  # to signed long


@F.pandas_udf(T.LongType())
def simhash_udf(text: pd.Series) -> pd.Series:
    return text.map(_simhash64)


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    return docs.select("doc_id", simhash_udf("text").alias("simhash"))


def simhash_pairs(docs: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs with Hamming distance <= max_hamming, found via
    4x16-bit band join + popcount verification."""
    # nb: fp feeds both sides of the band self-join and is deliberately
    # NOT cached — recomputing the fingerprint UDF once per side is one
    # md5 pass each, and caching inside a library function leaks pinned
    # storage the caller can't release (same policy as minhash_lsh_pairs).
    fp = simhash_fingerprints(docs)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col("simhash"), i * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("key"),
            )
            for i in range(SIM_BANDS)
        ]
    )
    bands = fp.select("doc_id", "simhash", F.explode(band_structs).alias("bk")).select(
        "doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").cast("long").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("doc_a", "doc_b")
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round (Kiveris et al., "Connected Components in
    MapReduce and Beyond"): for every node u, connect each strictly
    LARGER neighbor to m = min(N(u) ∪ {u}). Emitted edges always point
    larger → smaller (m ≤ u < v), so orientation is preserved."""
    sym = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    mins = (
        sym.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select("src", F.least("src", "mn").alias("m"))
    )
    return (
        sym.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round: for every node u over its SMALLER
    neighbors Γ̃(u) (input edges are oriented larger → smaller, so
    Γ̃(u) = dsts of u), connect each v ∈ Γ̃(u) ∪ {u} except the
    minimum m to m. Output stays larger → smaller."""
    mins = edges.groupBy("src").agg(F.min("dst").alias("mn"))
    leaves = (
        edges.join(mins, "src")
        .filter(F.col("dst") != F.col("mn"))
        .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
    )
    centers = mins.select("src", F.col("mn").alias("dst"))
    return leaves.union(centers).distinct()


def connected_components(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """(node, cluster_id) — connected components of the near-dup pair
    graph by alternating large-star / small-star contraction
    (Kiveris et al. 2014). Each round halves-or-better the distance of
    every node to its component minimum, so convergence is
    O(log n) rounds REGARDLESS of graph diameter — a near-dup chain
    from templated web boilerplate (A~B~C~…, diameter in the
    thousands) converges in ~log₂(chain length) rounds where plain
    min-label propagation needs one round per hop. ``max_iter`` is a
    safety rail (raises rather than returning a partial clustering);
    the default 25 covers components of ~2^25 nodes.

    Each round is two shuffle aggregations + joins over the EDGE set
    (not the corpus): at 100 TB the candidate-pair graph is orders of
    magnitude smaller than the corpus. Convergence is detected by the
    FULL star-forest property — (a) no dst ever reappears as a src AND
    (b) every src has exactly one dst. Both probes are required: a
    tree with two local minima passes (a) alone mid-contraction while
    a node still holds two parents, and returning there would split
    one component into two clusters (regression-tested). Both
    operators preserve the graph's component partition and only emit
    larger→smaller edges, so at a star forest every center is its
    component's minimum.
    """
    # localCheckpoint (not cache) each round: iterative DataFrame
    # algorithms otherwise nest every prior round's plan inside the
    # next one — lineage grows exponentially and the driver OOMs just
    # printing the tree by ~10 iterations. The INPUT lineage (at 100 TB
    # the whole LSH candidate pipeline) is checkpointed ONCE, before
    # anything else forks off it — nodes and the oriented edge set both
    # derive from the materialized table, never from the raw plan.
    base = (
        pairs.select(
            F.greatest("doc_a", "doc_b").alias("src"),
            F.least("doc_a", "doc_b").alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        base.select(F.col("src").alias("node"))
        .union(base.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    edges = base.filter(F.col("src") != F.col("dst"))
    for _ in range(max_iter):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        single_parent = (
            edges.groupBy("src").agg(F.count("*").alias("n")).filter("n > 1").isEmpty()
        )
        no_chain = edges.join(
            edges.select(F.col("src").alias("dst")).distinct(), "dst", "left_semi"
        ).isEmpty()
        if single_parent and no_chain:
            non_roots = edges.select(
                F.col("src").alias("node"), F.col("dst").alias("cluster_id")
            )
            roots = nodes.join(non_roots, "node", "left_anti").select(
                "node", F.col("node").alias("cluster_id")
            )
            return non_roots.union(roots)
    raise RuntimeError(
        f"large-star/small-star did not converge in {max_iter} rounds"
    )


def dup_clusters(docs: DataFrame, threshold: float = 0.4, k: int = 3) -> DataFrame:
    """(doc_id, cluster_id) — near-duplicate clusters: connected
    components over the MinHash-LSH verified pair graph, labeled by
    the cluster's minimum doc_id. Docs with no near-duplicate don't
    appear (singleton clusters are implicit).

    Exact duplicates are collapsed BEFORE banding: LSH pairs are
    generated over one representative (the lowest doc_id) per distinct
    text, and the other members attach to their representative by an
    implicit (member, rep) edge. Web-crawl duplicate mass is dominated
    by exact template copies — a 10%-of-corpus identical cluster would
    otherwise collide in EVERY band and emit O(cluster²) candidate
    pairs (5·10⁹ pairs at 1M docs) where the collapsed plan emits the
    cluster's members once each. Output-identical to the uncollapsed
    formulation: identical texts share every band key and verify at
    jaccard 1.0, so they always land in one component with the same
    minimum label; the (member, rep) edges are added only for groups
    whose text carries at least one shingle (>= k words), matching the
    uncollapsed behavior where shingle-less docs never pair."""
    groups = docs.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("rep"), F.count("*").alias("n_dup")
    )
    membership = docs.select(
        "doc_id",
        F.md5("text").alias("h"),
        has_shingles_col(k).alias("shingled"),
    ).join(groups, "h")
    reps = docs.join(
        groups.select(F.col("rep").alias("doc_id")), "doc_id", "left_semi"
    )
    pairs = minhash_lsh_pairs(reps, threshold=threshold, k=k).select(
        "doc_a", "doc_b"
    )
    group_edges = membership.filter(
        (F.col("n_dup") >= 2) & F.col("shingled") & (F.col("doc_id") != F.col("rep"))
    ).select(F.col("rep").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    return (
        connected_components(pairs.union(group_edges))
        .select(F.col("node").alias("doc_id"), "cluster_id")
        .orderBy("doc_id")
    )
