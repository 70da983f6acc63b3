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
from pyspark.sql import DataFrame, Window
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
    return _word_shingle_rows(docs, k).distinct()


def _word_shingle_rows(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, shingle) word k-gram OCCURRENCE rows (non-distinct) —
    the map-side form. Consumers that are insensitive to multiplicity
    (minhash min-fold; anything applying its own distinct after a
    candidate prune) read this and skip the corpus-wide distinct
    shuffle word_shingles pays.

    Generation is ONE regexp_extract_all per document instead of a
    split + per-window slice/concat (r7): the pattern anchors at every
    token start (begin-of-text or after a space) and captures the next
    k single-space-separated tokens in a lookahead, so overlapping
    windows extract in one linear scan — measured 2.8x faster than the
    split formulation at sf1.0 and row-identical on the fixtures (the
    equivalence holds by construction: any text equals its
    split-on-single-space tokens re-joined with single spaces, and the
    lookahead succeeds exactly when >= k tokens remain; property-
    tested against the slice+concat twin in test_dedup_pipeline).
    The emit condition is therefore has_shingles_col's value verbatim
    (>= k tokens) — dup_clusters' implicit-edge gate must keep
    matching it (CLAUDE.md)."""
    from searty_spark.session import spread_input

    return spread_input(docs).select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(
                F.col("text"), F.lit(_window_pattern(k)), F.lit(1)
            )
        ).alias("shingle"),
    )


def _window_pattern(k: int) -> str:
    """Java-regex pattern whose group 1, under regexp_extract_all,
    yields every k-token window of a single-space-tokenized text, in
    token order: match positions are exactly the token starts (^ or
    after a space, zero-width), and the lookahead captures
    ``tok (sep tok){k-1}`` without consuming — overlapping windows in
    one linear scan, no backtracking ([^ ]* and the literal space are
    disjoint)."""
    return r"(?:^|(?<= ))(?=((?:[^ ]* ){%d}[^ ]*))" % (k - 1)


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
    # distinct AFTER the candidate-doc prune: the input may be the
    # non-distinct occurrence rows (_word_shingle_rows) — set semantics
    # are restored here, where the relation is candidate-docs-sized,
    # instead of paying a corpus-wide distinct shuffle upstream. A
    # no-op (beyond the small shuffle) when ``sh`` is already distinct.
    sh_c = sh.join(cand_docs, "doc_id", "left_semi").distinct()
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


def _minhash_signatures_rows(docs: DataFrame, n_perm: int, k: int) -> DataFrame:
    """minhash_signatures over the NON-distinct shingle occurrence rows:
    min over a multiset equals min over its set, so the signature is
    identical while the shingle relation's corpus-wide distinct shuffle
    disappears (the min-agg combines map-side either way, so the
    exchange carries one row per doc)."""
    sh = _word_shingle_rows(docs, k)
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
    # What each consumer reads IS trimmed (r7): all three take the
    # non-distinct occurrence rows, so none of the recomputes pays the
    # corpus-wide distinct shuffle — signatures are multiplicity-
    # insensitive and the verification restores set semantics after
    # its candidate prune (jaccard_for_pairs).
    sh = _word_shingle_rows(docs, k)
    sig = _minhash_signatures_rows(docs, n_perm, k)  # same lazy plan as sh feeds
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
        # Materialize the (tiny) candidate-pair relation: the verifier
        # consumes it THREE times (two cand_docs branches + the per-pair
        # fan-out), and each lazy consumption would re-run the whole
        # shingle->signature->band-join subtree — 3 extra corpus passes
        # for a relation of a few thousand rows. localCheckpoint here
        # pins only the pair ids, never the shingle relation (the
        # storage-leak concern above is about corpus-sized caches).
        .localCheckpoint(eager=True)
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
    """Vectorized twin of :func:`_simhash64` (the golden scalar): md5
    per shingle stays (it is the fingerprint's definition, replayed by
    the SQL oracle), but the per-shingle 64-iteration Python bit loop
    becomes one numpy bit-matrix reduction per document — weights[b] =
    2*popcount_b - n, so the sign test is ``2*ones > n``. Identity
    with _simhash64 is pinned by test_simhash_udf_matches_golden;
    measured ~8x the old row-at-a-time map at sf1.0."""
    import numpy as np

    bitpos = np.arange(64, dtype=np.uint64)

    def one(t: str) -> int:
        toks = t.split(" ")
        sh = {
            " ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 0))
        } or {t}
        hs = np.fromiter(
            (
                int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")
                for s in sh
            ),
            dtype=np.uint64,
            count=len(sh),
        )
        ones = ((hs[:, None] >> bitpos) & np.uint64(1)).sum(axis=0, dtype=np.int64)
        fpbits = (2 * ones > len(sh)).astype(np.uint64)
        fp = int((fpbits << bitpos).sum(dtype=np.uint64))
        return fp - (1 << 64) if fp >= (1 << 63) else fp

    return text.map(one)


def simhash_fingerprints(docs: DataFrame) -> DataFrame:
    from searty_spark.session import spread_input

    return spread_input(docs).select("doc_id", simhash_udf("text").alias("simhash"))


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
        # ONE probe job per round (r7): the star-forest check is the
        # conjunction "no src has two parents AND no dst reappears as a
        # src" — a union of the two violation relations is empty iff
        # both are, so a single isEmpty action replaces two per round
        multi_parent = (
            edges.groupBy("src").agg(F.count("*").alias("n")).filter("n > 1")
            .select(F.lit(1).alias("v"))
        )
        chain = edges.join(
            edges.select(F.col("src").alias("dst")).distinct(), "dst", "left_semi"
        ).select(F.lit(1).alias("v"))
        if multi_parent.union(chain).isEmpty():
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


def _dup_windows(
    docs: DataFrame,
    k: int,
    min_count: int,
    first_occ: bool = False,
    hash_windows: bool = False,
) -> DataFrame:
    """(doc_id, pos, e[, first_occ]) — every k-token window whose exact
    text occurs at least ``min_count`` times corpus-wide (all
    occurrences count, including repeats inside one document). pos/e
    are 1-based inclusive token bounds [pos, pos + k - 1]; with
    ``first_occ`` each row also carries the window's corpus-wide
    minimum (doc_id, pos) — the excision keeper.

    ``hash_windows`` keys the one wide shuffle (the window groupBy and
    the occurrence join) on ``xxhash64(w)`` instead of the raw k-token
    window text — a pure TRANSPORT optimization: at k=10 the text key
    is ~60-70 bytes/row where the hash is 8, so the exchange a 100-TB
    run pays most for shrinks ~8x, and the window strings never cross
    any exchange at all. Semantics are identical unless two DISTINCT
    window texts collide in xxhash64 (they would then share a count /
    first-occurrence group); the 64-bit birthday bound puts that at
    ~p = n_distinct^2 / 2^65 — ~3e-6 at 10^9 distinct windows — so the
    text key stays the DEFAULT (the engine-portable, oracle-replayable
    semantics every gate runs), and the hash key is the documented
    opt-in for corpus scales where the transport dominates
    (parity-tested row-identical on the fixture corpora)."""
    # window generation is one linear regex scan per document (see
    # _window_pattern / _word_shingle_rows): extracted windows arrive
    # in token order, so posexplode's index IS the 1-based token
    # position minus one — the split + per-window slice/concat
    # formulation this replaces re-tokenized the doc once per window
    # and measured ~2.8x slower at sf1.0 (row-identical, property-
    # tested against the slice+concat twin)
    from searty_spark.session import spread_input

    wins = spread_input(docs).select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.col("text"), F.lit(_window_pattern(k)), F.lit(1))
        ).alias("p0", "w"),
    ).select("doc_id", (F.col("p0") + 1).cast("int").alias("pos"), "w")
    key = "w"
    if hash_windows:
        wins = wins.select("doc_id", "pos", F.xxhash64("w").alias("wh"))
        key = "wh"
    aggs = [F.count("*").alias("cnt")]
    carry = []
    if first_occ:
        aggs.append(F.min(F.struct("doc_id", "pos")).alias("first_occ"))
        carry = ["first_occ"]
    dup = (
        wins.groupBy(key)
        .agg(*aggs)
        .filter(F.col("cnt") >= min_count)
        .select(key, *carry)
    )
    return wins.join(dup, key).select(
        "doc_id", "pos", (F.col("pos") + k - 1).alias("e"), *carry
    )


def dup_spans(
    docs: DataFrame, k: int = 10, min_count: int = 2, hash_windows: bool = False
) -> DataFrame:
    """(doc_id, span_start, span_end) — maximal duplicated substring
    spans: 1-based inclusive token ranges covered by k-token windows
    whose exact text appears >= min_count times in the corpus, with
    overlapping/adjacent windows coalesced per document. The
    substring-level exact-dedup primitive of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better") —
    their suffix-array pass finds the same duplicated regions; the
    k-gram window formulation is the shuffle-native equivalent
    (identical spans for duplicates of length >= k, which is the
    definition of the operator).

    Scale shape (100 TB): one map-side explode (k x text volume), ONE
    wide shuffle — the window-text groupBy, whose partial aggregation
    collapses hot template windows per-partition before the exchange —
    then a shuffled hash join to mark occurrences (AQE splits the few
    hot window keys), and per-doc interval coalescing under a
    Window.partitionBy(doc_id) whose partitions are single documents
    (bounded by doc length, never corpus size). The join key is the
    raw window text so the semantics stay exactly "same k tokens" and
    the DuckDB oracle replays it verbatim; at 10^10+ windows, shuffle
    bytes can be cut ~10x by keying on xxhash64(w) instead — a pure
    transport optimization whose 64-bit collision odds only begin to
    matter past ~10^9 distinct windows (birthday bound), at the cost
    of engine-portable byte-identical semantics.

    Reference parity: searty has no substring dedup (it indexes code);
    this is part of the LLM-training-data operator set layered on the
    same corpus model."""
    dwin = _dup_windows(docs, k, min_count, hash_windows=hash_windows)
    w_prev = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = (
        dwin.withColumn("prev_e", F.max("e").over(w_prev))
        .withColumn(
            "brk",
            F.when(
                F.col("pos") > F.coalesce(F.col("prev_e"), F.lit(-10)) + 1, 1
            ).otherwise(0),
        )
        .withColumn("grp", F.sum("brk").over(w_run))
    )
    return (
        marked.groupBy("doc_id", "grp")
        .agg(
            F.min("pos").cast("long").alias("span_start"),
            F.max("e").cast("long").alias("span_end"),
        )
        .select("doc_id", "span_start", "span_end")
        .orderBy("doc_id", "span_start")
    )


def substring_dup_stats(
    docs: DataFrame, k: int = 10, min_count: int = 2, hash_windows: bool = False
) -> DataFrame:
    """(doc_id, n_tokens, dup_tokens, dup_frac) for EVERY document —
    dup_tokens is the union coverage of the doc's duplicated spans
    (dup_spans semantics), 0 for clean docs. One left join of the
    span aggregate back onto the corpus; everything upstream is the
    dup_spans plan."""
    spans = dup_spans(docs, k, min_count, hash_windows=hash_windows)
    per_doc = spans.groupBy("doc_id").agg(
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("dup_tokens")
    )
    return (
        docs.select(
            "doc_id", F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens")
        )
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(
                F.coalesce(F.col("dup_tokens"), F.lit(0)) / F.col("n_tokens"), 6
            ).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


def substring_dedup(
    docs: DataFrame,
    k: int = 10,
    min_count: int = 2,
    max_dup_frac: float = 0.2,
    hash_windows: bool = False,
) -> DataFrame:
    """Survivor stats rows (doc_id, n_tokens, dup_tokens, dup_frac)
    for documents whose duplicated-substring coverage is <=
    max_dup_frac — the document-level filter a training-prep pipeline
    applies from substring_dup_stats (drop boilerplate-heavy docs;
    span-level excision is a policy variant over the same spans)."""
    return (
        substring_dup_stats(docs, k, min_count, hash_windows=hash_windows)
        .filter(F.col("dup_frac") <= max_dup_frac)
        .orderBy("doc_id")
    )


def excise_duplicates(
    docs: DataFrame, k: int = 10, min_count: int = 2, hash_windows: bool = False
) -> DataFrame:
    """(doc_id, clean_text, n_removed_tokens) — the Lee et al. 2022
    output transform: every duplicated k-token window keeps its
    corpus-wide FIRST occurrence (minimum (doc_id, pos)) and every
    other occurrence's token range is excised from its document; a
    token is removed iff at least one non-first duplicated window
    covers it. Documents always appear (clean docs pass through with
    n_removed_tokens 0), so the output is a drop-in text column for
    the next pipeline stage.

    Deterministic by construction — the keeper is an argmin over the
    total (doc_id, pos) order, no sampling — which is what makes the
    DuckDB oracle replayable.

    Scale shape: the dup_spans spine (one window-text shuffle with
    map-side partial agg) plus an argmin per duplicated window, then
    the non-first occurrences' intervals merge per doc (window
    partitions = single documents, rows = duplicated occurrences
    only) into a REMOVAL-INTERVALS sidecar — a relation bounded by
    the duplicate mass, never the corpus. The rewrite itself is one
    doc_id equi-join of that sidecar against the corpus and a JVM
    higher-order projection (filter tokens by interval containment,
    O(intervals) per token): the corpus is never exploded to token
    rows, so nothing token-granular ever shuffles. An earlier
    formulation (posexplode + anti-join + sort_array(collect_list)
    reassembly) moved every corpus token through TWO exchanges;
    interleaved A/B at 200k docs (BENCH/excise_ab.json) shows the two
    are a wall-clock wash on local[32] (v2/v1 = 1.08, inside the VM
    noise band, rows identical) — the intervals formulation is kept
    for its shuffle-volume profile, which is what the in-memory
    single-node shuffle hides and a 100-TB network shuffle does not:
    v1's exchange volume is O(corpus tokens), v2's is O(duplicate
    mass) + one corpus-row join."""
    from searty_spark.session import spread_input

    docs = spread_input(docs)  # rewrite side: token filter per doc is CPU-heavy
    dwin = _dup_windows(docs, k, min_count, first_occ=True, hash_windows=hash_windows)
    removal = dwin.filter(
        (F.col("doc_id") != F.col("first_occ.doc_id"))
        | (F.col("pos") != F.col("first_occ.pos"))
    ).select("doc_id", "pos", "e")
    w_prev = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id").orderBy("pos").rowsBetween(Window.unboundedPreceding, 0)
    )
    cuts = (
        removal.withColumn("prev_e", F.max("e").over(w_prev))
        .withColumn(
            "brk",
            F.when(
                F.col("pos") > F.coalesce(F.col("prev_e"), F.lit(-10)) + 1, 1
            ).otherwise(0),
        )
        .withColumn("grp", F.sum("brk").over(w_run))
        .groupBy("doc_id", "grp")
        .agg(F.min("pos").alias("s"), F.max("e").alias("e"))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("s", "e"))).alias("cuts"))
    )
    toks = F.split(F.col("text"), " ")
    indexed = F.transform(
        toks, lambda t, i: F.struct((i + 1).alias("tp"), t.alias("tok"))
    )
    kept = F.filter(
        indexed,
        lambda s: ~F.exists(
            F.col("cuts"), lambda c: (s["tp"] >= c["s"]) & (s["tp"] <= c["e"])
        ),
    )
    return (
        docs.join(cuts, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("cuts").isNull(), F.col("text"))
            .otherwise(
                F.array_join(F.transform(kept, lambda s: s["tok"]), " ")
            )
            .alias("clean_text"),
            F.when(F.col("cuts").isNull(), F.lit(0))
            .otherwise(F.size(toks) - F.size(kept))
            .cast("long")
            .alias("n_removed_tokens"),
        )
        .orderBy("doc_id")
    )
