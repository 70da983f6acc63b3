"""Connected-components clustering + the clean_corpus composite."""

import pytest
from pyspark.sql import functions as F

from searty_spark.dedup import connected_components


def _cc_df(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    return connected_components(df, **kw)


def _cc(spark, pairs):
    return {r["node"]: r["cluster_id"] for r in _cc_df(spark, pairs).collect()}


def test_components_chain_and_islands(spark):
    # chain 1-2-3-4 (diameter 3), island {10, 11}, singleton pair {20, 21}
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_components_star_and_cycle(spark):
    got = _cc(spark, [(5, 1), (5, 2), (5, 3), (7, 8), (8, 9), (9, 7)])
    assert got == {1: 1, 2: 1, 3: 1, 5: 1, 7: 7, 8: 7, 9: 7}


def test_components_long_chain_converges(spark):
    n = 12  # diameter 11 < max_iter
    got = _cc(spark, [(i, i + 1) for i in range(n)])
    assert set(got.values()) == {0} and len(got) == n + 1


def test_components_deep_chain_logarithmic(spark):
    """A 10k-node path (diameter 9,999 — the templated-boilerplate
    worst case) must converge within 20 large-star/small-star rounds;
    O(diameter) min-label propagation would need 9,999 rounds and die
    at any sane max_iter. Measured: 14 rounds (log₂ 10k ≈ 13.3)."""
    n = 10_000
    got = _cc_df(spark, [(i, i + 1) for i in range(n)], max_iter=20)
    assert got.filter(F.col("cluster_id") != 0).count() == 0
    assert got.count() == n + 1


def test_components_two_local_minima_tree(spark):
    """Regression: a tree with TWO local minima (1 and 2) passes the
    no-dst-is-a-src probe mid-contraction while node 3 still holds two
    parents — an early return there split the component into clusters
    {1,3,5,7} and {2,3,6,8} and emitted node 3 twice. The full
    star-forest check (single parent per src) must hold out for the
    merge."""
    got = _cc(spark, [(3, 7), (3, 8), (5, 7), (1, 5), (6, 8), (2, 6)])
    assert got == {n: 1 for n in (1, 2, 3, 5, 6, 7, 8)}


def test_components_random_graphs_match_union_find(spark):
    """Property net for the convergence-check bug class: on random
    graphs the star-contraction output must equal a brute-force
    union-find (same node set, same min-label clusters)."""
    import random

    for seed in (1, 7, 42, 1234, 99999):
        rng = random.Random(seed)
        n = rng.randrange(10, 60)
        pairs = [
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(5, 80))
        ]
        pairs = [p for p in pairs if p[0] != p[1]] or [(0, 1)]
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        nodes = {x for p in pairs for x in p}
        want = {x: find(x) for x in sorted(nodes)}
        got = _cc(spark, [(int(a), int(b)) for a, b in pairs])
        assert got == want, (seed, pairs)


def test_components_raises_when_not_converged(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(6)], "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(df, max_iter=2)


def test_clean_corpus_stages(spark, small_corpus):
    """Survivors pass the quality gate, contain no exact duplicates,
    and contain at most one doc per near-dup cluster (its minimum)."""
    from searty_spark.dedup import dup_clusters
    from searty_spark.pipeline import clean_corpus

    kept = [r["doc_id"] for r in clean_corpus(small_corpus, min_tokens=4).collect()]
    assert kept == sorted(kept) and len(kept) > 0
    survivors = small_corpus.filter(F.col("doc_id").isin(kept))
    # no exact dup among survivors
    assert (
        survivors.groupBy(F.md5("text")).count().filter(F.col("count") > 1).count() == 0
    )
    # quality gate honored
    w = F.split("text", " ")
    bad = survivors.filter(F.size(w) < 4).count()
    assert bad == 0
    # each survivor-cluster is represented only by its minimum
    cl = dup_clusters(survivors, threshold=0.2)
    assert cl.filter(F.col("doc_id") != F.col("cluster_id")).count() == 0


def test_sample_corpus_partitioning_invariant(spark, small_corpus):
    """The content-hash sample must be identical regardless of how the
    input is partitioned (the docstring's reproducibility claim)."""
    from searty_spark.pipeline import sample_corpus

    a = [r["doc_id"] for r in sample_corpus(small_corpus, 20).collect()]
    b = [r["doc_id"] for r in sample_corpus(small_corpus.repartition(13), 20).collect()]
    c = [r["doc_id"] for r in sample_corpus(small_corpus.coalesce(1), 20).collect()]
    assert a == b == c and 0 < len(a) < small_corpus.count()


def test_dup_clusters_exact_collapse_semantics(spark):
    """Exact duplicates collapse to one LSH representative; output must
    equal the uncollapsed formulation: identical shingled docs cluster
    with the group min, shingle-less identical docs never appear, and
    a group whose rep near-dups another text merges transitively."""
    from searty_spark.dedup import dup_clusters

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = (
        # identical cluster 10..14 (shingled)
        [(i, base) for i in range(10, 15)]
        # near-dup of the template under id 20 (one word changed)
        + [(20, base.replace("theta", "iota"))]
        # unique doc
        + [(30, "one completely different text about unrelated things")]
        # identical SHORT docs (< 3 words -> no shingles): never pair
        + [(40, "tiny doc"), (41, "tiny doc")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dup_clusters(docs, threshold=0.4).collect()
    }
    assert got == {10: 10, 11: 10, 12: 10, 13: 10, 14: 10, 20: 10}


# --- exact substring-level dedup (Lee et al. 2022 span semantics) ---


def _sub_docs(spark):
    rows = [
        (0, "x1 x2 D1 D2 D3 D4 D5 y1 y2"),        # dup run [3,7]
        (1, "z1 D1 D2 D3 D4 D5 z2 z3 z4 z5"),     # same run at [2,6]
        (2, "u1 u2 u3 u4 u5"),                    # unique
        (3, "s1 s2"),                             # shorter than k
        (4, "R1 R2 R3 R4 m1 R1 R2 R3 R4"),        # self-repetition
        (5, "A1 A2 A3 A4 B1 B2 B3 B4"),           # touching spans merge
        (6, "A1 A2 A3 A4 q1 q2 B1 B2 B3 B4"),     # same spans, separated
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dup_spans_planted(spark):
    """Spans are maximal per-doc unions of duplicated k-windows:
    overlapping windows merge (docs 0/1), exactly-touching spans merge
    (doc 5: [1,4]+[5,8] -> [1,8]), gapped spans stay separate (docs
    4, 6), self-repetition inside one doc counts toward min_count,
    unique and short docs emit nothing."""
    from searty_spark.dedup import dup_spans

    got = [tuple(r) for r in dup_spans(_sub_docs(spark), k=4).collect()]
    assert got == [
        (0, 3, 7),
        (1, 2, 6),
        (4, 1, 4),
        (4, 6, 9),
        (5, 1, 8),
        (6, 1, 4),
        (6, 7, 10),
    ]


def test_substring_stats_and_dedup(spark):
    """Stats cover EVERY doc (clean and sub-k docs at dup_tokens 0);
    the dedup filter keeps dup_frac <= max inclusive."""
    from searty_spark.dedup import substring_dedup, substring_dup_stats

    stats = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_frac"])
        for r in substring_dup_stats(_sub_docs(spark), k=4).collect()
    }
    assert stats == {
        0: (9, 5, round(5 / 9, 6)),
        1: (10, 5, 0.5),
        2: (5, 0, 0.0),
        3: (2, 0, 0.0),
        4: (9, 8, round(8 / 9, 6)),
        5: (8, 8, 1.0),
        6: (10, 8, 0.8),
    }
    kept = [
        r["doc_id"]
        for r in substring_dedup(_sub_docs(spark), k=4, max_dup_frac=0.5).collect()
    ]
    assert kept == [1, 2, 3]  # 0.5 inclusive; 0/4/5/6 dropped


def test_substring_min_count_threshold(spark):
    """min_count=3 demands a third occurrence: the pair-planted run
    disappears, the self-repeated doc (2 occurrences) too."""
    from searty_spark.dedup import dup_spans

    got = dup_spans(_sub_docs(spark), k=4, min_count=3).count()
    assert got == 0


def test_excise_duplicates_keeper_semantics(spark):
    """The corpus-wide first occurrence (min (doc_id, pos)) of each
    duplicated window survives; later occurrences are excised,
    including self-repetition inside one doc; clean and sub-k docs
    pass through untouched with n_removed_tokens 0."""
    from searty_spark.dedup import excise_duplicates

    got = {
        r["doc_id"]: (r["clean_text"], r["n_removed_tokens"])
        for r in excise_duplicates(_sub_docs(spark), k=4).collect()
    }
    # doc 0 holds the first occurrences of the D-run and A/B windows
    # it owns nothing of; doc 1's copy of the D-run is excised.
    assert got[0] == ("x1 x2 D1 D2 D3 D4 D5 y1 y2", 0)
    assert got[1] == ("z1 z2 z3 z4 z5", 5)
    assert got[2] == ("u1 u2 u3 u4 u5", 0)
    assert got[3] == ("s1 s2", 0)
    # self-repetition: first R-run kept, second excised
    assert got[4] == ("R1 R2 R3 R4 m1", 4)
    # doc 5 owns the first A-run and B-run; doc 6 loses both
    assert got[5] == ("A1 A2 A3 A4 B1 B2 B3 B4", 0)
    assert got[6] == ("q1 q2", 8)


def test_composite_substring_stage_is_composition(spark):
    """prepare_training_corpus(substring_k=4) == excise_duplicates
    applied to the 4-stage composite's survivors — the optional stage
    5 is pure composition (and off by default, leaving the gated
    contract untouched)."""
    from searty_spark.dedup import excise_duplicates
    from searty_spark.pipeline import prepare_training_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    kw = dict(min_tokens=4, min_stopword_ratio=0.0, max_symbol_ratio=1.0)
    base = prepare_training_corpus(docs, **kw)
    staged = [
        tuple(r) for r in prepare_training_corpus(docs, substring_k=4, **kw).collect()
    ]
    exc = excise_duplicates(
        base.select("doc_id", F.col("clean_text").alias("text")), k=4
    ).select("doc_id", F.col("clean_text").alias("x"))
    manual = [
        tuple(r)
        for r in base.drop("clean_text")
        .join(exc, "doc_id")
        .select("doc_id", F.col("x").alias("clean_text"), "n_redactions")
        .orderBy("doc_id")
        .collect()
    ]
    assert staged == manual and len(staged) > 0
    # stage 5 actually rewrites something on this corpus
    base_rows = {r["doc_id"]: r["clean_text"] for r in base.collect()}
    assert any(base_rows[d] != t for d, t, _ in staged)


def test_substring_family_matches_brute_force(spark):
    """Property net: on random small-vocab corpora (dense organic
    window collisions, docs above and below k) dup_spans and
    excise_duplicates must equal a brute-force python reference —
    occurrence dict, first-occurrence keeper, interval merge."""
    import random
    from collections import defaultdict

    from searty_spark.dedup import dup_spans, excise_duplicates

    k = 3
    for seed in range(5):
        rng = random.Random(seed)
        vocab = ["a", "b", "c", "d"]
        rows = [
            (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 22))))
            for d in range(30)
        ]

        occ = defaultdict(list)
        for doc_id, text in rows:
            toks = text.split(" ")
            for i in range(len(toks) - k + 1):
                occ[tuple(toks[i : i + k])].append((doc_id, i + 1))
        spans_by_doc, removal = defaultdict(list), defaultdict(set)
        for lst in occ.values():
            if len(lst) >= 2:
                lst = sorted(lst)
                for d, p in lst:
                    spans_by_doc[d].append((p, p + k - 1))
                    if (d, p) != lst[0]:
                        removal[d].update(range(p, p + k))
        want_spans = []
        for d in sorted(spans_by_doc):
            iv = sorted(set(spans_by_doc[d]))
            cur = list(iv[0])
            for s, e in iv[1:]:
                if s <= cur[1] + 1:
                    cur[1] = max(cur[1], e)
                else:
                    want_spans.append((d, cur[0], cur[1]))
                    cur = [s, e]
            want_spans.append((d, cur[0], cur[1]))
        want_exc = []
        for doc_id, text in rows:
            toks = text.split(" ")
            kept = [t for i, t in enumerate(toks, 1) if i not in removal[doc_id]]
            want_exc.append((doc_id, " ".join(kept), len(toks) - len(kept)))

        df = spark.createDataFrame(rows, "doc_id long, text string")
        got_spans = [tuple(r) for r in dup_spans(df, k=k).collect()]
        assert got_spans == want_spans, f"seed {seed} spans"
        got_exc = [tuple(r) for r in excise_duplicates(df, k=k).collect()]
        assert got_exc == want_exc, f"seed {seed} excision"


def test_regex_window_extraction_matches_slice_concat(spark):
    """The r7 regex window generator (_window_pattern) must emit
    exactly the rows of the original split + slice/concat_ws
    formulation — same windows, same 1-based positions — on texts
    exercising every split(" ") edge case: empty tokens from double/
    leading/trailing spaces, docs shorter than k, single-token docs,
    empty strings, multibyte text, regex metacharacters in tokens."""
    texts = [
        "a b c d e",
        "a  b c",          # empty token mid-string
        " a b c",          # leading space -> empty first token
        "a b c ",          # trailing space -> empty last token
        "  ",              # only empty tokens
        "",                # empty text (one empty token after split)
        "one",             # fewer tokens than k
        "a b",             # exactly k tokens (k=2 case below)
        "ü ber münz str",  # multibyte
        "a.* [b] (c) |d",  # regex metacharacters are data, not syntax
        "x " * 50,         # long repetitive text
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    from searty_spark.dedup import _window_pattern

    for k in (2, 3, 10):
        toks = F.col("toks")
        wins = F.when(
            F.size(toks) >= k,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - k),
                lambda i: F.struct(
                    (i + 1).alias("pos"),
                    F.concat_ws(" ", F.slice(toks, i + 1, k)).alias("w"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<pos:int,w:string>>"))
        old = (
            docs.select("doc_id", F.split(F.col("text"), " ").alias("toks"))
            .select("doc_id", F.explode(wins).alias("win"))
            .select("doc_id", F.col("win.pos").alias("pos"), F.col("win.w").alias("w"))
        )
        new = docs.select(
            "doc_id",
            F.posexplode(
                F.regexp_extract_all(
                    F.col("text"), F.lit(_window_pattern(k)), F.lit(1)
                )
            ).alias("p0", "w"),
        ).select("doc_id", (F.col("p0") + 1).cast("int").alias("pos"), "w")
        o = sorted(map(tuple, old.collect()))
        n = sorted(map(tuple, new.collect()))
        assert n == o, f"k={k}: regex windows diverge from slice+concat"


def test_simhash_udf_matches_golden(spark):
    """The vectorized simhash_udf must reproduce _simhash64 (the
    golden scalar the SQL oracle replays) bit-for-bit, including the
    no-shingle fallback ({text}) and the signed-long conversion."""
    from searty_spark.dedup import _simhash64, simhash_fingerprints

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "one two",          # < 3 tokens -> {text} fallback
        "",                 # empty text -> {text}
        "a  b  c d",        # empty tokens
        "ü ber münz str",   # multibyte
        "x y z " * 30,      # repeated shingles collapse to a set
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["simhash"] for r in simhash_fingerprints(docs).collect()}
    want = {i: _simhash64(t) for i, t in enumerate(texts)}
    assert got == want


def test_hash_windows_transport_parity(spark, small_corpus):
    """hash_windows=True (xxhash64 window keys — the 100-TB transport
    shape) must be row-identical to the text-keyed default on the gate
    corpora, for the whole substring family."""
    from searty_spark.dedup import dup_spans, excise_duplicates, substring_dup_stats

    for fn, kw in [
        (dup_spans, {}),
        (substring_dup_stats, {}),
        (excise_duplicates, {}),
    ]:
        text = sorted(map(tuple, fn(small_corpus, k=5, **kw).collect()))
        hashed = sorted(
            map(tuple, fn(small_corpus, k=5, hash_windows=True, **kw).collect())
        )
        assert hashed == text, f"{fn.__name__}: hash-keyed output diverges"
