"""Top-k BM25 over compressed segments with MaxScore/block-max pruning.

Exact top-k (rank- and score-identical to the DataFrame path and the
brute-force oracle), structured like the query pipeline of SURVEY.md
§3.3 (ref lib/searcher/phrase_searcher.go:211-245, with the WAND-style
pruning the north rule adds where the reference does exhaustive
intersection — Q4 hook):

1. driver: tokenize query, prune the segment scan to the query terms'
   buckets (partition pruning) + terms (predicate pushdown);
2. per shard (mapInPandas over co-grouped segment rows): MaxScore —
   - seed the threshold from the highest-max-impact term's postings,
   - split terms into essential / non-essential by cumulative bound,
   - TAAT-score essential terms vectorized (np.add.at),
   - candidates = docs whose essential score + Σ non-essential bounds
     clears the threshold; decode ONLY the non-essential blocks that
     can contain candidates (searchsorted on block_last_doc),
   - exact rescore of candidates -> local top-k;
3. global top-k = orderBy(score desc, doc_id) + limit over the union
   of local top-ks (exact: each doc lives in one shard).

Per-block upper bounds are reconstructed at query time from the
stats-free block metadata: bound = idf(df_global) * g(max_tf, min_dl),
where idf is the term's positive scalar and g is increasing in tf /
decreasing in dl — always >= every true impact in the block, so
pruning never changes results. df_global itself is the sum of the
term's per-shard ``df`` values: either joined in from the dictionary
(``df_lookup``) or aggregated from the pruned segment rows inside the
same query plan (no extra job either way).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searty_spark import BM25_B, BM25_K1, NGRAM_N, SCORE_NDIGITS
from searty_spark.segments import bm25_impact, decode_score_block
from searty_spark.tokenize import tokenize

# the columns BM25 scoring actually reads — everything the score
# kernels touch, nothing the phrase path needs (pos_blob et al.)
SCORE_COLS = [
    "shard", "term", "df", "blob",
    "block_offset", "block_last_doc", "block_max_tf", "block_min_dl",
]


def _impacts(tfs, dls, n_docs: int, avgdl: float, df_global: int) -> np.ndarray:
    idf = math.log((n_docs - df_global + 0.5) / (df_global + 0.5) + 1.0)
    tf = tfs.astype(np.float64)
    denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dls.astype(np.float64) / avgdl)
    return idf * tf * (BM25_K1 + 1.0) / denom


def _decode_blocks(row: dict, blocks) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    blob = row["blob"]
    offs = list(row["block_offset"]) + [len(blob)]
    ds, ts, ls = [], [], []
    for b in blocks:
        d, t, l = decode_score_block(blob[offs[b] : offs[b + 1]])
        ds.append(d)
        ts.append(t)
        ls.append(l)
    if not ds:
        z = np.empty(0, dtype=np.uint64)
        return z, z.copy(), z.copy()
    return np.concatenate(ds), np.concatenate(ts), np.concatenate(ls)


def _require_df(row: dict) -> int:
    v = row["df_global"]
    if v is None or v != v:  # None or NaN (nulls arrive as NaN via Arrow)
        raise ValueError(
            f"df_lookup has no entry for term {row['term']!r}, which has "
            "postings — the lookup must cover every indexed query term"
        )
    return int(row["df_global"])


def _term_scores(row: dict, n_docs: int, avgdl: float, blocks=None):
    blocks = blocks if blocks is not None else range(len(row["block_offset"]))
    docs, tfs, dls = _decode_blocks(row, blocks)
    return docs.astype(np.int64), _impacts(tfs, dls, n_docs, avgdl, _require_df(row))


def _check_duplicate_term_rows(rows: list[dict]) -> None:
    """Duplicate (shard, term) rows come from unmerged partial indexes.
    Summing their impacts is exact BM25 only while each duplicate's doc
    set is disjoint (impact(tf1)+impact(tf2) != impact(tf1+tf2)); an
    overlapping doc would be silently mis-scored, so verify
    disjointness and raise — the symmetric guard to the
    wand_topk_batch / phrase path raises. Decodes doc_ids only (no
    impact math; the scoring pass re-decodes with block pruning)."""
    from collections import Counter

    counts = Counter(r["term"] for r in rows)
    for term, n in counts.items():
        if n < 2:
            continue
        all_docs = np.concatenate(
            [
                _decode_blocks(r, range(len(r["block_offset"])))[0]
                for r in rows
                if r["term"] == term
            ]
        ).astype(np.int64)
        if np.unique(all_docs).size != all_docs.size:
            raise ValueError(
                f"duplicate segment rows for term {term!r} share doc_ids — "
                "unmerged partial indexes overlap; merge them before querying"
            )


def _gather_add(
    r: dict,
    blocks: list[int],
    cdocs: np.ndarray,
    cscores: np.ndarray,
    n_docs: int,
    avgdl: float,
) -> np.ndarray:
    """Decode the given blocks of one term row and add each candidate
    doc's exact impact to its running score (one searchsorted gather,
    no per-doc Python)."""
    tdocs, tsc = _term_scores(r, n_docs, avgdl, blocks)
    idx = np.searchsorted(tdocs, cdocs)
    ok = idx < tdocs.size
    hit = ok.copy()
    hit[ok] = tdocs[idx[ok]] == cdocs[ok]
    add = np.zeros(cdocs.size, dtype=np.float64)
    add[hit] = tsc[idx[hit]]
    return cscores + add


def _candidate_blocks(r: dict, cdocs: np.ndarray) -> np.ndarray:
    """Block ids of ``r`` that can contain any of the (sorted)
    candidate docs — searchsorted on block_last_doc."""
    last = np.asarray(r["block_last_doc"], dtype=np.int64)
    first_needed = np.searchsorted(last, cdocs, side="left")
    return np.unique(first_needed[first_needed < last.size])


def shard_topk(
    rows: list[dict], n_docs: int, avgdl: float, k: int, theta0: float = 0.0
) -> pd.DataFrame:
    """Exact MaxScore top-k for one shard's query-term segment rows.

    ``theta0`` is an optional EXTERNAL lower bound on the global
    kth-best total score (champions.champion_theta) — with it, the
    kernel block-prunes the ESSENTIAL terms too (including the seed):
    a block b of term i may be skipped when
    bound(b) + sum(other terms' upper bounds) < theta, because every
    doc in it then provably scores below the global kth best. Docs that
    were partially scored but may have contributions in skipped blocks
    are exactly rescored from just those blocks before the top-k cut,
    so results stay identical to the exhaustive path (tested). With
    theta0 == 0 the behavior is the original seed-then-split MaxScore.

    Duplicate (shard, term) rows (unmerged partial indexes) are
    accepted when their doc sets are disjoint — then per-row scoring
    sums to exact BM25 — and rejected otherwise."""
    if not rows:
        return pd.DataFrame({"doc_id": [], "score": []})
    if len({r["term"] for r in rows}) != len(rows):
        _check_duplicate_term_rows(rows)
    bubs = [
        bm25_impact(
            np.asarray(r["block_max_tf"], dtype=np.float64),
            np.asarray(r["block_min_dl"], dtype=np.float64),
            n_docs,
            avgdl,
            _require_df(r),
        )
        for r in rows
    ]
    ubs = np.array([float(b.max()) for b in bubs])
    order = np.argsort(-ubs, kind="stable")  # descending upper bound
    rows = [rows[i] for i in order]
    bubs = [bubs[i] for i in order]
    ubs = ubs[order]
    n_terms = len(rows)

    # PAD makes every pruning decision safe under the final 1e-6
    # rounding of the ranking key (a pruned doc's ROUNDED score is
    # strictly below the kth's — see tests/test_wand.py).
    PAD = 2e-6
    theta = (theta0 - PAD) if theta0 > 0.0 else -np.inf
    skipped: list[tuple[dict, np.ndarray, float]] = []

    # --- seed term: decode, block-pruned by theta0 when one is given
    # (with theta = -inf the keep test is vacuous -> full decode, the
    # original behavior). Skip rule for block b of term i:
    # bound(b) + sum_{j != i} ub_j < theta => no doc in b can reach the
    # global kth best, even with maximal help from every other term.
    bub0, other0 = bubs[0], float(ubs[1:].sum())
    keep0 = np.nonzero(bub0 + other0 >= theta)[0]
    if keep0.size == bub0.size:
        seed_docs, seed_sc = _term_scores(rows[0], n_docs, avgdl)
    else:
        sk = np.setdiff1d(np.arange(bub0.size), keep0)
        skipped.append((rows[0], sk, float(bub0[sk].max())))
        if keep0.size:
            seed_docs, seed_sc = _term_scores(rows[0], n_docs, avgdl, keep0.tolist())
        else:
            seed_docs = np.empty(0, dtype=np.int64)
            seed_sc = np.empty(0, dtype=np.float64)
    # decoded seed impacts are exact per-doc partials -> valid bound
    theta = max(theta, _kth(seed_sc, k) - PAD)
    if n_terms == 1:
        return _topk_frame(seed_docs, seed_sc, k)

    # --- split essential / non-essential by cumulative bound (asc)
    cum = np.cumsum(ubs[::-1])[::-1]  # cum[i] = ubs[i] + ubs[i+1] + ...
    # non-essential suffix: maximal suffix with sum(ubs) < theta
    ness_start = n_terms
    for i in range(n_terms - 1, 0, -1):
        if cum[i] < theta:
            ness_start = i
        else:
            break
    essential, non_essential = rows[:ness_start], rows[ness_start:]
    ub_ness = float(cum[ness_start]) if ness_start < n_terms else 0.0

    # --- TAAT over essential terms (term 0 already decoded), each
    # decode block-pruned by the same skip rule
    ess_ub_sum = float(ubs[:ness_start].sum())
    parts = [(seed_docs, seed_sc)]
    for i, r in enumerate(essential[1:], start=1):
        bub = bubs[i]
        other = ess_ub_sum - float(ubs[i]) + ub_ness
        keep = np.nonzero(bub + other >= theta)[0]
        if keep.size == bub.size:
            parts.append(_term_scores(r, n_docs, avgdl))
        else:
            sk = np.setdiff1d(np.arange(bub.size), keep)
            skipped.append((r, sk, float(bub[sk].max())))
            if keep.size:
                parts.append(_term_scores(r, n_docs, avgdl, keep.tolist()))
    all_docs = np.concatenate([p[0] for p in parts])
    all_sc = np.concatenate([p[1] for p in parts])
    if all_docs.size == 0:
        # every essential block provably scores below the global kth
        # best: this shard contributes nothing to the top-k
        return pd.DataFrame({"doc_id": [], "score": []})
    docs, inv = np.unique(all_docs, return_inverse=True)
    scores = np.zeros(docs.size, dtype=np.float64)
    np.add.at(scores, inv, all_sc)

    # partial sums are lower bounds on totals -> still a valid theta
    theta = max(theta, _kth(scores, k) - PAD)
    slack = sum(s[2] for s in skipped)  # max possible skipped impact
    cand = scores + ub_ness + slack >= theta - 1e-12
    cdocs, cscores = docs[cand], scores[cand]

    # --- exact rescore: skipped essential blocks first (restores exact
    # scores for candidates that ALSO live in a pruned block), then
    # non-essential terms — in both cases only blocks that can contain
    # candidates decode
    for r, sk, _ in skipped:
        needed = np.intersect1d(_candidate_blocks(r, cdocs), sk)
        if needed.size:
            cscores = _gather_add(r, needed.tolist(), cdocs, cscores, n_docs, avgdl)
    for r in non_essential:
        blocks = _candidate_blocks(r, cdocs)
        if blocks.size:
            cscores = _gather_add(r, blocks.tolist(), cdocs, cscores, n_docs, avgdl)
    return _topk_frame(cdocs, cscores, k)


def _kth(scores: np.ndarray, k: int) -> float:
    """kth-largest, or 0.0 when fewer than k entries exist (only then
    is it NOT a valid lower bound on the true kth-best total, so no
    pruning leverage — all impacts are positive, 0 is always safe)."""
    if scores.size < k:
        return 0.0
    return float(np.partition(scores, -k)[-k])


def _topk_frame(docs: np.ndarray, scores: np.ndarray, k: int) -> pd.DataFrame:
    r = np.round(scores, SCORE_NDIGITS)
    order = np.lexsort((docs, -r))[:k]
    return pd.DataFrame({"doc_id": docs[order].astype(np.int64), "score": r[order]})


class TermDfClient:
    """Bounded per-query term->df_global fetch against the on-disk
    dictionary, with a driver-side hot-term cache — the query-server
    deployment shape. The full trigram dictionary never moves to the
    driver (at web scale it's 10^8+ rows); each query fetches only its
    own few terms via a pushed-filter parquet scan, and repeated terms
    hit the cache, so a warmed server pays zero per-query fetch jobs.
    ``lookup(terms)`` returns a plain dict usable as ``df_lookup`` —
    terms absent from the dictionary are omitted, which is safe: the
    dictionary is derived from the segment rows, so an absent term has
    no postings and never reaches the scoring kernel."""

    _ABSENT = object()

    def __init__(self, spark, index_dir: str):
        import threading

        self._df = spark.read.parquet(f"{index_dir}/dictionary").select(
            "term", "df_global"
        )
        self._cache: dict[str, object] = {}
        # lookup() is called from concurrent query-server threads
        # (cli.py bench-queries --threads is the in-repo instance of the
        # deployment shape); the lock makes read-check-fetch-update
        # explicitly safe rather than relying on the GIL, and bounds the
        # worst case to one fetch per cold term instead of duplicates
        self._lock = threading.Lock()

    def lookup(self, terms) -> dict[str, int]:
        with self._lock:
            missing = [t for t in terms if t not in self._cache]
        if missing:
            # the Spark collect runs OUTSIDE the lock (it can take
            # hundreds of ms; serializing it would serialize the server)
            rows = self._df.filter(F.col("term").isin(missing)).collect()
            with self._lock:
                for r in rows:
                    self._cache[r["term"]] = int(r["df_global"])
                for t in missing:
                    self._cache.setdefault(t, self._ABSENT)
        with self._lock:
            return {
                t: v for t in terms if (v := self._cache.get(t)) is not self._ABSENT
            }


def _with_df_global(pruned: DataFrame, terms, df_lookup) -> DataFrame:
    """Attach df_global to the pruned segment rows.

    ``df_lookup`` may be:
    - a plain ``dict[str, int]`` (term -> global df): the query-server
      fast path — injected as a literal map, ZERO extra plan nodes or
      exchanges (a warmed server keeps the hot-term dictionary
      driver-side; at full dictionary scale it would be an external KV
      and still not a per-query Spark job);
    - a DataFrame (term, df_global), e.g. the on-disk dictionary: a
      tiny pushed-filter scan + broadcast join inside the same job;
    - None: df_global = sum of the term's per-shard ``df`` aggregated
      from the pruned rows themselves (general fallback; adds one
      small exchange).
    """
    if isinstance(df_lookup, dict):
        # terms absent from the dict map to NULL; if such a term turns
        # out to HAVE segment rows, the scoring kernel raises rather
        # than silently over-weighting it with df=0 (a term with no
        # rows never reaches the kernel, so a FULL dictionary is
        # always safe even for query terms missing from the corpus)
        present = [t for t in terms if t in df_lookup]
        if not present:
            return pruned.withColumn("df_global", F.lit(None).cast("long"))
        mapping = F.create_map(
            *[x for t in present for x in (F.lit(t), F.lit(int(df_lookup[t])))]
        )
        return pruned.withColumn("df_global", mapping[F.col("term")])
    if df_lookup is not None:
        dfg = df_lookup.select("term", "df_global").filter(F.col("term").isin(list(terms)))
        # LEFT join: a term with postings but no dictionary row must
        # reach the kernel as null df (-> explicit raise), never be
        # silently dropped by an inner join (stale/partial dictionary)
        return pruned.join(F.broadcast(dfg), "term", "left")
    dfg = pruned.groupBy("term").agg(F.sum("df").cast("long").alias("df_global"))
    return pruned.join(F.broadcast(dfg), "term")


def wand_topk(
    segments: DataFrame,
    dstats: DataFrame,
    query: str,
    k: int = 10,
    n: int = NGRAM_N,
    n_docs: int | None = None,
    avgdl: float | None = None,
    n_buckets: int | None = None,
    n_shards: int | None = None,
    df_lookup=None,
    terms: list[str] | None = None,
    theta0: float = 0.0,
    pre_partitioned: bool = False,
) -> DataFrame:
    """(doc_id, score) exact BM25 top-k from the segment table.

    ``pre_partitioned=True`` is the warm-server fast path: the CALLER
    asserts ``segments`` is already hash-partitioned by ``shard``
    (e.g. ``.repartition(n_shards, "shard").cache()`` done once at
    startup — cmd_bench_queries does exactly this). The per-query
    repartition exchange is then skipped entirely: term filter,
    projection and df_global attach are narrow, so the query runs as
    ONE stage (mapInPandas over the cached partitions) plus the
    TakeOrdered reduce. Correctness REQUIRES the assertion — a shard
    split across partitions would split a doc's term contributions
    into separate local top-ks and underscore it; do not pass this for
    an arbitrary DataFrame.

    ``n_shards`` caps the query-side parallelism at the shard count —
    without it the repartition uses spark.sql.shuffle.partitions and
    schedules mostly-empty tasks (pure latency).

    ``terms`` overrides the default trigram tokenization of ``query``
    — the hook for alternate analyzers (e.g. the Lisp analyzer's
    kind-composite terms, index.query_index_lisp).

    ``theta0``: external lower bound on the global kth-best score
    (champions.champion_theta) — enables essential-term block pruning
    in every shard kernel; results are identical with or without it
    (the bound only skips blocks that provably can't affect the
    top-k)."""
    spark = segments.sparkSession
    if terms is None:
        terms = sorted(set(tokenize(query, n)))
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    if n_docs is None or avgdl is None:
        row = dstats.agg(F.count("*").alias("n"), F.avg("doc_len").alias("a")).collect()[0]
        n_docs, avgdl = int(row["n"]), float(row["a"])

    pruned = segments.filter(F.col("term").isin(terms))
    if n_buckets is not None and "bucket" in segments.columns:
        # partition pruning when the segment table is stored
        # partitioned by bucket (see index.py for the hash helper)
        from searty_spark.index import term_buckets

        pruned = pruned.filter(
            F.col("bucket").isin(term_buckets(spark, terms, n_buckets))
        )
    # EXPLICIT column pruning: mapInPandas consumes its child's whole
    # schema, so Catalyst cannot prune for us — without this select the
    # repartition shuffles pos_blob (positions — often the LARGEST
    # column, unused by BM25 scoring) and cf/bucket through the
    # exchange and Arrow on every query. For a 1M-doc head term that is
    # several MB of dead weight per query.
    pruned = pruned.select(*SCORE_COLS)

    withg = _with_df_global(pruned, terms, df_lookup)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        by_shard: dict[int, list[dict]] = {}
        for pdf in batches:
            for rec in pdf.to_dict("records"):
                by_shard.setdefault(int(rec["shard"]), []).append(rec)
        for shard, rows in by_shard.items():
            yield shard_topk(rows, n_docs, avgdl, k, theta0)

    if pre_partitioned:
        rep = withg
    else:
        rep = (
            withg.repartition(n_shards, "shard")
            if n_shards
            else withg.repartition("shard")
        )
    local = rep.mapInPandas(run, "doc_id long, score double")
    return local.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def wand_topk_batch(
    segments: DataFrame,
    queries: dict[str, str],
    k: int = 10,
    n: int = NGRAM_N,
    n_docs: int | None = None,
    avgdl: float | None = None,
    n_shards: int | None = None,
    df_lookup=None,
    pre_partitioned: bool = False,
) -> DataFrame:
    """(query_id, doc_id, score) — exact top-k for MANY queries in ONE
    segment scan. Each term's blocks decode once per shard and are
    shared by every query that uses the term; the global per-query
    top-k is a window row_number (partitioned by query, so no global
    sort). This is the batch-evaluation shape: at 10^12 docs the scan
    dominates, and it amortizes across the whole query set.

    ``pre_partitioned=True`` skips the repartition — the same warm-
    server contract as wand_topk: the caller guarantees no shard's rows
    are split across partitions (the cached shard-partitioned segments
    of cli._warm_server). Whole shards sharing a partition is fine:
    the kernel keys its state by shard."""
    from pyspark.sql import Window

    spark = segments.sparkSession
    q_terms = {qid: sorted(set(tokenize(q, n))) for qid, q in queries.items()}
    all_terms = sorted({t for ts in q_terms.values() for t in ts})
    if not all_terms:
        return spark.createDataFrame([], "query_id string, doc_id long, score double")
    assert n_docs is not None and avgdl is not None
    pruned = _with_df_global(
        segments.filter(F.col("term").isin(all_terms)).select(*SCORE_COLS),
        all_terms,
        df_lookup,
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        by_shard: dict[int, dict[str, dict]] = {}
        for pdf in batches:
            for rec in pdf.to_dict("records"):
                shard_rows = by_shard.setdefault(int(rec["shard"]), {})
                if rec["term"] in shard_rows:
                    # >1 row per (shard, term) = unmerged partial
                    # indexes; overwriting would silently drop postings
                    # (the single-query list path handles them — this
                    # batch path keys by term and cannot)
                    raise ValueError(
                        f"duplicate segment row for (shard={rec['shard']}, "
                        f"term={rec['term']!r}); merge partial indexes before querying"
                    )
                shard_rows[rec["term"]] = rec
        for shard, rows in by_shard.items():
            # decode every needed term once, share across queries
            cache: dict[str, tuple] = {}
            for qid, terms in q_terms.items():
                sub = [rows[t] for t in terms if t in rows]
                if not sub:
                    continue
                frame = shard_topk_cached(sub, n_docs, avgdl, k, cache)
                frame.insert(0, "query_id", qid)
                yield frame

    if pre_partitioned:
        rep = pruned
    else:
        rep = (
            pruned.repartition(n_shards, "shard")
            if n_shards
            else pruned.repartition("shard")
        )
    local = rep.mapInPandas(run, "query_id string, doc_id long, score double")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        local.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .drop("rnk")
        .orderBy("query_id", F.desc("score"), F.asc("doc_id"))
    )


def shard_topk_cached(
    rows: list[dict], n_docs: int, avgdl: float, k: int, cache: dict
) -> pd.DataFrame:
    """shard_topk variant sharing decoded term scores across queries
    (exhaustive TAAT per query — the decode, not the arithmetic, is the
    cost being amortized)."""
    parts = []
    for r in rows:
        key = r["term"]
        if key not in cache:
            cache[key] = _term_scores(r, n_docs, avgdl)
        parts.append(cache[key])
    all_docs = np.concatenate([p[0] for p in parts])
    all_sc = np.concatenate([p[1] for p in parts])
    docs, inv = np.unique(all_docs, return_inverse=True)
    scores = np.zeros(docs.size, dtype=np.float64)
    np.add.at(scores, inv, all_sc)
    return _topk_frame(docs, scores, k)
