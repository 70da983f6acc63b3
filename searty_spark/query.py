"""Query engine, DataFrame-native (SURVEY.md Q1-Q8 + BM25 top-k).

These operators run over the *postings* DataFrame (term, doc_id, tf,
positions) — the uncompressed row form. The segment-based WAND path
(wand.py) must produce identical results; both must match oracle.py.

Plan shapes (checked via .explain in tests/bench):
- query terms reach the scan as an `IN` predicate -> parquet
  PushedFilters (the analogue of the reference's SQL index seek,
  ref lib/database/database.go:508-526).
- per-term df / corpus stats are tiny -> broadcast joins.
- top-k is orderBy+limit -> TakeOrderedAndProject (no global sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from searty_spark import BM25_B, BM25_K1, NGRAM_N, SCORE_NDIGITS
from searty_spark.tokenize import tokenize


def bm25_score_col(
    tf: Column, doc_len: Column, avgdl: Column, n_docs: Column, df: Column
) -> Column:
    """Okapi BM25 per-(term, doc) partial score, double precision.

    idf = ln((N - df + 0.5)/(df + 0.5) + 1)  (Lucene-style, positive)
    """
    idf = F.log((n_docs - df + F.lit(0.5)) / (df + F.lit(0.5)) + F.lit(1.0))
    tf_d = tf.cast("double")
    denom = tf_d + F.lit(BM25_K1) * (
        F.lit(1.0 - BM25_B) + F.lit(BM25_B) * doc_len.cast("double") / avgdl
    )
    return idf * tf_d * F.lit(BM25_K1 + 1.0) / denom


def bm25_topk(
    postings: DataFrame,
    dstats: DataFrame,
    query: str,
    k: int = 10,
    n: int = NGRAM_N,
) -> DataFrame:
    """Disjunctive BM25 top-k over the query's unique trigrams.

    Returns (doc_id, score) with score rounded to 6 decimals; ranking
    key (score DESC, doc_id ASC) — deterministic cross-engine
    (SURVEY.md §7 hard part a). Duplicate query trigrams are deduped
    (the reference panics on them — phrase_searcher.go:26-32).
    """
    spark = postings.sparkSession
    terms = sorted(set(tokenize(query, n)))
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    cstats = dstats.agg(
        F.count("*").alias("n_docs"), F.avg("doc_len").alias("avgdl")
    )
    p = postings.filter(F.col("term").isin(terms)).select("term", "doc_id", "tf")
    dfreq = p.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        p.join(F.broadcast(dfreq), "term")
        .join(dstats, "doc_id")
        .crossJoin(F.broadcast(cstats))
        .select(
            "doc_id",
            bm25_score_col(
                F.col("tf"), F.col("doc_len"), F.col("avgdl"), F.col("n_docs"), F.col("df")
            ).alias("partial"),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("partial"), SCORE_NDIGITS).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def bm25_topk_in(
    postings: DataFrame,
    dstats: DataFrame,
    query: str,
    doc_ids: DataFrame,
    k: int = 10,
    n: int = NGRAM_N,
) -> DataFrame:
    """Metadata-filtered BM25 top-k: rank only the docs in ``doc_ids``
    (a one-column DataFrame — e.g. docs of one language / source /
    license), with idf kept CORPUS-GLOBAL so a doc's score is the same
    number bm25_topk gives it (post-filter semantics — the filter
    narrows candidates, it does not re-weight terms).

    The restriction is a semi-join applied before the dstats join, so
    scoring work is proportional to the filtered set."""
    spark = postings.sparkSession
    terms = sorted(set(tokenize(query, n)))
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double")
    cstats = dstats.agg(F.count("*").alias("n_docs"), F.avg("doc_len").alias("avgdl"))
    p = postings.filter(F.col("term").isin(terms)).select("term", "doc_id", "tf")
    dfreq = p.groupBy("term").agg(F.count("*").alias("df"))  # global df
    scored = (
        p.join(doc_ids.select("doc_id"), "doc_id", "left_semi")
        .join(F.broadcast(dfreq), "term")
        .join(dstats, "doc_id")
        .crossJoin(F.broadcast(cstats))
        .select(
            "doc_id",
            bm25_score_col(
                F.col("tf"), F.col("doc_len"), F.col("avgdl"), F.col("n_docs"), F.col("df")
            ).alias("partial"),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("partial"), SCORE_NDIGITS).alias("score"))
    )
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def phrase_bm25_topk(
    postings: DataFrame,
    dstats: DataFrame,
    query: str,
    k: int = 10,
    n: int = NGRAM_N,
) -> DataFrame:
    """(doc_id, score, n_matches) — ranked phrase search, the query
    shape a search UI issues: docs containing the exact phrase, ranked
    by BM25 over the phrase's trigrams (global df — the same score
    bm25_topk would give the doc), with the number of phrase
    occurrences. Ranking key (round(score, 6) DESC, doc_id ASC).

    Plan: the phrase match (conjunctive doc pruning before the position
    explode, see phrase_match_starts) produces the candidate doc set;
    the BM25 side is then semi-joined down to those docs BEFORE the
    dstats join, so scoring work is proportional to phrase matches,
    not to the posting lists. df stays corpus-global (computed before
    the restriction)."""
    spark = postings.sparkSession
    terms = sorted(set(tokenize(query, n)))
    if not terms:
        return spark.createDataFrame([], "doc_id long, score double, n_matches long")
    matches = (
        phrase_match_starts(postings, query, n)
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_matches"))
    )
    cstats = dstats.agg(F.count("*").alias("n_docs"), F.avg("doc_len").alias("avgdl"))
    p = postings.filter(F.col("term").isin(terms)).select("term", "doc_id", "tf")
    dfreq = p.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        p.join(matches.select("doc_id"), "doc_id", "left_semi")
        .join(F.broadcast(dfreq), "term")
        .join(dstats, "doc_id")
        .crossJoin(F.broadcast(cstats))
        .select(
            "doc_id",
            bm25_score_col(
                F.col("tf"), F.col("doc_len"), F.col("avgdl"), F.col("n_docs"), F.col("df")
            ).alias("partial"),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("partial"), SCORE_NDIGITS).alias("score"))
    )
    return (
        scored.join(matches, "doc_id")
        .select("doc_id", "score", "n_matches")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def phrase_match_starts(
    postings: DataFrame, query: str, n: int = NGRAM_N
) -> DataFrame:
    """(doc_id, rel) — every phrase match start position (Q4+Q5).

    Conjunctive intersection + positional alignment WITHOUT a position
    explode (r7): each (term, doc) posting row, joined with the query's
    (offset, term) pairs, shifts its position ARRAY by the offset
    (rel = pos - offset) as a whole; one groupBy(doc_id) then folds
    array_intersect over the per-offset rel arrays and requires every
    offset to be present (row count == n_offsets — duplicate query
    trigrams contribute one row per offset, so the count handles them
    exactly; ref semantics minus the panic). A match start survives
    iff every offset witnessed it — the same set the exploded
    (doc, rel, offset) count-distinct formulation produced, at one
    shuffle of posting-row-sized data instead of three position-row
    shuffles (scan -> prune agg -> explode/semi-join -> align agg);
    positions are distinct within a posting, so array_intersect's set
    semantics are exact."""
    spark = postings.sparkSession
    toks = tokenize(query, n)
    if not toks:
        return spark.createDataFrame([], "doc_id long, rel int")
    uniq = sorted(set(toks))
    rows = postings.filter(F.col("term").isin(uniq)).select(
        "term", "doc_id", "positions"
    )
    # term -> its query offsets as a LITERAL map: the (offset, term)
    # side is a handful of constants, so attaching offsets is an
    # element_at + explode instead of a broadcast join (no local
    # relation to ship, no broadcast exchange/job per query)
    offs: dict[str, list[int]] = {}
    for i, t in enumerate(toks):
        offs.setdefault(t, []).append(i)
    qmap = F.create_map(
        *[
            x
            for t in uniq
            for x in (F.lit(t), F.array(*[F.lit(o) for o in offs[t]]))
        ]
    )
    per_offset = rows.select(
        "doc_id", "positions", F.explode(F.element_at(qmap, F.col("term"))).alias("offset")
    ).select(
        "doc_id",
        F.expr("transform(positions, p -> p - offset)").alias("rels"),
    )
    folded = per_offset.groupBy("doc_id").agg(
        F.count("*").alias("n_offsets"),
        F.aggregate(
            F.collect_list("rels"),
            F.lit(None).cast("array<int>"),
            lambda acc, x: F.when(acc.isNull(), x).otherwise(
                F.array_intersect(acc, x)
            ),
        ).alias("rels"),
    )
    return (
        folded.filter(F.col("n_offsets") == len(toks))
        .select("doc_id", F.explode("rels").alias("rel"))
    )


def phrase_search(postings: DataFrame, query: str, n: int = NGRAM_N) -> DataFrame:
    """(doc_id) — docs containing the phrase, ascending (Q1/Q4/Q5)."""
    return (
        phrase_match_starts(postings, query, n)
        .select("doc_id")
        .distinct()
        .orderBy("doc_id")
    )


def phrase_match_ranges(
    postings: DataFrame, query: str, n: int = NGRAM_N
) -> DataFrame:
    """(doc_id, start, end) — coalesced character ranges (Q6+Q7).

    Width = n_tokens - 1 + n == len(query) chars. Island coalescing
    (ref mergeRanges, phrase_searcher.go:154-186: merge while
    next.start <= cur.end) via running-max window — no UDF.
    """
    toks = tokenize(query, n)
    width = len(toks) - 1 + n if toks else 0
    starts = phrase_match_starts(postings, query, n)
    w = Window.partitionBy("doc_id").orderBy("rel")
    prev_max_end = F.max(F.col("rel") + F.lit(width)).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    island = F.sum(
        F.when(F.col("rel") > F.coalesce(prev_max_end, F.lit(-1)), 1).otherwise(0)
    ).over(w)
    return (
        starts.withColumn("island", island)
        .groupBy("doc_id", "island")
        .agg(
            F.min("rel").alias("start"),
            (F.max("rel") + F.lit(width)).alias("end"),
        )
        .select("doc_id", "start", "end")
        .orderBy("doc_id", "start")
    )


def required_literals(pattern: str) -> list[str]:
    """Conservative extraction of literal substrings every match of
    ``pattern`` must contain — the trigram-index acceleration of regex
    search (the Cox codesearch idea, re-expressed over this engine's
    trigram postings). SOUNDNESS contract: a doc matching the regex
    always contains every returned literal; when in doubt return less.

    Rules (all conservative):
    - a top-level alternation voids everything (either branch matches);
    - groups (...) and classes [...] contribute nothing (skipped);
    - ? * {0,..} make the preceding char optional -> drop it;
    - . \\d anchors etc. break the current run;
    - escaped specials (\\.) count as the literal char;
    - any inline flag group carrying i/x/u (e.g. '(?i)spark',
      '(?i:...)', '(?ix-m:...)') voids everything: a global '(?i)'
      leaks case-insensitivity into the surrounding literals (a doc
      matching only 'SPARK' lacks 'spark''s trigrams), and '(?x)'
      free-spacing makes literal whitespace in the pattern optional —
      either would break soundness, so bail to the unpruned scan.
    Only runs of length >= NGRAM_N are useful to the index."""
    import re as _re

    if _re.search(r"\(\?[a-zA-Z\-]*[iux]", pattern):
        return []
    runs: list[str] = []
    cur: list[str] = []

    def flush():
        if len(cur) >= NGRAM_N:
            runs.append("".join(cur))
        cur.clear()

    i, n = 0, len(pattern)
    while i < n:
        c = pattern[i]
        if c == "\\" and i + 1 < n:
            nxt = pattern[i + 1]
            if nxt.isalnum():  # \d \w \b \1 ... — a class/anchor, not a literal
                flush()
            else:
                cur.append(nxt)
            i += 2
            continue
        if c == "|":
            return []  # top-level alternation: nothing is required
        if c == "(":
            depth = 1
            i += 1
            while i < n and depth:
                if pattern[i] == "\\":
                    i += 2
                    continue
                depth += {"(": 1, ")": -1}.get(pattern[i], 0)
                i += 1
            flush()
            continue
        if c == "[":
            i += 1
            if i < n and pattern[i] == "^":
                i += 1
            if i < n and pattern[i] == "]":
                i += 1
            while i < n and pattern[i] != "]":
                i += 2 if pattern[i] == "\\" else 1
            i += 1
            flush()
            continue
        if c in "?*":
            if cur:
                cur.pop()  # preceding char is optional
            flush()
            i += 1
            continue
        if c == "{":
            j = pattern.find("}", i)
            body = pattern[i + 1 : j] if j > 0 else ""
            if body.split(",")[0].strip() in ("", "0") and cur:
                cur.pop()  # {0,..} or {,..}: preceding char optional
            flush()
            i = (j + 1) if j > 0 else n
            continue
        if c in ".^$+":
            # '.'/anchors break the run; 'x+' guarantees one x, so the
            # run INCLUDING x is kept — but what follows the + is not
            # adjacent to a single x, so the run ends here either way
            flush()
            i += 1
            continue
        cur.append(c)
        i += 1
    flush()
    return runs


def regex_search(
    docs: DataFrame, postings: DataFrame, pattern: str, n: int = NGRAM_N
) -> DataFrame:
    """(doc_id) — docs whose text matches ``pattern``, accelerated by
    the trigram index: every required literal's trigrams must all be
    present in a doc (pure index work, pushed-down term filters), and
    only the surviving candidates pay the regex evaluation. With no
    extractable literal (e.g. a top-level alternation of classes) this
    degrades to the full verify scan — still correct, just unpruned.

    Candidate superset note: "contains all trigrams of L" is a superset
    of "contains substring L", which is itself a superset of "matches
    the regex" — verification makes the result exact."""
    cand = None
    for lit in required_literals(pattern):
        terms = sorted(set(tokenize(lit, n)))
        if not terms:
            continue
        have = (
            postings.filter(F.col("term").isin(terms))
            .groupBy("doc_id")
            .agg(F.count_distinct("term").alias("nt"))
            .filter(F.col("nt") == len(terms))
            .select("doc_id")
        )
        cand = have if cand is None else cand.join(have, "doc_id", "left_semi")
    pruned = docs if cand is None else docs.join(cand, "doc_id", "left_semi")
    return (
        pruned.filter(F.col("text").rlike(pattern)).select("doc_id").orderBy("doc_id")
    )


def regex_search_segments(
    docs: DataFrame,
    segments: DataFrame,
    pattern: str,
    n: int = NGRAM_N,
    n_shards: int | None = None,
) -> DataFrame:
    """Segment-path twin of :func:`regex_search`: candidates come from
    the COMPRESSED index (per-shard block-pruned trigram intersection,
    see phrase_seg.docs_with_all_terms_segments) instead of posting
    rows; the doc table is touched only to verify the surviving
    candidates with the exact regex."""
    from searty_spark.phrase_seg import docs_with_all_terms_segments

    cand = None
    for lit in required_literals(pattern):
        terms = sorted(set(tokenize(lit, n)))
        if not terms:
            continue
        have = docs_with_all_terms_segments(segments, terms, n_shards=n_shards)
        cand = have if cand is None else cand.join(have, "doc_id", "left_semi")
    pruned = docs if cand is None else docs.join(cand, "doc_id", "left_semi")
    return (
        pruned.filter(F.col("text").rlike(pattern)).select("doc_id").orderBy("doc_id")
    )


def resolve_ranges(ranges: DataFrame, docs: DataFrame) -> DataFrame:
    """Q8+Q11 (ref resolveResultDocument + pretty_print.go:11-41):
    join match ranges back to documents and extract the containing
    line — `line_start..line_end` are the newline-delimited bounds
    around the match (whole text when there are no newlines), matching
    the reference's backward/forward line scan. Pure SQL.
    """
    j = ranges.join(docs, "doc_id")
    # 0-based match offsets; substring() is 1-based
    prefix_rev = F.reverse(F.substring(F.col("text"), 1, F.col("start")))
    nl_before = F.locate("\n", prefix_rev)  # chars back to previous newline
    line_start = F.when(nl_before == 0, F.lit(1)).otherwise(
        F.col("start") - nl_before + 2
    )
    suffix = F.expr("substring(text, `end` + 1)")
    nl_after = F.locate("\n", suffix)
    line_end = F.when(nl_after == 0, F.char_length("text")).otherwise(
        F.col("end") + nl_after - 1
    )
    key = F.col("url") if "url" in j.columns else F.col("doc_id").cast("string")
    return j.select(
        "doc_id",
        key.alias("key"),
        "start",
        "end",
        F.substring(F.col("text"), line_start, line_end - line_start + F.lit(1)).alias(
            "line"
        ),
    ).orderBy("key", "start")


def filename_search(corpus: DataFrame, needle: str) -> DataFrame:
    """Q10 analogue (ref lib/searcher/file_searcher.go:20-33):
    substring match over the document key column."""
    return corpus.filter(F.col("url").contains(needle)).select("doc_id", "url").orderBy("doc_id")
