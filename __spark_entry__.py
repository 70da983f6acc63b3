"""Driver contract for the spark-graft builder (PySpark target).

Every entry in ``queries()`` is one operator from SURVEY.md §2 (searty
parity: postings build, dictionary, BM25 top-k, phrase search with
range coalescing, symbol/filename lookup) or a training-data pipeline
operator (dedup exact/Jaccard/MinHash/SimHash/clusters, corpus
cleaning/sampling, ANN brute-force/LSH/IVF, text analysis,
sessionization). ``oracle_sql()`` carries the DuckDB
twin for every query, including SimHash (the md5 bit math is
replicated in SQL — see ``_simhash_sql``). MinHash output is
exact-Jaccard-verified with recall 1.0, so it is gated against the
exact-Jaccard SQL, which makes the recall claim part of the gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from searty_spark import ann, dedup, events, textops
from searty_spark.build import build_postings, doc_stats, term_dictionary, token_rows
from searty_spark.query import (
    bm25_topk,
    phrase_bm25_topk,
    phrase_match_ranges,
    phrase_search,
)
from searty_spark.tokenize import tokenize

# --- fixed query literals (probed to exist in the synthetic corpus) ---
Q_BM25_COMMON = "data"
Q_BM25_MULTI = "spark join"
Q_PHRASE = "spark table"
Q_PHRASE_PERIODIC = "table table"  # adjacent repeats -> range coalescing
K_BM25 = 20
JACC_T = 0.2
SYMBOL = "key"
IVF_CELLS, IVF_ITER, IVF_SAMPLE, IVF_PROBE = 32, 2, 4096, 4
# refine=200 chosen from the measured sweep (BENCH/pq_recall.json):
# recall@10 0.83 on the adversarial near-uniform synthetic embeddings
# and 1.0 on the clustered fixture, vs 0.60/0.33 at refine=50 — the
# exact re-rank of 200 rows costs microseconds, so the bigger
# candidate cut is free at any scale
PQ_M, PQ_K, PQ_REFINE = 8, 16, 200


def _ensure_shipped(spark: SparkSession) -> None:
    """Ship the searty_spark package zip to executor Python workers —
    the driver may hand us a session it built itself (no --py-files),
    and our pandas-UDF closures unpickle `searty_spark` on workers."""
    try:
        from searty_spark.session import _package_zip

        if not getattr(spark, "_searty_shipped", False):
            spark.sparkContext.addPyFile(_package_zip())
            spark._searty_shipped = True
    except Exception:
        pass  # already added, or local import works anyway


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_shipped(spark)
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_shipped(spark)
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    _ensure_shipped(spark)
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-k over the sf0.001 documents corpus."""
    docs = _docs(spark, "/root/testdata/sf0.001")
    p = build_postings(docs)
    s = doc_stats(docs)
    return bm25_topk(p, s, Q_BM25_COMMON, k=10)


# ---------------------------------------------------------------- queries


def q_term_stats(spark, sf):
    p = build_postings(_docs(spark, sf))
    return p.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("cf"),
    )


def q_postings_check(spark, sf):
    return (
        token_rows(_docs(spark, sf))
        .groupBy("term", "doc_id")
        .agg(
            F.count("*").cast("long").alias("tf"),
            F.min("pos").cast("long").alias("min_pos"),
            F.max("pos").cast("long").alias("max_pos"),
            F.sum("pos").cast("long").alias("sum_pos"),
        )
    )


def q_term_df_hist(spark, sf):
    """(df, n_terms) — document-frequency histogram of the trigram
    vocabulary: the Zipf diagnostic that sizes shard/bucket choices
    (how heavy is the head, how long is the tail)."""
    p = build_postings(_docs(spark, sf))
    return (
        p.groupBy("term")
        .agg(F.count("*").alias("df"))
        .groupBy("df")
        .agg(F.count("*").cast("long").alias("n_terms"))
        .select(F.col("df").cast("long").alias("df"), "n_terms")
    )


def q_doc_stats(spark, sf):
    return doc_stats(_docs(spark, sf))


def q_dictionary(spark, sf):
    return term_dictionary(build_postings(_docs(spark, sf)), method="rownum")


def _bm25(spark, sf, q, k):
    docs = _docs(spark, sf)
    return bm25_topk(build_postings(docs), doc_stats(docs), q, k=k)


def q_bm25_common(spark, sf):
    return _bm25(spark, sf, Q_BM25_COMMON, K_BM25)


def q_bm25_multi(spark, sf):
    return _bm25(spark, sf, Q_BM25_MULTI, K_BM25)


def q_phrase_search(spark, sf):
    return phrase_search(build_postings(_docs(spark, sf)), Q_PHRASE)


def _segments(spark, sf):
    from searty_spark.segments import build_segments

    docs = _docs(spark, sf)
    p = build_postings(docs, with_doc_len=True)
    return build_segments(p, doc_stats(docs), n_shards=4, n_buckets=16)


def q_bm25_wand(spark, sf):
    """Same result as bm25_topk_common, computed from the compressed
    block-max segments via MaxScore — gates the whole segment path."""
    from searty_spark.wand import wand_topk

    return wand_topk(_segments(spark, sf), doc_stats(_docs(spark, sf)), Q_BM25_COMMON, k=K_BM25)


def q_phrase_ranges_seg(spark, sf):
    """Segment-path phrase ranges — same oracle as phrase_ranges."""
    from searty_spark.phrase_seg import phrase_ranges_segments

    return phrase_ranges_segments(_segments(spark, sf), Q_PHRASE_PERIODIC).select(
        "doc_id",
        F.col("start").cast("long").alias("start_pos"),
        F.col("end").cast("long").alias("end_pos"),
    )


def q_phrase_ranges(spark, sf):
    return phrase_match_ranges(
        build_postings(_docs(spark, sf)), Q_PHRASE_PERIODIC
    ).select(
        "doc_id",
        F.col("start").cast("long").alias("start_pos"),
        F.col("end").cast("long").alias("end_pos"),
    )


def q_phrase_bm25(spark, sf):
    """Ranked phrase search (the real search-UI query shape): phrase
    matching + BM25 ranking + occurrence counts, DataFrame path."""
    docs = _docs(spark, sf)
    return phrase_bm25_topk(build_postings(docs), doc_stats(docs), Q_PHRASE, k=K_BM25)


def q_phrase_bm25_seg(spark, sf):
    """Segment-path twin of phrase_bm25 — same composed oracle."""
    from searty_spark.phrase_seg import phrase_bm25_topk_segments

    s = doc_stats(_docs(spark, sf))
    row = s.agg(F.count("*").alias("n"), F.avg("doc_len").alias("a")).collect()[0]
    return phrase_bm25_topk_segments(
        _segments(spark, sf), Q_PHRASE, k=K_BM25,
        n_docs=int(row["n"]), avgdl=float(row["a"]),
    )


def q_symbol_defs(spark, sf):
    """Q9 with a package-qualified query (`en:key`): parse ->
    broadcast symbol match set -> definitions -> documents, the
    reference's three-way lookup (definition_searcher.go:101-124)."""
    from searty_spark.symbols import search_definitions

    return search_definitions(_docs(spark, sf), f"en:{SYMBOL}")


def q_symbol_defs_bare(spark, sf):
    """Q9 with a bare-name query — matches the symbol in EVERY
    package (the reference's resolveSymbolsByName path)."""
    from searty_spark.symbols import search_definitions

    return search_definitions(_docs(spark, sf), SYMBOL)


def q_package_defs(spark, sf):
    """Package-definition lookup (DEFPACKAGE analogue)."""
    from searty_spark.symbols import search_package_definitions

    return search_package_definitions(_docs(spark, sf), "en")


def q_symbol_lookup(spark, sf):
    """Symbol-definition search analogue (SURVEY.md Q9): the corpus
    'defines' its first whitespace token at position 0."""
    d = _docs(spark, sf)
    return (
        d.select("doc_id", F.split("text", " ").getItem(0).alias("symbol"))
        .filter(F.col("symbol") == SYMBOL)
        .orderBy("doc_id")
    )


def q_filename_search(spark, sf):
    """Q10 analogue: substring match on the document key column."""
    return (
        _docs(spark, sf)
        .filter(F.col("source").contains("1"))
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


def _lisp_fixture(docs: DataFrame) -> DataFrame:
    """Deterministic Lisp-ish corpus derived from the documents table:
    `(defun <w0> ( <w1> <w2> ) "<w3>" <w4> )` where w_i is the doc's
    i-th whitespace token sanitized to [a-z0-9] and prefixed with 's'
    (always a plain symbol). Every fixture doc lexes to exactly 10
    tokens, 5 of them SYMBOLs — a generation rule simple enough to
    replay in the DuckDB oracle while the Spark side runs the REAL
    scanner + composite-key segment encoder."""
    toks = F.split(F.col("text"), " ")

    def w(i: int):
        return F.concat(
            F.lit("s"),
            F.regexp_replace(F.coalesce(toks.getItem(i), F.lit("")), "[^a-z0-9]", ""),
        )

    text = F.concat_ws(
        " ",
        F.lit("(defun"), w(0), F.lit("("), w(1), w(2), F.lit(")"),
        F.concat(F.lit('"'), w(3), F.lit('"')), w(4), F.lit(")"),
    )
    return docs.select("doc_id", text.alias("text"))


def _lisp_segments(spark, sf):
    """Fixture corpus -> kind-composite token rows -> segments (the
    write_index(analyzer="lisp") build path, in memory)."""
    from pyspark.sql import Window

    from searty_spark.index import LISP_KIND_SEP
    from searty_spark.lisp_tokenizer import lisp_token_rows
    from searty_spark.segments import build_segments_from_tokens

    fx = _lisp_fixture(_docs(spark, sf))
    toks = lisp_token_rows(fx).select(
        "doc_id",
        F.concat("kind", F.lit(LISP_KIND_SEP), "term").alias("term"),
        "pos",
        F.count("*").over(Window.partitionBy("doc_id")).alias("doc_len"),
    )
    return build_segments_from_tokens(toks, n_shards=4, n_buckets=8)


def q_lisp_index_symbols(spark, sf):
    """T2 wired into the index: SYMBOL-kind dictionary stats (df, cf)
    read back from the composite-key segment table — gates scanner +
    kind keying + segment encoding end-to-end."""
    from searty_spark.index import LISP_KIND_SEP

    prefix = "SYMBOL" + LISP_KIND_SEP
    seg = _lisp_segments(spark, sf).filter(F.col("term").startswith(prefix))
    return (
        seg.select(F.substring("term", len(prefix) + 1, 1 << 20).alias("symbol"), "df", "cf")
        .groupBy("symbol")
        .agg(F.sum("df").cast("long").alias("df"), F.sum("cf").cast("long").alias("cf"))
    )


def q_lisp_symbol_bm25(spark, sf):
    """Kind-FILTERED BM25 over the lisp index: only SYMBOL occurrences
    of the query token score — the same text inside the fixture's
    string literal is a different composite term and never matches."""
    from searty_spark.index import lisp_term
    from searty_spark.wand import wand_topk

    seg = _lisp_segments(spark, sf)
    n_docs = _docs(spark, sf).count()
    # every fixture doc lexes to exactly 10 tokens -> avgdl == 10
    return wand_topk(
        seg, None, "", k=K_BM25, n_docs=n_docs, avgdl=10.0, n_shards=4,
        terms=[lisp_term("SYMBOL", "s" + SYMBOL)],
    )


def q_dedup_exact(spark, sf):
    return dedup.exact_dup_groups(_docs(spark, sf))


def q_jaccard_pairs(spark, sf):
    return dedup.jaccard_pairs(_docs(spark, sf), threshold=JACC_T)


def q_minhash_pairs(spark, sf):
    return dedup.minhash_lsh_pairs(_docs(spark, sf), threshold=JACC_T)


def q_simhash_pairs(spark, sf):
    return dedup.simhash_pairs(_docs(spark, sf), max_hamming=8)


def q_dedup_clusters(spark, sf):
    """Near-dup clusters: connected components over the LSH-verified
    pair graph (iterative min-label propagation in Spark; recursive
    CTE in the oracle)."""
    return dedup.dup_clusters(_docs(spark, sf), threshold=JACC_T)


def q_clean_corpus(spark, sf):
    """End-to-end corpus cleaning: quality gate -> exact dedup ->
    near-dup cluster dedup (keep cluster minimum)."""
    from searty_spark.pipeline import clean_corpus

    return clean_corpus(_docs(spark, sf))


REGEX_Q = "spark (join|table)"


def q_regex_search(spark, sf):
    """Trigram-accelerated regex search (the Cox codesearch shape over
    this engine's trigram postings): required-literal extraction ->
    trigram conjunction candidates -> exact regex verify."""
    from searty_spark.query import regex_search

    docs = _docs(spark, sf)
    return regex_search(docs, build_postings(docs), REGEX_Q)


def q_regex_search_seg(spark, sf):
    """Index-accelerated twin of regex_search: candidates from the
    compressed segments, same oracle."""
    from searty_spark.query import regex_search_segments

    return regex_search_segments(_docs(spark, sf), _segments(spark, sf), REGEX_Q)


def q_sample_stratified(spark, sf):
    """Fixed-size per-language sample (training-mix balancing):
    deterministic lowest-md5(text) per stratum — same rows at any
    partitioning/engine/cluster size."""
    from searty_spark.pipeline import sample_stratified

    return sample_stratified(_docs(spark, sf), n_per_stratum=50)


def q_normalize_text(spark, sf):
    return textops.normalize_text(_docs(spark, sf))


def q_top_terms_tfidf(spark, sf):
    """Per-doc top-3 keywords by tf-idf, engine-agnostic ranking key."""
    return textops.top_terms_tfidf(_docs(spark, sf), k=3)


def q_bm25_filtered(spark, sf):
    """Metadata-filtered ranking: BM25 top-k restricted to lang='en'
    docs, corpus-global idf (post-filter semantics)."""
    from searty_spark.query import bm25_topk_in

    docs = _docs(spark, sf)
    en = docs.filter(F.col("lang") == "en").select("doc_id")
    return bm25_topk_in(build_postings(docs), doc_stats(docs), Q_BM25_COMMON, en, k=K_BM25)


def q_sample_corpus(spark, sf):
    """Deterministic content-hash 10% sample — reproducible training
    subsets independent of partitioning/engine."""
    from searty_spark.pipeline import sample_corpus

    return sample_corpus(_docs(spark, sf), pct=10)


def q_token_count(spark, sf):
    return textops.token_count(_docs(spark, sf))


def q_quality_score(spark, sf):
    return textops.quality_score(_docs(spark, sf))


def _pii_docs(spark, sf):
    """documents with a deterministic machine-formatted PII suffix
    appended (email / URL / IPv4 / phone derived from doc_id) — the
    synthetic corpus carries no PII, so the redaction gate builds the
    SAME augmented text in both engines and scrubs it."""
    d = _docs(spark, sf)
    did = F.col("doc_id").cast("string")
    return d.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" mail user"), did, F.lit("@ex.com see https://ex"), did,
            F.lit(".com/a ip 10.1.2."), (F.col("doc_id") % 250).cast("string"),
            F.lit(" call +12 3456-78"), (F.col("doc_id") % 90).cast("string"),
        ),
    )


def q_redact_pii(spark, sf):
    """Training-data PII scrub: URLs/emails/IPv4s/phones replaced by
    typed placeholders, match count emitted; one JVM regexp projection
    (oracle replays the identical pattern list in the identical
    order — patterns are RE2-and-Java-compatible by construction)."""
    return textops.redact_pii(_pii_docs(spark, sf))


def q_ngram_contamination(spark, sf):
    """Benchmark decontamination (GPT-3/Dolma shape): flag training
    docs sharing any word 5-gram with the benchmark set (deterministic
    stand-in: docs with doc_id % 97 == 0). Broadcast benchmark grams,
    one explode + uniform doc_id agg."""
    d = _docs(spark, sf)
    return textops.ngram_contamination(d, d.filter(F.col("doc_id") % 97 == 0), n=5)


def q_prepare_training_corpus(spark, sf):
    """The full preparation composite (pipeline.prepare_training_corpus):
    gopher gate -> benchmark decontamination -> PII redaction -> exact
    dedup on the redacted text, over the deterministically PII-augmented
    corpus. Stage order is the contract; the oracle replays it."""
    from searty_spark.pipeline import prepare_training_corpus

    d = _pii_docs(spark, sf)
    return prepare_training_corpus(d, bench=d.filter(F.col("doc_id") % 97 == 0))


def q_quality_gopher(spark, sf):
    """Gopher/CCNet doc-length-conditioned quality dimensions + the
    composite pass flag; every threshold compares the ROUNDED ratio so
    the decision is engine-agnostic (oracle replays the full rule set,
    including the exploded top-word repetition share)."""
    return textops.quality_gopher(_docs(spark, sf))


def q_clean_corpus_gopher(spark, sf):
    """clean_corpus with the Gopher-rule stage-1 gate — the composed
    pipeline a production cleaning job runs; same downstream exact +
    near-dup stages, oracle replays the whole composition."""
    from searty_spark.pipeline import clean_corpus

    return clean_corpus(_docs(spark, sf), quality="gopher")


def q_doc_fingerprint(spark, sf):
    return textops.doc_fingerprint(_docs(spark, sf))


def q_lang_stats(spark, sf):
    return textops.lang_stats(_docs(spark, sf))


def q_token_count_bpe(spark, sf):
    return textops.token_count_bpe(_docs(spark, sf))


def q_lang_id(spark, sf):
    return textops.lang_id(_docs(spark, sf))


def q_ngram_counts(spark, sf):
    """Corpus-level bigram LM counts (non-distinct occurrences)."""
    return textops.ngram_counts(_docs(spark, sf), n=2, min_count=2)


def q_embedding_topk(spark, sf):
    return ann.cosine_topk(_emb(spark, sf), query_vec_id=0, k=K_BM25)


def q_embedding_dup_pairs(spark, sf):
    return ann.cosine_dup_pairs(_emb(spark, sf), threshold=0.45)


def q_embedding_dup_pairs_lsh(spark, sf):
    """Scale path of embedding_dup_pairs: sign-LSH band join + exact
    verify; gated against the SAME all-pairs oracle, so band recall is
    part of the gate. The gate's 0.45 threshold has NO margin over the
    background similarity (the adversarial case for LSH), so the
    correct configuration is more bands: at n_bands=64 a boundary pair
    (cos = 0.45, per-band collision 0.177) misses all bands with
    probability (1 - 0.177)^64 ~= 4e-6, vs 4.4% at the 16-band default
    (which at sf0.1 statistically missed 3 of 144 true pairs). Compute
    scales linearly with bands — the knob a production near-dup run at
    cos >= 0.9 turns the other way (16 bands give ~1 - 2e-13 recall
    there; see ann.lsh_band_keys)."""
    return ann.cosine_dup_pairs_lsh(
        _emb(spark, sf), threshold=0.45, dim=64, n_bands=64
    )


def q_ivf_topk_trained(spark, sf):
    """The production IVF shape: deterministic sample k-means codebook
    (ivf_train) + distributed assignment + n_probe cell search. All
    assignment/probe decisions compare similarities rounded to 6
    decimals (ties -> lowest cell), which is what lets an independent
    DuckDB implementation of the same k-means reach identical cells —
    the oracle replays the full training loop in SQL."""
    emb = _emb(spark, sf)
    cents = ann.ivf_train(emb, n_cells=IVF_CELLS, n_iter=IVF_ITER, sample=IVF_SAMPLE)
    return ann.ivf_topk_trained(emb, query_vec_id=0, cents=cents, k=10, n_probe=IVF_PROBE)


def q_pq_topk(spark, sf):
    """IVF/PQ family, the compression half: product-quantization ADC
    top-k with exact re-rank — codebooks trained on a bounded sample,
    every quantization decision on round(d^2, 6), so the DuckDB oracle
    replays the full train/encode/ADC pipeline (8 subspace k-means) and
    reaches the identical candidate set."""
    emb = _emb(spark, sf)
    books = ann.pq_train(emb, m=PQ_M, k=PQ_K, n_iter=2, sample=IVF_SAMPLE)
    return ann.pq_topk(emb, query_vec_id=0, books=books, k=10, refine=PQ_REFINE)


def q_pq_topk_m16(spark, sf):
    """The adversarial-recall PQ configuration: m=16 subspaces (16
    one-byte codes per vector instead of 8). The round-6.1 strided
    sweep showed m is the lever that moves recall on near-uniform
    data (0.94 vs 0.74 recall@10 at refine=200, BENCH/pq_recall.json)
    — so the m=16 path gets its own gate: same train/encode/ADC
    pipeline, oracle generated with 16 subspace k-means chains."""
    emb = _emb(spark, sf)
    books = ann.pq_train(emb, m=16, k=PQ_K, n_iter=2, sample=IVF_SAMPLE)
    return ann.pq_topk(emb, query_vec_id=0, books=books, k=10, refine=PQ_REFINE)


def q_substring_spans(spark, sf):
    """Exact substring-level dedup, span report (Lee et al. 2022):
    maximal 1-based token ranges covered by 10-token windows whose
    exact text occurs >= 2 times corpus-wide, overlapping/adjacent
    windows coalesced per doc. One window-text groupBy (partial-agg
    collapses hot template windows pre-shuffle) + occurrence-mark
    join + per-doc interval merge."""
    return dedup.dup_spans(_docs(spark, sf), k=10, min_count=2)


def q_substring_dedup(spark, sf):
    """Document-level filter over substring_dup_stats: survivors with
    duplicated-span coverage <= 20% of their tokens, with the stats
    columns (n_tokens, dup_tokens, dup_frac) that justify the
    decision. Clean docs (dup_tokens 0) survive via the left join."""
    return dedup.substring_dedup(_docs(spark, sf), k=10, min_count=2, max_dup_frac=0.2)


def q_lm_doc_scores(spark, sf):
    """CCNet-style LM quality signal without an external model: each
    doc's mean log-probability of its word bigrams under the corpus's
    own Laplace-smoothed bigram model, P(w2|w1) = (c2+1)/(c1+V).
    Low scorers are the perplexity-filter drop set. Oracle replays
    the counts, V and the smoothed mean in SQL."""
    return textops.lm_score(_docs(spark, sf))


def q_excise_duplicates(spark, sf):
    """The Lee et al. 2022 output transform: every duplicated
    10-token window keeps its corpus-wide first occurrence (argmin
    over the total (doc_id, pos) order — deterministic, which is what
    makes the oracle replayable) and every other occurrence's token
    range is excised; clean docs pass through so clean_text is a
    drop-in column for the next stage."""
    return dedup.excise_duplicates(_docs(spark, sf), k=10, min_count=2)


def q_ivf_pq_topk(spark, sf):
    """The composed FAISS architecture end-to-end: trained coarse
    quantizer prunes to n_probe cells, RESIDUAL PQ codes (books trained
    on v - centroid[cell] — the real IVF-PQ shape, a recall win when
    the data clusters as real embeddings do; see BENCH/pq_recall.json,
    strided sampling) ADC-scan only those with the exact <q, centroid>
    anchor term, exact re-rank — every decision rounded, whole
    pipeline replayed by the oracle."""
    emb = _emb(spark, sf)
    cents = ann.ivf_train(emb, n_cells=IVF_CELLS, n_iter=IVF_ITER, sample=IVF_SAMPLE)
    books = ann.pq_train(emb, m=PQ_M, k=PQ_K, n_iter=2, sample=IVF_SAMPLE, cents=cents)
    return ann.ivf_pq_topk(
        emb, query_vec_id=0, cents=cents, books=books,
        k=10, n_probe=IVF_PROBE, refine=PQ_REFINE, residual=True,
    )


def _ann_index_dir(spark, sf, residual: bool = True) -> str:
    """Build (or reuse) the persisted ANN artifact for this sf_dir —
    the build-once/query-many shape: stored-path gates query parquet
    codes + JSON codebooks that round-tripped through disk.

    ``residual`` must mirror the gate's ORACLE scheme: codes are
    scheme-relative (CLAUDE.md), so a gate whose DuckDB twin replays
    flat PQ must query a flat artifact — cross-scheme "identity" via
    the refine re-rank holds only while both refine sets happen to
    contain the same top-k, and it measurably breaks at sf0.1."""
    import tempfile
    from pathlib import Path

    from searty_spark import ann_index

    import json

    tag = f"c{IVF_CELLS}i{IVF_ITER}m{PQ_M}k{PQ_K}" + ("" if residual else "flat")
    d = Path(tempfile.gettempdir()) / f"searty_ann_gate_{Path(sf).name}_{tag}"
    stats_p = d / "ann_stats.json"
    fresh = False
    if stats_p.exists():
        try:
            st = json.loads(stats_p.read_text())
            fresh = (
                st.get("format") == ann_index.ANN_FORMAT
                and st.get("residual") == residual
            )
        except ValueError:
            fresh = False  # truncated/corrupt leftover: rebuild, don't crash
    if not fresh:  # absent OR a stale-format leftover from a prior build
        ann_index.write_ann_index(
            _emb(spark, sf), str(d), n_cells=IVF_CELLS, n_iter=IVF_ITER,
            sample=IVF_SAMPLE, m=PQ_M, pq_k=PQ_K, residual=residual,
        )
    return str(d)


def q_pq_topk_stored(spark, sf):
    """pq_topk against the PERSISTED codes (ann_index.write_ann_index):
    the ADC scan reads m-byte (vec_id, codes) parquet rows — raw float
    vectors are touched only for the query vector and the refine-row
    exact re-rank. The oracle replays FLAT PQ, so the artifact stores
    flat codes (residual=False): books and codes are then the same
    pure function of the embeddings on both sides and the candidate
    cut is identical by construction at every scale factor."""
    from searty_spark import ann_index

    return ann_index.pq_topk_indexed(
        _emb(spark, sf), _ann_index_dir(spark, sf, residual=False), 0,
        k=10, refine=PQ_REFINE,
    )


def q_ivf_pq_topk_stored(spark, sf):
    """ivf_pq_topk against the persisted artifact: stored centroids pick
    probe cells driver-side, the cell filter prunes the hive-partitioned
    codes scan at file-listing time (PartitionFilters — plan-asserted in
    tests/test_ann.py), ADC + exact re-rank. Same oracle as ivf_pq_topk."""
    from searty_spark import ann_index

    return ann_index.ivf_pq_topk_indexed(
        _emb(spark, sf), _ann_index_dir(spark, sf), 0,
        k=10, n_probe=IVF_PROBE, refine=PQ_REFINE,
    )


def q_ivf_assign(spark, sf):
    return ann.ivf_assign(_emb(spark, sf), n_cells=32)


def q_ivf_topk(spark, sf):
    return ann.ivf_topk(_emb(spark, sf), query_vec_id=0, k=10, n_cells=32, n_probe=4)


def q_revenue_by_nation(spark, sf):
    """Multi-way join + agg (customer x orders x lineitem x nation):
    the broadcast-dim / shuffle-fact join shape of the index build's
    dictionary join, exercised on relational tables."""
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    nation = spark.read.parquet(f"{sf}/nation.parquet")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
        .orderBy("n_name")
    )


def q_customers_without_orders(spark, sf):
    """Anti-join (NOT EXISTS): customers with no order above 400k."""
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    big = (
        spark.read.parquet(f"{sf}/orders.parquet")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_custkey")
    )
    return (
        cust.join(big, cust["c_custkey"] == big["o_custkey"], "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


def q_top_docs_per_lang(spark, sf):
    """Window top-k per group: 3 longest docs per language."""
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        _docs(spark, sf)
        .select("lang", "doc_id", "n_chars", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
        .orderBy("lang", "rnk")
    )


def q_lang_source_rollup(spark, sf):
    """ROLLUP aggregation over (lang, source) with grouping-set nulls."""
    return (
        _docs(spark, sf)
        .rollup("lang", "source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").cast("long").alias("sum_chars"))
        .select(
            F.coalesce("lang", F.lit("<all>")).alias("lang"),
            F.coalesce("source", F.lit("<all>")).alias("source"),
            "n_docs",
            "sum_chars",
        )
    )


def q_sessionize(spark, sf):
    return events.sessionize(_events(spark, sf), gap_minutes=30)


def q_sessionize_stream(spark, sf):
    """Stateful streaming sessionization (applyInPandasWithState)
    driven over a file-backed stream of the events table and drained
    synchronously; per-user running totals are monotone, so the final
    state is the max over the update-mode emissions. Gated against the
    SAME oracle SQL as the batch twin."""
    from searty_spark.streaming import read_event_stream, sessionize_stream

    _ensure_shipped(spark)
    ev = read_event_stream(spark, f"{sf}/events.parquet", max_files_per_trigger=1)
    upd = sessionize_stream(ev, gap_minutes=30)
    q = (
        upd.writeStream.outputMode("update")
        .format("memory")
        .queryName("gate_sessionize_stream")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.sql("SELECT * FROM gate_sessionize_stream")
        .groupBy("user_id")
        .agg(
            F.max("n_sessions").alias("n_sessions"),
            F.max("n_events").alias("n_events"),
        )
    )


def q_windowed_counts_stream(spark, sf):
    """Watermarked tumbling-window streaming counts over the same
    file-backed event stream, drained to completion — gated against the
    batch windowed_counts oracle SQL."""
    from searty_spark.streaming import (
        read_event_stream,
        run_stream_to_memory,
        windowed_counts_stream,
    )

    _ensure_shipped(spark)
    ev = read_event_stream(spark, f"{sf}/events.parquet")
    res = run_stream_to_memory(windowed_counts_stream(ev), "gate_windowed_stream")
    return res.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n",
        "sum_value",
    )


def q_windowed_counts(spark, sf):
    return events.windowed_counts(_events(spark, sf)).select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "n",
        "sum_value",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Ordered NEWEST/RISKIEST FIRST: the driver's correctness window
    covers the first 50 entries, so new round work and the
    hardest-to-hold invariants (streaming twins, stored-ANN artifact
    paths, segment kernels) sit inside it; the tail past 50 holds only
    gates green since rounds 1-2 whose shapes are exercised elsewhere
    in the window (simple single-statement gates plus the symbol
    broadcast-join lookups). Each round's additions displace the
    least-risky window entries — documented per round in
    BENCH/BASELINE.md's gate census; the full 68 stay covered by
    scripts/check_correctness.py."""
    return {
        # --- round-6 additions (displace ngram_counts, quality_score,
        # doc_fingerprint and symbol_defs past the window, same policy
        # as round 5's displacement; all 68 stay covered by
        # scripts/check_correctness.py) ---
        "substring_spans": q_substring_spans,
        "substring_dedup": q_substring_dedup,
        "excise_duplicates": q_excise_duplicates,
        "lm_doc_scores": q_lm_doc_scores,
        "pq_topk_m16": q_pq_topk_m16,
        # --- round-5 additions ---
        "prepare_training_corpus": q_prepare_training_corpus,
        "redact_pii": q_redact_pii,
        "ngram_contamination": q_ngram_contamination,
        # --- round-4 additions ---
        "pq_topk_stored": q_pq_topk_stored,
        "ivf_pq_topk_stored": q_ivf_pq_topk_stored,
        "quality_gopher": q_quality_gopher,
        "clean_corpus_gopher": q_clean_corpus_gopher,
        # --- streaming + round-2/3 entries that sat past the window ---
        "sessionize_stream": q_sessionize_stream,
        "windowed_counts_stream": q_windowed_counts_stream,
        "top_docs_per_lang": q_top_docs_per_lang,
        "lang_source_rollup": q_lang_source_rollup,
        "sessionize": q_sessionize,
        "windowed_counts": q_windowed_counts,
        # --- segment/compressed-index kernels ---
        "bm25_topk_wand": q_bm25_wand,
        "phrase_bm25_seg": q_phrase_bm25_seg,
        "phrase_ranges_seg": q_phrase_ranges_seg,
        "regex_search": q_regex_search,
        "regex_search_seg": q_regex_search_seg,
        "lisp_index_symbols": q_lisp_index_symbols,
        "lisp_symbol_bm25": q_lisp_symbol_bm25,
        # --- ANN stack ---
        "ivf_pq_topk": q_ivf_pq_topk,
        "pq_topk": q_pq_topk,
        "ivf_topk_trained": q_ivf_topk_trained,
        "ivf_topk": q_ivf_topk,
        "ivf_assign": q_ivf_assign,
        "embedding_dup_pairs_lsh": q_embedding_dup_pairs_lsh,
        "embedding_dup_pairs": q_embedding_dup_pairs,
        "embedding_topk": q_embedding_topk,
        # --- dedup / pipeline ---
        "dedup_clusters": q_dedup_clusters,
        "clean_corpus": q_clean_corpus,
        "minhash_pairs": q_minhash_pairs,
        "simhash_pairs": q_simhash_pairs,
        "jaccard_pairs": q_jaccard_pairs,
        "dedup_exact": q_dedup_exact,
        # --- query engine (DataFrame path) ---
        "phrase_bm25": q_phrase_bm25,
        "phrase_search": q_phrase_search,
        "phrase_ranges": q_phrase_ranges,
        "bm25_topk_common": q_bm25_common,
        "bm25_topk_multi": q_bm25_multi,
        "bm25_topk_filtered": q_bm25_filtered,
        # --- sampling / text analysis ---
        "sample_corpus": q_sample_corpus,
        "sample_stratified": q_sample_stratified,
        "top_terms_tfidf": q_top_terms_tfidf,
        "token_count_bpe": q_token_count_bpe,
        "lang_id": q_lang_id,
        "ngram_counts": q_ngram_counts,
        "quality_score": q_quality_score,
        "doc_fingerprint": q_doc_fingerprint,
        # --- symbol sidecar + relational ---
        "symbol_defs": q_symbol_defs,
        "symbol_defs_bare": q_symbol_defs_bare,
        "package_defs": q_package_defs,
        "revenue_by_nation": q_revenue_by_nation,
        "customers_without_orders": q_customers_without_orders,
        # ---- driver window boundary (position 50) ----
        # trivial single-expression gates, green since round 1:
        "term_stats": q_term_stats,
        "postings_check": q_postings_check,
        "doc_stats": q_doc_stats,
        "term_df_hist": q_term_df_hist,
        "dictionary": q_dictionary,
        "symbol_lookup": q_symbol_lookup,
        "filename_search": q_filename_search,
        "token_count": q_token_count,
        "lang_stats": q_lang_stats,
        "normalize_text": q_normalize_text,
    }


# ------------------------------------------------------------- oracle SQL

_TOK = (
    "SELECT doc_id, substring(text, i, 3) AS term, i - 1 AS pos "
    "FROM (SELECT doc_id, text, unnest(generate_series(1, greatest(length(text) - 2, 0))) AS i "
    "FROM documents) u"
)

_SHINGLES = (
    "t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents), "
    "sxp AS (SELECT doc_id, toks, unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i FROM t), "
    "sh AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle FROM sxp)"
)


def _symbol_defs_sql(symbol: str, pkg: str | None) -> str:
    """DuckDB twin of symbols.search_definitions: the deterministic
    definition-site analyzer (p % 5 == 0, symbol = next token,
    package = upper(lang), specifier by token length) followed by the
    name[/package] filter."""
    name = symbol.upper().replace("'", "''")
    pkg_pred = f" AND package_name = '{pkg.upper()}'" if pkg else ""
    return f"""
WITH t AS (SELECT doc_id, lang, source, string_split(text,' ') AS toks FROM documents),
s AS (SELECT doc_id, lang, source, toks,
             unnest(generate_series(0, len(toks)-2)) AS p
      FROM t WHERE len(toks) >= 2),
d AS (SELECT doc_id, source, cast(p AS bigint) AS position,
             upper(toks[p+2]) AS symbol_name, upper(lang) AS package_name,
             ['DEFUN','DEFMACRO','DEFVAR'][length(toks[p+2]) % 3 + 1] AS specifier
      FROM s WHERE p % 5 = 0)
SELECT doc_id, source, position, specifier, symbol_name, package_name
FROM d WHERE symbol_name = '{name}'{pkg_pred}
"""


def _components_sql(base_cte: str, threshold: float) -> str:
    """Recursive-CTE connected components over exact-Jaccard pairs of
    the docs produced by ``base_cte`` (which must define b(doc_id,
    toks)). Matches dedup.connected_components over the LSH-verified
    pairs because LSH recall is 1.0 on the test corpora (the gate
    checks that recall transitively)."""
    return f"""
WITH RECURSIVE
{base_cte},
sxp AS (SELECT doc_id, toks, unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i FROM b),
sh AS (SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle FROM sxp),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b2.doc_id AS doc_b, count(*) AS nc
  FROM sh a JOIN sh b2 ON a.shingle = b2.shingle AND a.doc_id < b2.doc_id
  GROUP BY 1, 2),
p AS (SELECT doc_a, doc_b FROM inter
      JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
      WHERE round(nc / (sa.n + sb.n - nc), 6) >= {threshold}),
e AS (SELECT doc_a AS s, doc_b AS d FROM p UNION ALL SELECT doc_b, doc_a FROM p),
nodes AS (SELECT DISTINCT s AS node FROM e),
reach AS (
  SELECT node, node AS lbl FROM nodes
  UNION
  SELECT e.d AS node, reach.lbl FROM reach JOIN e ON e.s = reach.node),
comp AS (SELECT node, cast(min(lbl) AS bigint) AS cluster_id FROM reach GROUP BY node)
"""


def _simhash_sql(max_hamming: int = 8) -> str:
    """DuckDB twin of dedup.simhash_pairs — replicates the md5-based
    64-bit fingerprint bit-for-bit (weights per bit over word
    3-shingles, whole-text fallback for short docs), the 4x16-bit band
    candidate join, and the popcount Hamming verification."""
    w_exprs = ", ".join(
        f"sum(CASE WHEN ((strpos('0123456789abcdef', substr(h,{16 - b // 4},1)) - 1)"
        f" // {2 ** (b % 4)}) % 2 = 1 THEN 1 ELSE -1 END) AS w{b}"
        for b in range(64)
    )
    fp_expr = " + ".join(
        f"CASE WHEN w{b} > 0 THEN {2 ** b}::UBIGINT ELSE 0::UBIGINT END" for b in range(64)
    )
    keys = ", ".join(f"(fp >> {i * 16}) & 65535::UBIGINT" for i in range(4))
    return f"""
WITH t AS (SELECT doc_id, string_split(text,' ') AS toks, text FROM documents),
sxp AS (SELECT doc_id, toks, unnest(generate_series(1, greatest(len(toks)-2,0))) AS i FROM t),
sh0 AS (SELECT DISTINCT doc_id, toks[i]||' '||toks[i+1]||' '||toks[i+2] AS shingle FROM sxp),
sh AS (SELECT * FROM sh0 UNION ALL SELECT doc_id, text FROM t WHERE len(toks) < 3),
hx AS (SELECT doc_id, substr(md5(shingle),1,16) AS h FROM sh),
w AS (SELECT doc_id, {w_exprs} FROM hx GROUP BY doc_id),
fp AS (SELECT doc_id, ({fp_expr}) AS fp FROM w),
bands AS (SELECT doc_id, fp, unnest([0,1,2,3]) AS band, unnest([{keys}]) AS key FROM fp)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       cast(bit_count(xor(a.fp, b.fp)) AS bigint) AS hamming
FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.fp, b.fp)) <= {max_hamming}
"""


def _ivf_trained_sql(
    qid: int = 0,
    k: int = 10,
    n_cells: int = IVF_CELLS,
    n_iter: int = IVF_ITER,
    sample: int = IVF_SAMPLE,
    n_probe: int = IVF_PROBE,
    dim: int = 64,
) -> str:
    """DuckDB twin of ann.ivf_train + ann.ivf_topk_trained: replays the
    deterministic sample k-means (init = first n_cells of the lowest
    ``sample`` vec_ids, ``n_iter`` unrolled assign/update rounds, empty
    or zero-norm cells keep their previous centroid) and the
    probe-and-rescore query. Every argmax/probe compares round(sim, 6)
    with ties to the lowest cell — exactly the engine-agnostic decision
    rule the numpy side uses, so both reach identical cells even though
    they sum dot products in different orders."""
    unit = (
        "CASE WHEN sqrt(list_dot_product({x}, {x})) > 0 "
        "THEN list_transform({x}, e -> e / sqrt(list_dot_product({x}, {x}))) "
        "ELSE {x} END"
    )
    ctes = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"n AS (SELECT vec_id, {unit.format(x='v')} AS v FROM e)",
        f"s AS (SELECT vec_id, v FROM n ORDER BY vec_id LIMIT {sample})",
        f"sv AS (SELECT vec_id, i AS dim, v[i] AS val FROM s CROSS JOIN generate_series(1, {dim}) AS t(i))",
        f"c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cv "
        f"FROM (SELECT vec_id, v FROM s ORDER BY vec_id LIMIT {n_cells}))",
    ]
    for it in range(1, n_iter + 1):
        prev = f"c{it - 1}"
        ctes += [
            f"a{it} AS (SELECT vec_id, cell FROM ("
            f"SELECT s.vec_id, c.cell, row_number() OVER (PARTITION BY s.vec_id "
            f"ORDER BY round(list_dot_product(s.v, c.cv), 6) DESC, c.cell) AS rn "
            f"FROM s CROSS JOIN {prev} c) WHERE rn = 1)",
            f"m{it} AS (SELECT a.cell, sv.dim, avg(sv.val) AS mval "
            f"FROM a{it} a JOIN sv ON sv.vec_id = a.vec_id GROUP BY 1, 2)",
            f"mc{it} AS (SELECT cell, list(mval ORDER BY dim) AS mv FROM m{it} GROUP BY cell)",
            f"c{it} AS (SELECT c.cell, CASE WHEN mc.cell IS NOT NULL "
            f"AND sqrt(list_dot_product(mc.mv, mc.mv)) > 0 "
            f"THEN list_transform(mc.mv, e -> e / sqrt(list_dot_product(mc.mv, mc.mv))) "
            f"ELSE c.cv END AS cv FROM {prev} c LEFT JOIN mc{it} mc USING (cell))",
        ]
    cf = f"c{n_iter}"
    ctes += [
        "assign AS (SELECT vec_id, cell FROM ("
        "SELECT n.vec_id, c.cell, row_number() OVER (PARTITION BY n.vec_id "
        f"ORDER BY round(list_dot_product(n.v, c.cv), 6) DESC, c.cell) AS rn "
        f"FROM n CROSS JOIN {cf} c) WHERE rn = 1)",
        f"qn AS (SELECT v AS qv FROM n WHERE vec_id = {qid})",
        f"probe AS (SELECT cell FROM {cf} c CROSS JOIN qn "
        f"ORDER BY round(list_dot_product(c.cv, qn.qv), 6) DESC, c.cell LIMIT {n_probe})",
        f"cand AS (SELECT e.vec_id, e.v FROM e JOIN assign USING (vec_id) "
        f"WHERE assign.cell IN (SELECT cell FROM probe) AND e.vec_id != {qid})",
        f"qr AS (SELECT v AS qv FROM e WHERE vec_id = {qid})",
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT vec_id, round(list_dot_product(v, qv) / "
        "(sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos\n"
        f"FROM cand CROSS JOIN qr ORDER BY cos DESC, vec_id LIMIT {k}"
    )


def _phrase_bm25_sql(q: str, k: int) -> str:
    """Composed oracle for the ranked-phrase queries: exact substring
    occurrence counts joined with the BM25 score over the phrase's
    trigrams (global df), ranked (round(score,6) DESC, doc_id)."""
    ln = len(q)
    lit = q.replace("'", "''")
    terms = sorted(set(tokenize(q)))
    tlist = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
WITH m AS (
  SELECT doc_id, cast(count(*) AS bigint) AS n_matches
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, greatest(length(text) - {ln} + 1, 0))) AS i
        FROM documents) u
  WHERE substring(text, i, {ln}) = '{lit}' GROUP BY doc_id),
tok AS ({_TOK}),
p AS (SELECT term, doc_id, count(*) AS tf FROM tok WHERE term IN ({tlist}) GROUP BY 1, 2),
dl AS (SELECT doc_id, greatest(length(text) - 2, 0) AS doc_len FROM documents),
c AS (SELECT count(*) AS n_docs, avg(greatest(length(text) - 2, 0)) AS avgdl FROM documents),
dfq AS (SELECT term, count(*) AS df FROM p GROUP BY 1),
s AS (
  SELECT p.doc_id,
         sum( ln((c.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
              * p.tf * 2.2
              / (p.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / c.avgdl)) ) AS raw
  FROM p JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN c
  GROUP BY 1)
SELECT s.doc_id, round(raw, 6) AS score, m.n_matches
FROM s JOIN m USING (doc_id)
ORDER BY round(raw, 6) DESC, s.doc_id LIMIT {k}
"""


_LISP_W = """
t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
w AS (SELECT doc_id,
  's' || regexp_replace(coalesce(toks[1], ''), '[^a-z0-9]', '', 'g') AS w0,
  's' || regexp_replace(coalesce(toks[2], ''), '[^a-z0-9]', '', 'g') AS w1,
  's' || regexp_replace(coalesce(toks[3], ''), '[^a-z0-9]', '', 'g') AS w2,
  's' || regexp_replace(coalesce(toks[5], ''), '[^a-z0-9]', '', 'g') AS w4
FROM t),
sym AS (
  SELECT doc_id, 'defun' AS s FROM w
  UNION ALL SELECT doc_id, w0 FROM w
  UNION ALL SELECT doc_id, w1 FROM w
  UNION ALL SELECT doc_id, w2 FROM w
  UNION ALL SELECT doc_id, w4 FROM w)
"""


def _lisp_symbols_sql() -> str:
    """Oracle for lisp_index_symbols: replay the fixture generation
    rule (the Spark side runs the real scanner + encoder; this side
    computes what that scanner must emit by construction)."""
    return f"""
WITH {_LISP_W}
SELECT s AS symbol, cast(count(DISTINCT doc_id) AS bigint) AS df,
       cast(count(*) AS bigint) AS cf
FROM sym GROUP BY s
"""


def _lisp_bm25_sql(symbol: str, k: int) -> str:
    """BM25 over SYMBOL-kind occurrences only; every fixture doc has
    exactly 10 tokens so dl == avgdl and the length norm is 1."""
    return f"""
WITH {_LISP_W},
p AS (SELECT doc_id, count(*) AS tf FROM sym WHERE s = '{symbol}' GROUP BY 1),
c AS (SELECT count(*) AS n_docs FROM documents),
dfq AS (SELECT count(*) AS df FROM p)
SELECT doc_id,
       round( ln((c.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
              * tf * 2.2 / (tf + 1.2), 6) AS score
FROM p CROSS JOIN c CROSS JOIN dfq
ORDER BY 2 DESC, doc_id LIMIT {k}
"""


def _bm25_sql(query: str, k: int) -> str:
    terms = sorted(set(tokenize(query)))
    tlist = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
WITH tok AS ({_TOK}),
p AS (SELECT term, doc_id, count(*) AS tf FROM tok WHERE term IN ({tlist}) GROUP BY 1, 2),
dl AS (SELECT doc_id, greatest(length(text) - 2, 0) AS doc_len FROM documents),
c AS (SELECT count(*) AS n_docs, avg(greatest(length(text) - 2, 0)) AS avgdl FROM documents),
dfq AS (SELECT term, count(*) AS df FROM p GROUP BY 1),
s AS (
  SELECT p.doc_id,
         sum( ln((c.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
              * p.tf * 2.2
              / (p.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / c.avgdl)) ) AS raw
  FROM p JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN c
  GROUP BY 1)
SELECT doc_id, round(raw, 6) AS score FROM s
ORDER BY round(raw, 6) DESC, doc_id LIMIT {k}
"""


def _pq_topk_sql(
    qid: int = 0,
    k: int = 10,
    m: int = PQ_M,
    kc: int = PQ_K,
    n_iter: int = 2,
    sample: int = IVF_SAMPLE,
    refine: int = PQ_REFINE,
    dim: int = 64,
    enc_src: str = "n",
    with_base: bool = False,
) -> str:
    """DuckDB twin of ann.pq_train + pq_encode + pq_topk: replays the m
    independent subspace k-means (L2 in the algebraic form
    ||x||^2 - 2x.c + ||c||^2, decisions on round(d2, 6) with ties to
    the lowest code, plain-mean updates, empty cells keep previous),
    the full-corpus encoding, the ADC table lookup, the
    (round(approx,6) DESC, vec_id) candidate cut, and the exact
    re-rank.

    ``enc_src`` names the CTE whose vectors are trained on and encoded
    (``n`` = the normalized corpus; the residual IVF-PQ splice passes
    ``resid``). The ADC query table always comes from the unit query in
    ``n``. ``with_base=True`` adds the residual anchor: approx =
    round(basec.base + sum tv, 6), with ``basec`` (vec_id, base)
    supplied by the surrounding query (_ivf_pq_sql defines it as
    <q, centroid[cell]>)."""
    dsub = dim // m
    unit = (
        "CASE WHEN sqrt(list_dot_product({x}, {x})) > 0 "
        "THEN list_transform({x}, e -> e / sqrt(list_dot_product({x}, {x}))) "
        "ELSE {x} END"
    )
    d2 = (
        "round(list_dot_product({x}, {x}) - 2 * list_dot_product({x}, {c}) "
        "+ list_dot_product({c}, {c}), 6)"
    )
    ctes = [
        "e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)",
        f"n AS (SELECT vec_id, {unit.format(x='v')} AS v FROM e)",
        f"ps AS (SELECT vec_id, v FROM {enc_src} ORDER BY vec_id LIMIT {sample})",
    ]
    code_units, tbl_units = [], []
    for j in range(m):
        lo, hi = j * dsub + 1, (j + 1) * dsub
        ctes += [
            f"sb{j} AS (SELECT vec_id, v[{lo}:{hi}] AS x FROM ps)",
            f"sv{j} AS (SELECT vec_id, i AS dim, x[i] AS val "
            f"FROM sb{j} CROSS JOIN generate_series(1, {dsub}) AS t(i))",
            f"c{j}_0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, "
            f"x AS cv FROM (SELECT vec_id, x FROM sb{j} ORDER BY vec_id LIMIT {kc}))",
        ]
        for it in range(1, n_iter + 1):
            prev = f"c{j}_{it - 1}"
            ctes += [
                f"a{j}_{it} AS (SELECT vec_id, cell FROM ("
                f"SELECT sb.vec_id, c.cell, row_number() OVER (PARTITION BY sb.vec_id "
                f"ORDER BY {d2.format(x='sb.x', c='c.cv')} ASC, c.cell) AS rn "
                f"FROM sb{j} sb CROSS JOIN {prev} c) WHERE rn = 1)",
                f"m{j}_{it} AS (SELECT a.cell, sv.dim, avg(sv.val) AS mval "
                f"FROM a{j}_{it} a JOIN sv{j} sv USING (vec_id) GROUP BY 1, 2)",
                f"mc{j}_{it} AS (SELECT cell, list(mval ORDER BY dim) AS mv "
                f"FROM m{j}_{it} GROUP BY cell)",
                f"c{j}_{it} AS (SELECT c.cell, CASE WHEN mc.cell IS NOT NULL "
                f"THEN mc.mv ELSE c.cv END AS cv "
                f"FROM {prev} c LEFT JOIN mc{j}_{it} mc USING (cell))",
            ]
        cf = f"c{j}_{n_iter}"
        ctes += [
            f"nb{j} AS (SELECT vec_id, v[{lo}:{hi}] AS x FROM {enc_src})",
            f"enc{j} AS (SELECT vec_id, cell AS code FROM ("
            f"SELECT nb.vec_id, c.cell, row_number() OVER (PARTITION BY nb.vec_id "
            f"ORDER BY {d2.format(x='nb.x', c='c.cv')} ASC, c.cell) AS rn "
            f"FROM nb{j} nb CROSS JOIN {cf} c) WHERE rn = 1)",
            f"qs{j} AS (SELECT v[{lo}:{hi}] AS x FROM n WHERE vec_id = {qid})",
            f"t{j} AS (SELECT c.cell, list_dot_product(qs.x, c.cv) AS tv "
            f"FROM {cf} c CROSS JOIN qs{j} qs)",
        ]
        code_units.append(f"SELECT vec_id, {j} AS j, code FROM enc{j}")
        tbl_units.append(f"SELECT {j} AS j, cell, tv FROM t{j}")
    if with_base:
        approx = (
            "adcsum AS (SELECT vec_id, sum(tt.tv) AS tsum "
            "FROM codes JOIN tt ON tt.j = codes.j AND tt.cell = codes.code "
            "GROUP BY vec_id),\n"
            "approx AS (SELECT a.vec_id, round(b.base + a.tsum, 6) AS approx "
            "FROM adcsum a JOIN basec b USING (vec_id))"
        )
    else:
        approx = (
            "approx AS (SELECT vec_id, round(sum(tt.tv), 6) AS approx "
            "FROM codes JOIN tt ON tt.j = codes.j AND tt.cell = codes.code "
            "GROUP BY vec_id)"
        )
    ctes += [
        "codes AS (" + " UNION ALL ".join(code_units) + ")",
        "tt AS (" + " UNION ALL ".join(tbl_units) + ")",
        approx,
        f"cand AS (SELECT vec_id FROM approx WHERE vec_id != {qid} "
        f"ORDER BY approx DESC, vec_id LIMIT {refine})",
        f"qr AS (SELECT v AS qv FROM e WHERE vec_id = {qid})",
    ]
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT vec_id, round(list_dot_product(v, qv) / "
        "(sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))), 6) AS cos\n"
        f"FROM e JOIN cand USING (vec_id) CROSS JOIN qr "
        f"ORDER BY cos DESC, vec_id LIMIT {k}"
    )


def _ivf_pq_sql(
    qid: int = 0,
    k: int = 10,
    n_cells: int = IVF_CELLS,
    n_probe: int = IVF_PROBE,
    m: int = PQ_M,
    kc: int = PQ_K,
    n_iter: int = 2,
    sample: int = IVF_SAMPLE,
    refine: int = PQ_REFINE,
    dim: int = 64,
) -> str:
    """DuckDB twin of ann.ivf_pq_topk — the composed FAISS shape with
    RESIDUAL codes: the trained-IVF chain produces the assignment and
    the probed-cell vector set; the PQ chain trains on and encodes
    r = v - centroid[cell] (the ``resid`` CTE) restricted to the probed
    set; the ADC estimate anchors on basec = <q, centroid[cell]>
    exactly (round(base + sum tv, 6) — the same single rounding the
    pandas kernel applies); exact re-rank last. Both chains reuse the
    rounded decision rules their standalone oracles validate."""
    ivf = _ivf_trained_sql(qid, k, n_cells, n_iter, sample, n_probe, dim)
    pq = _pq_topk_sql(
        qid, k, m, kc, n_iter, sample, refine, dim,
        enc_src="resid", with_base=True,
    )
    # splice: IVF CTEs up to `probe`, then the residual space, then the
    # PQ chain over it
    ivf_ctes = ivf.split("WITH ", 1)[1].rsplit(",\nqr AS", 1)[0]
    ivf_ctes = ivf_ctes.rsplit(",\ncand AS", 1)[0]  # drop IVF's own cand
    cf = f"c{n_iter}"  # the trained IVF codebook CTE
    resid = (
        f"resid AS (SELECT n.vec_id, list_transform(generate_series(1, {dim}), "
        f"i -> n.v[i] - c.cv[i]) AS v "
        f"FROM n JOIN assign USING (vec_id) JOIN {cf} c ON c.cell = assign.cell)"
    )
    basec = (
        f"basec AS (SELECT a.vec_id, list_dot_product(qn.qv, c.cv) AS base "
        f"FROM assign a JOIN {cf} c USING (cell) CROSS JOIN qn)"
    )
    probed = (
        "probedvecs AS (SELECT vec_id FROM assign "
        "WHERE cell IN (SELECT cell FROM probe))"
    )
    pq_body = pq.split("WITH ", 1)[1]
    # PQ re-defines e/n identically — drop its copies, keep from its
    # sample CTE (ps) on
    pq_body = pq_body.split("ps AS", 1)[1]
    pq_ctes_and_final = "ps AS" + pq_body
    # restrict every enc{j} scan to the probed set
    for j in range(m):
        marker = f"FROM nb{j} nb CROSS JOIN"
        assert pq_ctes_and_final.count(marker) == 1
        pq_ctes_and_final = pq_ctes_and_final.replace(
            marker,
            f"FROM (SELECT nb0.* FROM nb{j} nb0 "
            f"JOIN probedvecs USING (vec_id)) nb CROSS JOIN",
            1,
        )
    out = (
        "WITH " + ivf_ctes + ",\n" + resid + ",\n" + basec + ",\n"
        + probed + ",\n" + pq_ctes_and_final
    )
    # DuckDB inlines single-reference CTEs; the 8 subspace chains each
    # re-inline resid -> assign -> the whole IVF k-means, exploding the
    # plan (the un-materialized query runs >5 min where this runs ~2 s).
    # Pin the shared spine as MATERIALIZED.
    for cte in ("n", "assign", cf, "resid", "basec", "probedvecs", "ps"):
        marker = f",\n{cte} AS ("
        assert marker in out, cte
        out = out.replace(marker, f",\n{cte} AS MATERIALIZED (", 1)
    return out


def _gopher_q_ctes(src: str = "documents") -> str:
    return f"""
t0 AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM {src}),
wcount AS (SELECT doc_id, wrd, count(*) AS c
           FROM (SELECT doc_id, unnest(toks) AS wrd FROM t0) u GROUP BY 1, 2),
tw AS (SELECT doc_id, max(c) AS top_c FROM wcount GROUP BY 1),
qm AS (SELECT t0.doc_id, t0.text, t0.toks,
              cast(len(t0.toks) AS bigint) AS n_words,
              round((length(t0.text) - len(t0.toks) + 1) / len(t0.toks), 6) AS mean_word_len,
              round((length(t0.text) - length(regexp_replace(t0.text, '[^a-z0-9 ]', '', 'g'))) / length(t0.text), 6) AS symbol_ratio,
              round(len(list_filter(t0.toks, x -> regexp_matches(x, '[a-z]'))) / len(t0.toks), 6) AS alpha_word_ratio,
              round(len(list_filter(t0.toks, x -> x IN ('the','a','of','and','to','in'))) / len(t0.toks), 6) AS stopword_ratio,
              round(tw.top_c / len(t0.toks), 6) AS top_word_ratio
       FROM t0 JOIN tw USING (doc_id))
"""


_GOPHER_Q_CTES = _gopher_q_ctes()

_GOPHER_PASS_PRED = (
    "n_words BETWEEN 16 AND 100000 AND mean_word_len BETWEEN 2.0 AND 12.0 "
    "AND symbol_ratio <= 0.1 AND alpha_word_ratio >= 0.8 "
    "AND stopword_ratio >= 0.02 AND top_word_ratio <= 0.3"
)


def _quality_gopher_sql() -> str:
    """DuckDB twin of textops.quality_gopher: same ratios (rounded to
    6dp BEFORE thresholding, so the pass decision is engine-agnostic),
    same exploded top-word repetition share."""
    return f"""
WITH {_GOPHER_Q_CTES}
SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_word_ratio,
       stopword_ratio, top_word_ratio,
       ({_GOPHER_PASS_PRED}) AS gopher_pass
FROM qm ORDER BY doc_id
"""


def _bm25_filtered_sql(query: str, k: int, lang: str) -> str:
    """bm25 oracle restricted to one language's docs; df stays
    corpus-global (post-filter semantics, matching bm25_topk_in)."""
    terms = sorted(set(tokenize(query)))
    tlist = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    return f"""
WITH tok AS ({_TOK}),
p AS (SELECT term, doc_id, count(*) AS tf FROM tok WHERE term IN ({tlist}) GROUP BY 1, 2),
dl AS (SELECT doc_id, greatest(length(text) - 2, 0) AS doc_len FROM documents),
c AS (SELECT count(*) AS n_docs, avg(greatest(length(text) - 2, 0)) AS avgdl FROM documents),
dfq AS (SELECT term, count(*) AS df FROM p GROUP BY 1),
f AS (SELECT doc_id FROM documents WHERE lang = '{lang}'),
s AS (
  SELECT p.doc_id,
         sum( ln((c.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) + 1.0)
              * p.tf * 2.2
              / (p.tf + 1.2 * (0.25 + 0.75 * dl.doc_len / c.avgdl)) ) AS raw
  FROM p JOIN dfq USING (term) JOIN dl USING (doc_id) JOIN f USING (doc_id) CROSS JOIN c
  GROUP BY 1)
SELECT doc_id, round(raw, 6) AS score FROM s
ORDER BY round(raw, 6) DESC, doc_id LIMIT {k}
"""


def _phrase_ranges_sql(q: str) -> str:
    ln = len(q)
    lit = q.replace("'", "''")
    return f"""
WITH m AS (
  SELECT doc_id, i - 1 AS rel
  FROM (SELECT doc_id, text,
               unnest(generate_series(1, greatest(length(text) - {ln} + 1, 0))) AS i
        FROM documents) u
  WHERE substring(text, i, {ln}) = '{lit}'),
x AS (
  SELECT doc_id, rel,
         max(rel + {ln}) OVER (PARTITION BY doc_id ORDER BY rel
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM m),
y AS (
  SELECT doc_id, rel,
         sum(CASE WHEN prev_end IS NULL OR rel > prev_end THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY rel) AS island
  FROM x)
SELECT doc_id, cast(min(rel) AS bigint) AS start_pos,
       cast(max(rel) + {ln} AS bigint) AS end_pos
FROM y GROUP BY doc_id, island
"""


_PII_TEXT_SQL = (
    "text || ' mail user' || doc_id || '@ex.com see https://ex' || doc_id"
    " || '.com/a ip 10.1.2.' || (doc_id % 250) || ' call +12 3456-78'"
    " || (doc_id % 90)"
)


def _redact_pii_sql() -> str:
    """DuckDB twin of textops.redact_pii over the same augmented text:
    the patterns are taken from textops.PII_PATTERNS verbatim (they are
    RE2-and-Java-compatible by construction), counts on the ORIGINAL
    text per pattern, replacements applied in the same order with the
    'g' flag (Spark replaces globally by default)."""
    from searty_spark.textops import PII_PATTERNS

    def lit(pat):
        return "'" + pat.replace("'", "''") + "'"

    clean = "t"
    for _, pat, repl in PII_PATTERNS:
        clean = f"regexp_replace({clean}, {lit(pat)}, '{repl}', 'g')"
    count = " + ".join(
        f"len(regexp_extract_all(t, {lit(pat)}))" for _, pat, _ in PII_PATTERNS
    )
    return f"""
WITH p AS (SELECT doc_id, {_PII_TEXT_SQL} AS t FROM documents)
SELECT doc_id, {clean} AS clean_text, cast({count} AS bigint) AS n_redactions
FROM p ORDER BY doc_id
"""


def _ngram_contamination_sql(n: int = 5, bench_mod: int = 97) -> str:
    """DuckDB twin of textops.ngram_contamination with the benchmark
    stand-in doc_id % bench_mod == 0: word n-grams via a per-row index
    unnest + list_slice (1-based inclusive, same as Spark's slice)."""
    return f"""
WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
idx AS (SELECT doc_id, toks,
               unnest(range(1, greatest(len(toks) - {n} + 1, 0) + 1)) AS i
        FROM t0),
dg AS (SELECT doc_id, array_to_string(list_slice(toks, i, i + {n - 1}), ' ') AS gram
       FROM idx),
bg AS (SELECT DISTINCT gram FROM dg WHERE doc_id % {bench_mod} = 0),
cnt AS (SELECT doc_id, count(*) AS n_ngrams FROM dg GROUP BY 1),
hit AS (SELECT dg.doc_id, count(*) AS n_contaminated FROM dg JOIN bg USING (gram)
        GROUP BY 1)
SELECT d.doc_id,
       cast(coalesce(cnt.n_ngrams, 0) AS bigint) AS n_ngrams,
       cast(coalesce(hit.n_contaminated, 0) AS bigint) AS n_contaminated,
       coalesce(hit.n_contaminated, 0) > 0 AS contaminated
FROM documents d LEFT JOIN cnt USING (doc_id) LEFT JOIN hit USING (doc_id)
ORDER BY doc_id
"""


def _prepare_training_sql(n: int = 5, bench_mod: int = 97) -> str:
    """DuckDB twin of pipeline.prepare_training_corpus over the
    augmented-PII corpus: gopher gate -> decontaminate (benchmark =
    doc_id %% bench_mod of the FULL augmented corpus, pre-gopher, as
    the Spark gate passes it) -> redact -> exact dedup on the redacted
    text, keep-lowest-doc_id. Stage order is the contract."""
    from searty_spark.textops import PII_PATTERNS

    def lit(pat):
        return "'" + pat.replace("'", "''") + "'"

    clean = "t"
    for _, pat, repl in PII_PATTERNS:
        clean = f"regexp_replace({clean}, {lit(pat)}, '{repl}', 'g')"
    count = " + ".join(
        f"len(regexp_extract_all(t, {lit(pat)}))" for _, pat, _ in PII_PATTERNS
    )
    return f"""
WITH base AS (SELECT doc_id, {_PII_TEXT_SQL} AS text FROM documents),
{_gopher_q_ctes('base').strip().rstrip(',')},
q AS (SELECT doc_id, text, toks FROM qm WHERE {_GOPHER_PASS_PRED}),
idx AS (SELECT doc_id, toks,
               unnest(range(1, greatest(len(toks) - {n} + 1, 0) + 1)) AS i FROM q),
dg AS (SELECT doc_id, array_to_string(list_slice(toks, i, i + {n - 1}), ' ') AS gram
       FROM idx),
bt0 AS (SELECT doc_id, string_split(text, ' ') AS toks FROM base
        WHERE doc_id % {bench_mod} = 0),
bidx AS (SELECT toks, unnest(range(1, greatest(len(toks) - {n} + 1, 0) + 1)) AS i
         FROM bt0),
bg AS (SELECT DISTINCT array_to_string(list_slice(toks, i, i + {n - 1}), ' ') AS gram
       FROM bidx),
contam AS (SELECT DISTINCT dg.doc_id FROM dg JOIN bg USING (gram)),
surv AS (SELECT doc_id, text AS t FROM q
         WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
red AS (SELECT doc_id, {clean} AS clean_text,
               cast({count} AS bigint) AS n_redactions FROM surv),
dd AS (SELECT red.*, row_number() OVER (PARTITION BY md5(clean_text)
                                        ORDER BY doc_id) AS rn FROM red)
SELECT doc_id, clean_text, n_redactions FROM dd WHERE rn = 1 ORDER BY doc_id
"""


def oracle_sql() -> dict[str, str]:
    out = {
        "prepare_training_corpus": _prepare_training_sql(),
        "redact_pii": _redact_pii_sql(),
        "ngram_contamination": _ngram_contamination_sql(),
        "term_stats": f"""
WITH tok AS ({_TOK}), p AS (SELECT term, doc_id, count(*) AS tf FROM tok GROUP BY 1, 2)
SELECT term, cast(count(*) AS bigint) AS df, cast(sum(tf) AS bigint) AS cf FROM p GROUP BY term
""",
        "postings_check": f"""
WITH tok AS ({_TOK})
SELECT term, doc_id, cast(count(*) AS bigint) AS tf,
       cast(min(pos) AS bigint) AS min_pos, cast(max(pos) AS bigint) AS max_pos,
       cast(sum(pos) AS bigint) AS sum_pos
FROM tok GROUP BY term, doc_id
""",
        "doc_stats": "SELECT doc_id, cast(greatest(length(text) - 2, 0) AS bigint) AS doc_len FROM documents",
        "term_df_hist": f"""
WITH tok AS ({_TOK}),
p AS (SELECT term, doc_id FROM tok GROUP BY 1, 2),
d AS (SELECT term, count(*) AS df FROM p GROUP BY 1)
SELECT cast(df AS bigint) AS df, cast(count(*) AS bigint) AS n_terms FROM d GROUP BY df
""",
        "dictionary": f"""
WITH tok AS ({_TOK})
SELECT term, cast(row_number() OVER (ORDER BY term) - 1 AS bigint) AS token_id
FROM (SELECT DISTINCT term FROM tok) d
""",
        "bm25_topk_common": _bm25_sql(Q_BM25_COMMON, K_BM25),
        "bm25_topk_multi": _bm25_sql(Q_BM25_MULTI, K_BM25),
        "bm25_topk_wand": _bm25_sql(Q_BM25_COMMON, K_BM25),
        "phrase_bm25": _phrase_bm25_sql(Q_PHRASE, K_BM25),
        "phrase_bm25_seg": _phrase_bm25_sql(Q_PHRASE, K_BM25),
        "phrase_ranges_seg": _phrase_ranges_sql(Q_PHRASE_PERIODIC),
        "phrase_search": (
            f"SELECT doc_id FROM documents WHERE contains(text, '{Q_PHRASE}') ORDER BY doc_id"
        ),
        "regex_search": (
            f"SELECT doc_id FROM documents WHERE regexp_matches(text, '{REGEX_Q}') "
            "ORDER BY doc_id"
        ),
        "regex_search_seg": (
            f"SELECT doc_id FROM documents WHERE regexp_matches(text, '{REGEX_Q}') "
            "ORDER BY doc_id"
        ),
        "phrase_ranges": _phrase_ranges_sql(Q_PHRASE_PERIODIC),
        "symbol_lookup": (
            f"SELECT doc_id, string_split(text, ' ')[1] AS symbol FROM documents "
            f"WHERE string_split(text, ' ')[1] = '{SYMBOL}' ORDER BY doc_id"
        ),
        "symbol_defs": _symbol_defs_sql(SYMBOL, "en"),
        "symbol_defs_bare": _symbol_defs_sql(SYMBOL, None),
        "package_defs": """
WITH pkg AS (SELECT upper(lang) AS name, min(doc_id) AS doc_id FROM documents GROUP BY 1)
SELECT doc_id, d.source, cast(0 AS bigint) AS position,
       'DEFPACKAGE' AS specifier, p.name AS package_name
FROM pkg p JOIN documents d USING (doc_id)
WHERE p.name = 'EN'
""",
        "filename_search": (
            "SELECT doc_id, source FROM documents WHERE contains(source, '1') ORDER BY doc_id"
        ),
        "lisp_index_symbols": _lisp_symbols_sql(),
        "lisp_symbol_bm25": _lisp_bm25_sql("s" + SYMBOL, K_BM25),
        "dedup_exact": (
            "SELECT md5(text) AS text_hash, cast(count(*) AS bigint) AS n_docs, "
            "min(doc_id) AS min_doc_id FROM documents GROUP BY 1"
        ),
        "jaccard_pairs": f"""
WITH {_SHINGLES},
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, round(n_common / (sa.n + sb.n - n_common), 6) AS jacc
FROM inter JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
WHERE round(n_common / (sa.n + sb.n - n_common), 6) >= {JACC_T}
""",
        "sample_corpus": (
            "SELECT doc_id FROM documents "
            "WHERE ('0x' || substr(md5(text), 1, 4))::BIGINT * 100 < 10 * 65536 "
            "ORDER BY doc_id"
        ),
        "sample_stratified": """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rn
  FROM documents) t
WHERE rn <= 50 ORDER BY doc_id
""",
        "normalize_text": (
            r"SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
            " AS norm_text FROM documents ORDER BY doc_id"
        ),
        "top_terms_tfidf": """
WITH tf AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents) u
  GROUP BY 1, 2),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
c AS (SELECT count(*) AS n FROM documents),
s AS (SELECT doc_id, term, round(tf * ln(c.n / dfreq.df), 6) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN c),
r AS (SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
      FROM s)
SELECT doc_id, term, cast(rnk AS int) AS rnk, tfidf FROM r WHERE rnk <= 3
""",
        "bm25_topk_filtered": _bm25_filtered_sql(Q_BM25_COMMON, K_BM25, "en"),
        "ngram_counts": """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (SELECT doc_id, toks[i] || ' ' || toks[i+1] AS ngram
      FROM (SELECT doc_id, toks, unnest(generate_series(1, greatest(len(toks) - 1, 0))) AS i FROM t) u)
SELECT ngram, cast(count(*) AS bigint) AS n_occurrences,
       cast(count(DISTINCT doc_id) AS bigint) AS n_docs
FROM g GROUP BY ngram HAVING count(*) >= 2
""",
        "token_count": "SELECT doc_id, cast(len(string_split(text, ' ')) AS bigint) AS n_tokens FROM documents",
        "quality_score": """
WITH t AS (SELECT doc_id, length(text) AS n_chars, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id, cast(n_chars AS bigint) AS n_chars,
       cast(len(toks) AS bigint) AS n_tokens,
       cast(len(list_distinct(toks)) AS bigint) AS n_uniq_tokens,
       round(len(list_distinct(toks)) / len(toks), 6) AS uniq_ratio,
       round(len(list_filter(toks, x -> x IN ('the','a','of','and','to','in'))) / len(toks), 6) AS stopword_ratio,
       round((n_chars - len(toks) + 1) / len(toks), 6) AS avg_token_len
FROM t
""",
        "doc_fingerprint": (
            "SELECT doc_id, md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp "
            "FROM documents"
        ),
        "lang_stats": (
            "SELECT lang, cast(count(*) AS bigint) AS n_docs, "
            "round(avg(length(text)), 6) AS avg_chars FROM documents GROUP BY lang"
        ),
        "token_count_bpe": (
            r"SELECT doc_id, cast(len(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS bigint)"
            " AS n_bpe_tokens FROM documents ORDER BY doc_id"
        ),
        "lang_id": """
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
v AS (SELECT doc_id, text,
             len(list_filter(toks, x -> x IN ('der','die','und','ist','nicht'))) AS c_de,
             len(list_filter(toks, x -> x IN ('the','a','of','and','to','in'))) AS c_en,
             len(list_filter(toks, x -> x IN ('el','los','que','una','por'))) AS c_es,
             len(list_filter(toks, x -> x IN ('le','les','des','une','dans'))) AS c_fr
      FROM t)
SELECT doc_id,
       CASE WHEN regexp_matches(text, '[一-鿿]') THEN 'zh'
            WHEN c_de + c_en + c_es + c_fr = 0 THEN 'und'
            WHEN c_de >= c_en AND c_de >= c_es AND c_de >= c_fr THEN 'de'
            WHEN c_en >= c_es AND c_en >= c_fr THEN 'en'
            WHEN c_es >= c_fr THEN 'es'
            ELSE 'fr' END AS pred_lang
FROM v
""",
        "embedding_topk": f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id,
       round(list_dot_product(embedding::DOUBLE[], qv)
             / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                * sqrt(list_dot_product(qv, qv))), 6) AS cos
FROM embeddings, q WHERE vec_id != 0
ORDER BY 2 DESC, vec_id LIMIT {K_BM25}
""",
        "embedding_dup_pairs": """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) >= 0.45
""",
        "ivf_assign": """
WITH c AS (SELECT vec_id AS cell, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id < 32),
s AS (
  SELECT e.vec_id, c.cell,
         round(list_dot_product(e.embedding::DOUBLE[], c.cv)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(c.cv, c.cv))), 6) AS sim
  FROM embeddings e CROSS JOIN c),
r AS (SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn FROM s)
SELECT vec_id, cast(cell AS bigint) AS cell FROM r WHERE rn = 1
""",
        "ivf_topk": """
WITH c AS (SELECT vec_id AS cell, embedding::DOUBLE[] AS cv FROM embeddings WHERE vec_id < 32),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
s AS (
  SELECT e.vec_id, c.cell,
         round(list_dot_product(e.embedding::DOUBLE[], c.cv)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(c.cv, c.cv))), 6) AS sim
  FROM embeddings e CROSS JOIN c),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell, row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rn FROM s
  ) WHERE rn = 1),
probe AS (
  SELECT cell FROM (
    SELECT c.cell,
           round(list_dot_product(c.cv, q.qv)
                 / (sqrt(list_dot_product(c.cv, c.cv)) * sqrt(list_dot_product(q.qv, q.qv))), 6) AS sim
    FROM c CROSS JOIN q ORDER BY sim DESC, cell LIMIT 4) p),
cand AS (
  SELECT e.vec_id, e.embedding FROM embeddings e
  JOIN assign a ON a.vec_id = e.vec_id
  WHERE a.cell IN (SELECT cell FROM probe) AND e.vec_id != 0)
SELECT vec_id,
       round(list_dot_product(embedding::DOUBLE[], qv)
             / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                * sqrt(list_dot_product(qv, qv))), 6) AS cos
FROM cand CROSS JOIN q
ORDER BY cos DESC, vec_id LIMIT 10
""",
        "revenue_by_nation": """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       cast(count(*) AS bigint) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
        "customers_without_orders": """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000)
""",
        "top_docs_per_lang": """
SELECT lang, doc_id, n_chars, cast(rnk AS int) AS rnk FROM (
  SELECT lang, doc_id, n_chars,
         row_number() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id) AS rnk
  FROM documents) t
WHERE rnk <= 3
""",
        "lang_source_rollup": """
SELECT coalesce(lang, '<all>') AS lang, coalesce(source, '<all>') AS source,
       cast(count(*) AS bigint) AS n_docs, cast(sum(n_chars) AS bigint) AS sum_chars
FROM documents GROUP BY ROLLUP (lang, source)
""",
        "sessionize": """
WITH g AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR date_diff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events)
SELECT user_id, cast(sum(new_sess) AS bigint) AS n_sessions,
       cast(count(*) AS bigint) AS n_events
FROM g GROUP BY user_id
""",
        "windowed_counts": """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, cast(count(*) AS bigint) AS n, round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2
""",
    }
    # MinHash LSH candidates are verified with exact Jaccard; band recall
    # is deterministically 1.0 on this corpus (asserted in tests), so the
    # output equals the exact-Jaccard pairs — gate it against the same SQL,
    # which makes the recall claim itself part of the correctness check.
    out["minhash_pairs"] = out["jaccard_pairs"]
    out["simhash_pairs"] = _simhash_sql(max_hamming=8)
    out["dedup_clusters"] = (
        _components_sql(
            "b AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)",
            JACC_T,
        )
        + "SELECT node AS doc_id, cluster_id FROM comp ORDER BY doc_id"
    )
    out["clean_corpus"] = (
        _components_sql(
            """t0 AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
q AS (SELECT doc_id, text, toks FROM t0
      WHERE len(toks) >= 16 AND len(list_distinct(toks)) / len(toks) >= 0.3),
ke AS (SELECT md5(text) AS h, min(doc_id) AS doc_id FROM q GROUP BY 1),
b AS (SELECT q.doc_id, q.toks FROM q JOIN ke ON ke.doc_id = q.doc_id)""",
            JACC_T,
        )
        + """SELECT b.doc_id FROM b
LEFT JOIN (SELECT node FROM comp WHERE node != cluster_id) dropn ON dropn.node = b.doc_id
WHERE dropn.node IS NULL ORDER BY doc_id"""
    )
    out["quality_gopher"] = _quality_gopher_sql()
    out["clean_corpus_gopher"] = (
        _components_sql(
            _GOPHER_Q_CTES.strip()
            + f""",
q AS (SELECT doc_id, text, toks FROM qm WHERE {_GOPHER_PASS_PRED}),
ke AS (SELECT md5(text) AS h, min(doc_id) AS doc_id FROM q GROUP BY 1),
b AS (SELECT q.doc_id, q.toks FROM q JOIN ke ON ke.doc_id = q.doc_id)""",
            JACC_T,
        )
        + """SELECT b.doc_id FROM b
LEFT JOIN (SELECT node FROM comp WHERE node != cluster_id) dropn ON dropn.node = b.doc_id
WHERE dropn.node IS NULL ORDER BY doc_id"""
    )
    # the LSH scale path must reproduce the exact all-pairs result
    # (recall 1.0 + exact verification) — same oracle by construction
    out["embedding_dup_pairs_lsh"] = out["embedding_dup_pairs"]
    out["ivf_topk_trained"] = _ivf_trained_sql()
    out["pq_topk"] = _pq_topk_sql()
    out["pq_topk_m16"] = _pq_topk_sql(m=16)
    out["ivf_pq_topk"] = _ivf_pq_sql()
    # the stored-artifact paths must reproduce the recompute paths
    # exactly (write_ann_index round-trips the same trained codebooks
    # and codes through parquet/JSON) — same oracles by construction
    out["pq_topk_stored"] = out["pq_topk"]
    out["ivf_pq_topk_stored"] = out["ivf_pq_topk"]
    # the streaming twins must drain to exactly the batch answers
    out["sessionize_stream"] = out["sessionize"]
    out["windowed_counts_stream"] = out["windowed_counts"]
    out["substring_spans"] = _substring_spans_cte(k=10) + """
SELECT doc_id, cast(min(pos) AS bigint) AS span_start, cast(max(e) AS bigint) AS span_end
FROM g GROUP BY doc_id, grp ORDER BY doc_id, span_start
"""
    out["substring_dedup"] = _substring_spans_cte(k=10) + """
, sp AS (SELECT doc_id, min(pos) AS s, max(e) AS e FROM g GROUP BY doc_id, grp),
agg AS (SELECT doc_id, sum(e - s + 1) AS dup_tokens FROM sp GROUP BY doc_id)
SELECT d.doc_id, cast(len(string_split(d.text, ' ')) AS bigint) AS n_tokens,
       cast(coalesce(a.dup_tokens, 0) AS bigint) AS dup_tokens,
       round(coalesce(a.dup_tokens, 0) / len(string_split(d.text, ' ')), 6) AS dup_frac
FROM documents d LEFT JOIN agg a USING (doc_id)
WHERE round(coalesce(a.dup_tokens, 0) / len(string_split(d.text, ' ')), 6) <= 0.2
ORDER BY doc_id
"""
    out["excise_duplicates"] = _excise_duplicates_sql(k=10)
    out["lm_doc_scores"] = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
bi AS (SELECT doc_id, l[i] AS w1, l[i+1] AS w2
       FROM (SELECT doc_id, l, unnest(generate_series(1, greatest(len(l)-1, 0))) AS i FROM t) u),
uni AS (SELECT unnest(l) AS w FROM t),
c1 AS (SELECT w AS w1, count(*) AS c1 FROM uni GROUP BY 1),
v AS (SELECT count(DISTINCT w) AS v FROM uni),
c2 AS (SELECT w1, w2, count(*) AS c2 FROM bi GROUP BY 1, 2)
SELECT doc_id, cast(count(*) AS bigint) AS n_bigrams,
       round(avg(ln((c2 + 1) / (c1.c1 + v.v))), 6) AS avg_logprob
FROM bi JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
GROUP BY doc_id ORDER BY doc_id
"""
    return out


def _excise_duplicates_sql(k: int) -> str:
    """Oracle twin of dedup.excise_duplicates: rank each duplicated
    window's occurrences by (doc_id, pos), excise the token coverage
    of every rank > 1 occurrence, reassemble per-doc text in token
    order."""
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
wins AS (SELECT doc_id, i AS pos, array_to_string(toks[i:i+{k - 1}], ' ') AS w
      FROM (SELECT doc_id, toks, unnest(generate_series(1, greatest(len(toks)-{k}+1, 0))) AS i FROM t) u),
r AS (SELECT doc_id, pos,
        row_number() OVER (PARTITION BY w ORDER BY doc_id, pos) AS rn,
        count(*) OVER (PARTITION BY w) AS cnt
      FROM wins),
removal AS (SELECT DISTINCT doc_id, u.tp AS tp
            FROM r, unnest(generate_series(pos, pos + {k - 1})) AS u(tp)
            WHERE cnt >= 2 AND rn > 1),
tok AS (SELECT doc_id, s.g AS tp, toks[s.g] AS tok
        FROM t, unnest(generate_series(1, len(toks))) AS s(g)),
kept AS (SELECT tok.* FROM tok ANTI JOIN removal USING (doc_id, tp)),
rb AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY tp) AS clean_text, count(*) AS n_kept
       FROM kept GROUP BY doc_id)
SELECT d.doc_id, coalesce(rb.clean_text, '') AS clean_text,
       cast(len(string_split(d.text, ' ')) - coalesce(rb.n_kept, 0) AS bigint) AS n_removed_tokens
FROM documents d LEFT JOIN rb USING (doc_id) ORDER BY d.doc_id
"""


def _substring_spans_cte(k: int) -> str:
    """Shared oracle spine for the substring-dedup gates: k-token
    windows -> corpus-wide occurrence filter -> per-doc merged
    duplicated intervals (running-max island detection), replaying
    dedup.dup_spans exactly (1-based inclusive bounds, adjacent spans
    merged)."""
    return f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
wins AS (SELECT doc_id, i AS pos, i + {k - 1} AS e, array_to_string(toks[i:i+{k - 1}], ' ') AS w
      FROM (SELECT doc_id, toks, unnest(generate_series(1, greatest(len(toks)-{k}+1, 0))) AS i FROM t) u),
dup AS (SELECT w FROM wins GROUP BY w HAVING count(*) >= 2),
dwin AS (SELECT doc_id, pos, e FROM wins WHERE w IN (SELECT w FROM dup)),
m AS (SELECT doc_id, pos, e,
  CASE WHEN pos > coalesce(max(e) OVER (PARTITION BY doc_id ORDER BY pos
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -10) + 1 THEN 1 ELSE 0 END AS brk
  FROM dwin),
g AS (SELECT doc_id, pos, e, sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp FROM m)
"""
