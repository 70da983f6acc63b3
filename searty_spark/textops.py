"""Text-analysis operators for a training-data pipeline: token counting,
quality scoring, fingerprinting, language stats. All pure Spark SQL
expressions (JVM-side, whole-stage codegen) over the documents table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def words_col(text_col: str = "text"):
    return F.split(F.col(text_col), " ")


def token_count(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens) — whitespace tokenization."""
    return docs.select(
        "doc_id", F.size(words_col()).cast("long").alias("n_tokens")
    ).orderBy("doc_id")


def quality_score(docs: DataFrame) -> DataFrame:
    """Per-doc quality features: length, lexical diversity, stopword
    ratio, mean token length. A 100-TB pipeline would threshold on
    these columns to filter the corpus; all JVM-side."""
    from searty_spark.session import spread_input

    w = words_col()
    n_tok = F.size(w).cast("long")
    n_uniq = F.size(F.array_distinct(w)).cast("long")
    n_stop = F.size(F.filter(w, lambda x: x.isin(STOPWORDS))).cast("long")
    return spread_input(docs).select(
        "doc_id",
        F.char_length("text").cast("long").alias("n_chars"),
        n_tok.alias("n_tokens"),
        n_uniq.alias("n_uniq_tokens"),
        F.round(n_uniq / n_tok, 6).alias("uniq_ratio"),
        F.round(n_stop / n_tok, 6).alias("stopword_ratio"),
        F.round(
            (F.char_length("text") - n_tok + 1) / n_tok, 6
        ).alias("avg_token_len"),
    ).orderBy("doc_id")


def quality_gopher(
    docs: DataFrame,
    min_words: int = 16,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    max_top_word_ratio: float = 0.3,
    min_stopword_ratio: float = 0.02,
) -> DataFrame:
    """Gopher/CCNet-style repetition- and composition-conditioned
    quality dimensions (Rae et al. 2021 §A1.1 rule shapes, re-derived
    over this corpus's whitespace tokens) + the composite pass flag:

    - n_words, mean_word_len — doc-length conditioning bounds;
    - symbol_ratio — chars outside [a-z0-9 ] over all chars (boiler-
      plate/markup detector);
    - alpha_word_ratio — words containing at least one letter (tables
      of numbers / markup fail this);
    - stopword_ratio — function-word presence (natural prose floor;
      real Gopher requires >= 2 stop words per doc — here a ratio
      floor, min_stopword_ratio, so the rule is length-invariant);
    - top_word_ratio — most frequent word's share (the Gopher
      repetition signal: templated/spun pages repeat one token);
    - gopher_pass — AND of the thresholds, every comparison on the
      ROUNDED (6dp) ratio so the decision is engine-agnostic.

    Plan: per-doc scalars are one codegen'd projection; the top-word
    share is one explode -> (doc, word) count -> per-doc max — two
    partial-aggregated shuffles keyed by doc_id, then a shuffle join
    back. At 10^12 docs all three stages are uniform-keyed (doc_id);
    nothing is driver-side."""
    from searty_spark.session import spread_input

    docs = spread_input(docs)
    w = words_col()
    n_words = F.size(w).cast("long")
    n_chars = F.char_length("text").cast("long")
    n_stop = F.size(F.filter(w, lambda x: x.isin(STOPWORDS)))
    n_alpha = F.size(F.filter(w, lambda x: x.rlike("[a-z]")))
    n_sym = n_chars - F.char_length(F.regexp_replace(F.col("text"), "[^a-z0-9 ]", ""))
    base = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round((n_chars - n_words + 1) / n_words, 6).alias("mean_word_len"),
        F.round(n_sym / n_chars, 6).alias("symbol_ratio"),
        F.round(n_alpha / n_words, 6).alias("alpha_word_ratio"),
        F.round(n_stop / n_words, 6).alias("stopword_ratio"),
    )
    topw = (
        docs.select("doc_id", F.explode(w).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_c"))
    )
    j = base.join(topw, "doc_id")
    top_ratio = F.round(F.col("top_c") / F.col("n_words"), 6)
    gopher_pass = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("alpha_word_ratio") >= min_alpha_word_ratio)
        & (F.col("stopword_ratio") >= min_stopword_ratio)
        & (top_ratio <= max_top_word_ratio)
    )
    return j.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "symbol_ratio",
        "alpha_word_ratio",
        "stopword_ratio",
        top_ratio.alias("top_word_ratio"),
        gopher_pass.alias("gopher_pass"),
    ).orderBy("doc_id")


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """(doc_id, fp) — order-insensitive content fingerprint: md5 over
    the sorted distinct token set. Used for near-dup bucketing and
    incremental re-crawl detection."""
    from searty_spark.session import spread_input

    return spread_input(docs).select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(words_col())))).alias("fp"),
    ).orderBy("doc_id")


BPE_ISH = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"

LANG_STOPWORDS = {
    "de": ["der", "die", "und", "ist", "nicht"],
    "en": ["the", "a", "of", "and", "to", "in"],
    "es": ["el", "los", "que", "una", "por"],
    "fr": ["le", "les", "des", "une", "dans"],
}


def token_count_bpe(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bpe_tokens) — BPE-ish pre-tokenization count: maximal
    alphanumeric runs plus individual punctuation marks (the shape a
    GPT-style byte-pair pre-tokenizer produces), via one JVM regexp —
    the cheap token-budget estimator a training pipeline thresholds
    on."""
    from searty_spark.session import spread_input

    return spread_input(docs).select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH), F.lit(0)))
        .cast("long")
        .alias("n_bpe_tokens"),
    ).orderBy("doc_id")


def lang_id(docs: DataFrame) -> DataFrame:
    """(doc_id, pred_lang) — deterministic language-ID heuristic:
    CJK codepoints => 'zh'; otherwise stopword votes per candidate
    language, argmax with alphabetical tie-break; no votes => 'und'.
    Pure JVM expressions, replicated verbatim in the DuckDB oracle.
    (The synthetic corpus draws every language's text from one shared
    vocabulary, so prediction accuracy against its lang label is not a
    meaningful target — the gate checks engine-equivalence of the
    heuristic.)"""
    w = words_col()

    def _vote(sw):
        # nb: the lambda must be unary — F.filter passes the element
        # index to a second parameter, including defaulted ones
        return F.size(F.filter(w, lambda x: x.isin(sw)))

    votes = {lang: _vote(sw) for lang, sw in LANG_STOPWORDS.items()}
    c_de, c_en, c_es, c_fr = votes["de"], votes["en"], votes["es"], votes["fr"]
    pred = (
        F.when(F.col("text").rlike("[\u4e00-\u9fff]"), "zh")
        .when(c_de + c_en + c_es + c_fr == 0, "und")
        .when((c_de >= c_en) & (c_de >= c_es) & (c_de >= c_fr), "de")
        .when((c_en >= c_es) & (c_en >= c_fr), "en")
        .when(c_es >= c_fr, "es")
        .otherwise("fr")
    )
    from searty_spark.session import spread_input

    return spread_input(docs).select("doc_id", pred.alias("pred_lang")).orderBy("doc_id")


def lang_stats(docs: DataFrame) -> DataFrame:
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg(F.char_length("text")), 6).alias("avg_chars"),
        )
        .orderBy("lang")
    )


def ngram_counts(docs: DataFrame, n: int = 2, min_count: int = 2) -> DataFrame:
    """(ngram, n_occurrences, n_docs) — corpus-level word n-gram
    frequency table (NON-distinct occurrences — the language-model
    counting semantics, unlike the dedup shingles which are per-doc
    sets). One explode + one hash aggregation; ``min_count`` prunes the
    long tail before it is ever shuffled to the output."""
    # one linear regex scan per doc instead of split + per-gram
    # slice/concat (row-identical — see dedup._window_pattern)
    from searty_spark.dedup import _window_pattern
    from searty_spark.session import spread_input

    return (
        spread_input(docs).select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(
                    F.col("text"), F.lit(_window_pattern(n)), F.lit(1)
                )
            ).alias("ngram"),
        )
        .groupBy("ngram")
        .agg(
            F.count("*").cast("long").alias("n_occurrences"),
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
        )
        .filter(F.col("n_occurrences") >= min_count)
        .orderBy(F.desc("n_occurrences"), "ngram")
    )


def normalize_text(docs: DataFrame) -> DataFrame:
    """(doc_id, norm_text) — canonical text form for dedup/hashing:
    lowercase, whitespace runs collapsed to single spaces, trimmed.
    The projection itself is pure JVM SQL and map-only; the trailing
    ``orderBy`` exists solely for deterministic gating/display and is
    NOT part of the 100 TB plan shape — a pipeline composing this
    should take the unsorted projection (Catalyst drops the sort when
    a downstream op doesn't need it, but don't rely on that: at scale,
    call ``.select(...)`` forms of this directly or strip the sort)."""
    return docs.select(
        "doc_id",
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")).alias(
            "norm_text"
        ),
    ).orderBy("doc_id")


def top_terms_tfidf(docs: DataFrame, k: int = 3) -> DataFrame:
    """(doc_id, term, rnk, tfidf) — each doc's top-k whitespace tokens
    by tf-idf (tf = in-doc count, idf = ln(N / df), df = docs
    containing the term): the per-document keyword extraction a
    training pipeline uses for topic tagging / mixture analysis.

    Plan: one explode -> (term, doc) hash agg (map-side combined), a
    tiny df aggregate broadcast back, one window per doc. Scores are
    rounded to 6 decimals BEFORE ranking so the ranking key
    (round(tfidf, 6) DESC, term ASC) is engine-agnostic — the DuckDB
    oracle replays it exactly."""
    from pyspark.sql import Window

    from searty_spark.session import spread_input

    n_docs = docs.count()
    tf = (
        spread_input(docs).select("doc_id", F.explode(words_col()).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(F.broadcast(df), "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias(
            "tfidf"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "term", F.col("rnk").cast("int").alias("rnk"), "tfidf")
        .orderBy("doc_id", "rnk")
    )


# PII patterns shared verbatim with the DuckDB oracle: plain character
# classes only (no lookaround), valid in BOTH Java regex (Spark) and
# RE2 (DuckDB). Applied in this exact order — URL before email matters
# (a URL can embed an @), and both engines replace globally.
PII_PATTERNS = [
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+\d[\d\- ]{7,}\d", "<PHONE>"),
]


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, clean_text, n_redactions) — the standard training-data
    scrubbing pass: URLs, emails, IPv4s and international-format phone
    numbers replaced by typed placeholders. Pure JVM regexp_replace
    (one codegen'd projection, no shuffle, no Python); n_redactions
    counts matches BEFORE replacement so the number is independent of
    substitution order effects within a pattern.

    This is deliberately pattern-based, not NER: at 10^12 docs the
    regex pass is free inside the existing scan, and the common PII
    classes in web text are exactly these machine-formatted strings.
    """
    t = F.col(text_col)
    n_red = F.lit(0)
    for _, pat, _ in PII_PATTERNS:
        n_red = n_red + F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
    clean = t
    for _, pat, repl in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, repl)
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        n_red.cast("long").alias("n_redactions"),
    ).orderBy("doc_id")


def ngram_contamination(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 5,
    text_col: str = "text",
    max_broadcast_grams: int = 2_000_000,
) -> DataFrame:
    """(doc_id, n_ngrams, n_contaminated, contaminated) — benchmark
    decontamination, the GPT-3/Dolma-style check: a training document
    is contaminated when any of its word n-grams also occurs in the
    evaluation-benchmark text set. ``bench`` is a DataFrame with a
    ``text`` column (the benchmark corpus).

    Plan: the benchmark's distinct n-grams are usually a SMALL set
    (benchmarks are thousands of docs, the corpus is billions) —
    broadcast them; each training doc explodes to its n-grams once,
    inner-joins the broadcast set, and aggregates matches per doc_id.
    One explode + one broadcast join + one uniform doc_id-keyed agg;
    the corpus is never shuffled on anything but doc_id. Docs shorter
    than ``n`` words have n_ngrams = 0 and are never contaminated.

    "Small by construction" is guarded, not assumed: the distinct
    bench grams are COUNTED first (one aggregation over the benchmark
    side only — never the corpus), and above ``max_broadcast_grams``
    the join falls back to a shuffled hash join (bench side still the
    build side) instead of OOM-ing every executor with a multi-GB
    broadcast when someone passes the union of a full eval suite.
    The count costs one extra Spark job whose input is the benchmark,
    which is exactly the side cheap enough to scan twice."""
    def grams(df):
        # one linear regex scan per doc instead of split + per-gram
        # slice/concat (row-identical — see dedup._window_pattern);
        # docs shorter than n words extract nothing by construction
        from searty_spark.dedup import _window_pattern

        return df.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(_window_pattern(n)), F.lit(1)
                )
            ).alias("gram"),
        )

    from searty_spark.session import spread_input

    docs = spread_input(docs)
    bench_grams = grams(bench.select(F.col("doc_id"), F.col(text_col))).select(
        "gram"
    ).distinct()
    n_bench_grams = bench_grams.count()
    if n_bench_grams <= max_broadcast_grams:
        bench_side = F.broadcast(bench_grams)
    else:
        # shuffle_hash, not sort-merge: the corpus-gram side streams
        # through unsorted; only the (relatively) small bench side is
        # hashed per partition
        bench_side = bench_grams.hint("shuffle_hash")
    doc_grams = grams(docs)
    counts = doc_grams.groupBy("doc_id").agg(F.count("*").alias("n_ngrams"))
    hits = (
        doc_grams.join(bench_side, "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated"))
    )
    return (
        docs.select("doc_id")
        .join(counts, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_ngrams", F.lit(0)).cast("long").alias("n_ngrams"),
            F.coalesce("n_contaminated", F.lit(0)).cast("long").alias("n_contaminated"),
            (F.coalesce("n_contaminated", F.lit(0)) > 0).alias("contaminated"),
        )
        .orderBy("doc_id")
    )


def lm_score(docs: DataFrame) -> DataFrame:
    """(doc_id, n_bigrams, avg_logprob) — CCNet-style language-model
    quality signal: each document scored by the mean log-probability
    of its word bigrams under the CORPUS'S OWN Laplace-smoothed bigram
    model, P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V). Documents whose
    text is statistically typical of the corpus score high; boilerplate
    gibberish and charset noise score low — the filterable signal the
    CCNet pipeline gets from a KenLM perplexity bucket, computed here
    without an external model. Docs with fewer than 2 tokens have no
    bigram and are omitted (no score is defined for them).

    Scale shape: one explode to bigram occurrences, two corpus-wide
    gram count aggregations (map-side combined), two equi-joins of the
    occurrence relation against those counts on the gram keys (AQE
    broadcasts the count sides when small, splits hot function-word
    keys otherwise), one doc_id aggregation. Nothing quadratic,
    nothing driver-side; V is a 1-row aggregate. Float policy: the
    mean is rounded to 6 like every scored surface (CLAUDE.md)."""
    from searty_spark.session import spread_input

    docs = spread_input(docs)
    # materialized toks column — inline split() in the element_at
    # lambda re-tokenizes the doc once per bigram (_word_shingle_rows)
    toks = F.col("toks")
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.struct(
                F.element_at(toks, i + 1).alias("w1"),
                F.element_at(toks, i + 2).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bi = docs.select("doc_id", words_col().alias("toks")).select(
        "doc_id", F.explode(pairs).alias("p")
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    uni = docs.select(F.explode(words_col()).alias("w"))
    c1 = uni.groupBy(F.col("w").alias("w1")).agg(F.count("*").alias("c1"))
    v = uni.select(F.count_distinct("w").alias("v"))
    c2 = bi.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    return (
        bi.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(
                F.avg(F.log((F.col("c2") + 1) / (F.col("c1") + F.col("v")))), 6
            ).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )
