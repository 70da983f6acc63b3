"""End-to-end corpus cleaning — the composite a training-data
pipeline actually runs, assembled from the gated primitives:

1. quality gate      — token count + lexical diversity thresholds
                       (textops.quality_score features);
2. exact dedup       — keep the lowest doc_id per identical text
                       (dedup.exact_dup_groups semantics);
3. near-dup dedup    — MinHash-LSH verified pairs over the SURVIVORS
                       of 1+2, connected components, keep each
                       cluster's lowest doc_id (dedup.dup_clusters).

Stage order matters and is part of the contract (near-dup clusters are
computed on the already-quality-filtered, exactly-deduplicated corpus);
the DuckDB oracle replicates the stages verbatim, including the
recursive-CTE connected components.

Every stage is one shuffle over progressively smaller data; nothing
here touches the corpus more than the primitives themselves do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from searty_spark.dedup import connected_components, minhash_lsh_pairs


def clean_corpus(
    docs: DataFrame,
    min_tokens: int = 16,
    min_uniq_ratio: float = 0.3,
    jacc_threshold: float = 0.2,
    quality: str = "basic",
) -> DataFrame:
    """(doc_id) — the surviving documents, ascending.

    ``quality`` selects the stage-1 gate: "basic" (token count +
    lexical diversity, the original rule) or "gopher" — the full
    doc-length-conditioned textops.quality_gopher rule set (length
    bounds, mean word length, symbol ratio, alpha-word ratio,
    top-word repetition)."""
    from searty_spark.session import spread_input

    docs = spread_input(docs)
    if quality == "gopher":
        from searty_spark.textops import quality_gopher

        keep = quality_gopher(docs, min_words=min_tokens).filter(
            F.col("gopher_pass")
        ).select("doc_id")
    elif quality == "basic":
        w = F.split(F.col("text"), " ")
        q = docs.select(
            "doc_id",
            F.size(w).alias("n_tok"),
            (F.size(F.array_distinct(w)) / F.size(w)).alias("ur"),
        )
        keep = q.filter(
            (F.col("n_tok") >= min_tokens) & (F.col("ur") >= min_uniq_ratio)
        ).select("doc_id")
    else:
        raise ValueError(f"quality must be basic|gopher, got {quality!r}")
    # checkpoint the surviving doc_id SETS, not the text: base feeds
    # ~six downstream consumers (exact-dedup, three shingle passes,
    # the final assembly joins), and each lazy consumption would
    # re-evaluate the per-doc quality expressions (array_distinct /
    # gopher rules over every token) from scratch. The pinned state is
    # one long per surviving doc — the same bounded-id discipline
    # connected_components already uses for its edge set — and the
    # consumers re-derive (doc_id, text) with a cheap semi-join.
    keep = keep.localCheckpoint(eager=True)
    base = docs.join(keep, "doc_id", "left_semi").select("doc_id", "text")
    keep_exact = (
        base.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
        .localCheckpoint(eager=True)
    )
    base = base.join(keep_exact, "doc_id", "left_semi")
    clusters = connected_components(
        minhash_lsh_pairs(base, threshold=jacc_threshold).select("doc_a", "doc_b")
    )
    drop = clusters.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id")
    )
    out = base.select("doc_id").join(drop, "doc_id", "left_anti").orderBy("doc_id")
    return out


def sample_corpus(docs: DataFrame, pct: int = 10) -> DataFrame:
    """(doc_id) — deterministic content-addressed sampling: keep a doc
    iff the first 4 hex digits of md5(text) fall in the lowest ``pct``
    percent of the 16-bit space. Unlike rng-based df.sample, the
    decision is a pure function of content — stable across runs,
    partitionings and engines (same rows at any cluster size), which
    is what makes training-data subsets reproducible."""
    bucket = F.conv(F.substring(F.md5("text"), 1, 4), 16, 10).cast("long")
    return (
        docs.filter(bucket * 100 < F.lit(pct) * 65536)
        .select("doc_id")
        .orderBy("doc_id")
    )


def sample_stratified(
    docs: DataFrame, n_per_stratum: int = 100, stratum_col: str = "lang"
) -> DataFrame:
    """(doc_id, <stratum>) — deterministic fixed-size per-stratum
    sample: within each stratum keep the ``n_per_stratum`` docs with
    the LOWEST md5(text) (ties broken by doc_id). The training-mix
    balancing primitive: equal representation per language/source
    regardless of how skewed the corpus is, and — like sample_corpus —
    a pure function of content, identical at any partitioning, engine
    or cluster size.

    One window over one shuffle by stratum; at 10^12 rows the stratum
    key has low cardinality, so compute rides the same AQE-handled
    shuffle any per-group top-k does (no driver involvement)."""
    from pyspark.sql import Window

    w = Window.partitionBy(stratum_col).orderBy(F.md5("text"), "doc_id")
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .select("doc_id", stratum_col)
        .orderBy("doc_id")
    )


def prepare_training_corpus(
    docs: DataFrame,
    bench: DataFrame | None = None,
    n_contam: int = 5,
    min_tokens: int = 16,
    substring_k: int | None = None,
    **gopher_kwargs,
) -> DataFrame:
    """(doc_id, clean_text, n_redactions) — the full Dolma/CCNet-style
    preparation composite over the gated primitives, in the order a
    production pipeline runs them:

    1. quality gate      — textops.quality_gopher (doc-length-
                           conditioned rules incl. the stop-word
                           floor), on the ORIGINAL text;
    2. decontamination   — drop survivors sharing any word
                           ``n_contam``-gram with ``bench`` (the
                           evaluation set), on the ORIGINAL text
                           (contamination predates any rewriting);
    3. PII redaction     — textops.redact_pii on the survivors;
    4. exact dedup       — keep the lowest doc_id per identical
                           REDACTED text (redaction canonicalizes
                           machine-formatted variation first, so two
                           docs differing only in scrubbed tokens
                           collapse — the reason this stage follows 3);
    5. (optional, ``substring_k``) substring excision — the Lee et
                           al. 2022 rewrite over the SURVIVORS'
                           clean_text (dedup.excise_duplicates with
                           k = substring_k): duplicated k-token runs
                           keep their corpus-wide first occurrence,
                           later copies are cut. Runs after dedup so
                           exact copies are already gone and the
                           window table only carries survivor text.
                           Off by default (output identical to the
                           gated 4-stage contract when None).

    Stage order is part of the contract; the DuckDB oracle replays it
    verbatim.

    Plan shape: stages 1-3 are PER-DOC signals independent of every
    other document (the quality flag, the contamination flag against a
    fixed benchmark, the redacted text), so they are computed as three
    parallel branches over the source and combined with doc_id-keyed
    joins — NOT as sequential semi-join filters, which would embed the
    quality subtree into every later branch and recompute it once per
    stage (measured 3x the whole-pipeline wall at 1M docs; library
    code must not pin caches the caller can't release, so
    materializing the intermediate was not an option). Only stage 4
    (keep-first dedup) is cross-document, and it runs on the already-
    filtered survivors. Results are identical to the sequential
    formulation because per-doc flags don't depend on which other docs
    survive."""
    from pyspark.sql import Window

    from searty_spark.session import spread_input
    from searty_spark.textops import ngram_contamination, quality_gopher, redact_pii

    # single-file fixture corpora scan as 1-2 partitions; every signal
    # branch below (regex scrub, gopher rules, gram explodes) is CPU-
    # bound per doc, so spread once here and every branch inherits
    docs = spread_input(docs)

    # extra gopher_kwargs forward to quality_gopher — corpora that are
    # not English prose (e.g. synthetic benchmark text with no
    # function words) need their thresholds recalibrated, or the
    # stop-word floor rejects everything (which IS Gopher's intended
    # behavior on gibberish)
    flags = quality_gopher(docs, min_words=min_tokens, **gopher_kwargs).select(
        "doc_id", "gopher_pass"
    )
    red = redact_pii(docs).join(flags, "doc_id").filter(F.col("gopher_pass"))
    if bench is not None:
        contam = ngram_contamination(docs, bench, n=n_contam).select(
            "doc_id", "contaminated"
        )
        red = red.join(contam, "doc_id").filter(~F.col("contaminated"))
    w = Window.partitionBy("fp").orderBy("doc_id")
    out = (
        red.withColumn("fp", F.md5("clean_text"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "clean_text", "n_redactions")
    )
    if substring_k is not None:
        from searty_spark.dedup import excise_duplicates

        exc = excise_duplicates(
            out.select("doc_id", F.col("clean_text").alias("text")), k=substring_k
        ).select("doc_id", F.col("clean_text").alias("excised_text"))
        out = (
            out.join(exc, "doc_id")
            .select("doc_id", F.col("excised_text").alias("clean_text"), "n_redactions")
        )
    return out.orderBy("doc_id")
