"""Physical-plan assertions — the 100-TB guarantees, checked on the
actual plans (.explain) rather than trusted:

- query terms reach the parquet scan as pushed filters (the analogue
  of the reference's SQL index seek, ref database.go:508-526);
- bucket predicates prune partitions at file-listing time;
- per-term df / query-term joins broadcast, never shuffle the big side;
- top-k is TakeOrderedAndProject, never a global sort;
- column pruning keeps text/html out of scans that don't need them.
"""

import pytest
from pyspark.sql import functions as F

from searty_spark.build import build_postings, doc_stats
from searty_spark.query import bm25_topk


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.fixture(scope="module")
def disk_index(spark, small_corpus, tmp_path_factory):
    from searty_spark.index import write_index

    d = str(tmp_path_factory.mktemp("planidx") / "idx")
    write_index(small_corpus, d, n_shards=2, n_buckets=8)
    return d


def test_segment_scan_pushes_term_and_bucket_filters(spark, disk_index):
    from searty_spark.index import load_segments, term_buckets

    seg = load_segments(spark, disk_index)
    buckets = term_buckets(spark, ["abc"], 8)
    q = seg.filter(F.col("term") == "abc").filter(F.col("bucket").isin(buckets))
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(term), EqualTo(term,abc)" in plan
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters", 1)[1][:200]


def test_bm25_topk_is_take_ordered_with_broadcasts(spark, small_corpus):
    p = build_postings(small_corpus)
    s = doc_stats(small_corpus)
    plan = _plan(bm25_topk(p, s, "shared phrase", k=10))
    assert "TakeOrderedAndProject" in plan  # no global sort for top-k
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_segment_scan_prunes_blob_columns(spark, disk_index):
    from searty_spark.index import load_segments

    q = load_segments(spark, disk_index).groupBy("term").count()
    plan = _plan(q)
    sched = plan.split("ReadSchema", 1)[1][:300]
    assert "blob" not in sched and "pos_blob" not in sched


def test_minhash_verification_is_candidate_pruned(spark, small_corpus):
    """The exact-Jaccard verification inside the LSH pipeline must not
    contain a full-corpus shingle self-join: every join touching the
    shingle column is a LeftSemi (candidate-doc prune / per-pair
    intersection), never an Inner join of the shingle relation with
    itself (the brute-force shape LSH exists to avoid)."""
    from searty_spark.dedup import minhash_lsh_pairs

    plan = _plan(minhash_lsh_pairs(small_corpus, threshold=0.2))
    join_lines = [
        ln for ln in plan.splitlines()
        if "Join" in ln and "shingle" in ln and "Keys" not in ln
    ]
    # the formatted plan lists join nodes with their keys in detail
    # sections; scan the detail blocks instead for robustness
    details = plan.split("\n\n")
    shingle_joins = [
        d for d in details
        if d.startswith("(") and "Join" in d.splitlines()[0] and "shingle" in d
    ]
    assert shingle_joins, f"expected shingle joins in plan; lines={join_lines}"
    for d in shingle_joins:
        assert "LeftSemi" in d, f"non-semi join on shingle (all-pairs shape):\n{d}"


def test_embedding_dup_lsh_has_no_cartesian(spark):
    """The LSH near-dup path must candidate-generate via an equi-join
    on (band, key) — never the cartesian/nested-loop shape the exact
    all-pairs baseline uses."""
    from searty_spark.ann import cosine_dup_pairs, cosine_dup_pairs_lsh

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    lsh_plan = _plan(cosine_dup_pairs_lsh(emb, threshold=0.45, dim=64))
    assert "CartesianProduct" not in lsh_plan
    assert "BroadcastNestedLoopJoin" not in lsh_plan
    # sanity: the exact baseline IS the nested-loop shape (it's the oracle)
    exact_plan = _plan(cosine_dup_pairs(emb, threshold=0.45))
    assert "CartesianProduct" in exact_plan or "BroadcastNestedLoopJoin" in exact_plan


def test_segment_build_is_single_pass_no_join(spark, small_corpus):
    """The stats-free design's structural guarantee: the segment-build
    plan contains exactly ONE tokenize explode (Generate) and NO join —
    no dictionary/df pre-pass, one wide shuffle total."""
    from pyspark.sql import functions as F

    from searty_spark.segments import build_segments_from_tokens
    from searty_spark.tokenize import trigrams_col

    toks = small_corpus.select(
        "doc_id",
        F.greatest(F.char_length("text") - F.lit(2), F.lit(0)).cast("long").alias("doc_len"),
        F.posexplode(trigrams_col("text")).alias("pos", "term"),
    )
    plan = _plan(build_segments_from_tokens(toks, n_shards=2, n_buckets=4))
    tree = plan.split("\n\n")[0]
    assert tree.count("Generate") == 1  # exactly one tokenize explode
    assert "posexplode" in plan
    assert "Join" not in plan  # no dictionary/df join anywhere
    # one wide shuffle: the (shard, bucket) grouping for the encoder
    assert tree.count("Exchange") == 1


def test_corpus_filter_pushdown(spark, disk_index):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    q = docs.filter(F.col("doc_id") < 10).select("doc_id", "n_chars")
    plan = _plan(q)
    assert "LessThan(doc_id,10)" in plan
    assert "text" not in plan.split("ReadSchema", 1)[1][:200]


def test_phrase_bm25_restricts_scoring_to_match_docs(spark, small_corpus):
    """Ranked phrase search: the BM25 scoring side must be semi-joined
    down to the phrase-matching docs (LeftSemi in the plan) BEFORE the
    dstats join, and the top-k must be TakeOrderedAndProject — scoring
    work proportional to matches, not posting lists."""
    from searty_spark.query import phrase_bm25_topk

    p = build_postings(small_corpus)
    s = doc_stats(small_corpus)
    plan = _plan(phrase_bm25_topk(p, s, "shared phrase", k=10))
    assert "TakeOrderedAndProject" in plan
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_wand_query_never_reads_or_shuffles_positions(spark, disk_index):
    """The round-4 lesson, pinned: Catalyst cannot column-prune through
    mapInPandas, so wand_topk must project SCORE_COLS explicitly — the
    positions stream (pos_blob, often the index's largest column) must
    appear NOWHERE in a BM25 query plan: not in the parquet ReadSchema,
    not in the exchange. The regex candidate conjunction shares the
    contract."""
    from searty_spark.index import load_segments, load_stats
    from searty_spark.phrase_seg import docs_with_all_terms_segments
    from searty_spark.wand import wand_topk

    stats = load_stats(disk_index)
    seg = load_segments(spark, disk_index)
    q = wand_topk(
        seg, None, "shared", k=10,
        n_docs=stats["n_docs"], avgdl=stats["avgdl"], n_shards=2,
        df_lookup=spark.read.parquet(f"{disk_index}/dictionary"),
    )
    plan = _plan(q)
    assert "pos_blob" not in plan, plan
    plan2 = _plan(docs_with_all_terms_segments(seg, ["sha", "har"], n_shards=2))
    assert "pos_blob" not in plan2, plan2


def test_redact_pii_is_one_projection_no_shuffle(spark, small_corpus):
    """The PII scrub must stay a codegen'd projection over the scan —
    no Exchange, no Python."""
    from searty_spark.textops import redact_pii

    plan = _plan(redact_pii(small_corpus))
    # the only allowed Exchange is the rangepartitioning of the output
    # orderBy — the scrub itself must not hash-shuffle or hit Python
    assert "hashpartitioning" not in plan, plan
    assert plan.count("Exchange") <= 1 + plan.count("rangepartitioning"), plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_ngram_contamination_broadcasts_benchmark(spark, small_corpus):
    """Below the gram-count guard the benchmark set must be the
    broadcast side; ABOVE it the join must degrade to a shuffled hash
    join (never a multi-GB broadcast, never a cartesian)."""
    from pyspark.sql import functions as F

    from searty_spark.textops import ngram_contamination

    bench = small_corpus.filter(F.col("doc_id") % 13 == 0)
    plan = _plan(ngram_contamination(small_corpus, bench, n=5))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan

    big = _plan(ngram_contamination(small_corpus, bench, n=5, max_broadcast_grams=0))
    assert "CartesianProduct" not in big, big
    # the GRAM join specifically must not broadcast (the doc_id
    # assembly joins may — they're corpus-cardinality-bounded)
    gram_broadcasts = [
        ln for ln in big.splitlines() if "BroadcastHashJoin [gram" in ln
    ]
    assert not gram_broadcasts, big
    assert "ShuffledHashJoin" in big, big


def test_seen_store_lookup_prunes_buckets(spark, tmp_path):
    """The streaming re-crawl key store is hash-partitioned by
    kb = xxhash64(key) mod 64; a batch's lookup must reach the scan as
    a PartitionFilter and read only the batch's own buckets."""
    from searty_spark.streaming import (
        N_SEEN_KEY_BUCKETS,
        seen_store_append,
        seen_store_lookup,
    )

    store = str(tmp_path / "seen_keys")
    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("https://ex.com/"), F.col("id")).alias("url"),
    )
    seen_store_append(docs, store, "url")
    n_store_buckets = len(
        [p for p in __import__("pathlib").Path(store).iterdir() if p.name.startswith("kb=")]
    )
    assert n_store_buckets > N_SEEN_KEY_BUCKETS // 2  # store spans most buckets

    batch = docs.filter(F.col("doc_id") < 3)  # touches <= 3 buckets
    looked = seen_store_lookup(spark, store, batch, "url")
    plan = _plan(looked)
    # the bucket set must reach the scan as a PartitionFilter with <=3
    # literal values — partition pruning happens at file-listing time,
    # so this line IS the b-of-64-buckets IO guarantee
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "kb" in pf.group(1), plan
    in_list = re.search(r"kb#\d+ IN \(([^)]*)\)", pf.group(1))
    assert in_list and len(in_list.group(1).split(",")) <= 3, pf.group(1)
    # the slice holds the touched buckets' keys only (~3/64 of the
    # store), and every batch key is in it (anti-join correctness)
    got = {r["key"] for r in looked.collect()}
    assert {"https://ex.com/0", "https://ex.com/1", "https://ex.com/2"} <= got
    assert len(got) < 100


def test_substring_dedup_plan_shape(spark, small_corpus):
    """The substring-dedup spine is shuffle-joined on window text,
    never a pair-generating cartesian, and the corpus-wide window
    count runs with map-side partial aggregation (the property that
    collapses a hot template window per-partition BEFORE the
    exchange — the skew defence at 100 TB)."""
    from searty_spark.dedup import dup_spans

    plan = _plan(dup_spans(small_corpus, k=10))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_count" in plan  # map-side combine on the window groupBy

    from searty_spark.dedup import excise_duplicates

    eplan = _plan(excise_duplicates(small_corpus, k=10))
    assert "CartesianProduct" not in eplan
    assert "BroadcastNestedLoopJoin" not in eplan


def test_lm_score_plan_shape(spark, small_corpus):
    """The LM scoring spine is gram-keyed equi-joins + one doc_id agg:
    no cartesian, no nested-loop join, and the gram count aggregations
    run with map-side partial aggregation (hot function-word bigrams
    collapse per-partition before the exchange)."""
    from searty_spark.textops import lm_score

    plan = _plan(lm_score(small_corpus))
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan
