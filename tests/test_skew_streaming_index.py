"""Head-term skew boundedness + streaming incremental indexing."""

import datetime

import numpy as np
from pyspark.sql import functions as F

from searty_spark.build import build_postings, doc_stats
from searty_spark.schema import WEBPAGES
from searty_spark.segments import build_segments


def _hot_corpus(spark, n_docs=200):
    """Every doc starts with the same hot phrase -> 'hot' trigrams have
    df == n_docs (the Zipf head case)."""
    rows = [
        (
            i,
            f"https://h/{i}",
            datetime.datetime(2024, 1, 1),
            b"<p>x</p>",
            "hothothot filler" + f" w{i % 7} w{(i * 3) % 11}",
            "en",
        )
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, WEBPAGES)


def test_head_term_postings_split_across_shards(spark):
    """The shard dimension IS the skew salt: a term with df == N never
    produces a segment row larger than ~N/n_shards (north rule: skew
    handled explicitly — no single reducer sees a hot term's full
    posting list)."""
    n_docs, n_shards = 200, 8
    corpus = _hot_corpus(spark, n_docs)
    seg = build_segments(
        build_postings(corpus, with_doc_len=True),
        doc_stats(corpus),
        n_shards=n_shards,
        n_buckets=4,
    )
    hot = seg.filter(F.col("term") == "hot").collect()
    assert len(hot) == n_shards  # split across every shard
    assert sum(r["df"] for r in hot) == n_docs
    assert max(r["df"] for r in hot) <= int(np.ceil(n_docs / n_shards)) + 2


def test_encode_group_sizes_bounded_on_zipf(spark, small_corpus):
    """On the Zipf synthetic corpus, no (shard, bucket) encode group
    dominates: max group posting count stays within a small factor of
    the mean (hash keys are uniform by construction)."""
    p = build_postings(small_corpus, with_doc_len=True)
    sizes = (
        p.groupBy(
            F.pmod(F.col("doc_id"), F.lit(4)).alias("shard"),
            F.pmod(F.xxhash64("term"), F.lit(8)).alias("bucket"),
        )
        .count()
        .collect()
    )
    counts = [r["count"] for r in sizes]
    assert max(counts) <= 4 * (sum(counts) / len(counts))


def test_streaming_incremental_index_equals_single_shot(spark, tmp_path):
    """foreachBatch partial indexes + hierarchical merge == single-shot
    build over the whole corpus (the reference's per-system-DB ->
    searty-merge topology driven by Structured Streaming)."""
    from searty_spark.corpus import synth_corpus
    from searty_spark.index import load_segments, write_index
    from searty_spark.merge import merge_indexes
    from searty_spark.streaming import incremental_index_stream

    corpus = synth_corpus(spark, 80, seed=42).cache()
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    # two files -> two micro-batches with disjoint doc_id ranges
    corpus.filter(F.col("doc_id") < 40).coalesce(1).write.parquet(
        str(stream_dir / "f0"), mode="overwrite"
    )
    corpus.filter(F.col("doc_id") >= 40).coalesce(1).write.parquet(
        str(stream_dir / "f1"), mode="overwrite"
    )
    # file source reads a flat dir: move part files up
    import shutil

    for sub in ["f0", "f1"]:
        for f in (stream_dir / sub).glob("part-*.parquet"):
            shutil.move(str(f), str(stream_dir / f"{sub}.parquet"))
        shutil.rmtree(stream_dir / sub)

    dirs = incremental_index_stream(
        spark, str(stream_dir), str(tmp_path / "partial"), n_shards=2, n_buckets=4
    )
    assert len(dirs) == 2
    merged_dir = str(tmp_path / "merged")
    merge_indexes(spark, dirs, merged_dir)

    single_dir = str(tmp_path / "single")
    write_index(corpus, single_dir, n_shards=2, n_buckets=4)

    def content(d):
        return {
            (r["shard"], r["term"]): (r["df"], bytes(r["blob"]), bytes(r["pos_blob"]))
            for r in load_segments(spark, d).collect()
        }

    assert content(merged_dir) == content(single_dir)


def test_streaming_recrawl_dedup_equals_single_shot(spark, tmp_path):
    """Cross-batch incremental dedup: a re-crawled url landing in a
    later micro-batch (under a new doc_id) is detected against the
    persistent seen-keys store and dropped (keep-first), so the
    compacted index equals the single-shot build over the
    union-minus-duplicates corpus — byte-identical."""
    from searty_spark.corpus import synth_corpus
    from searty_spark.index import load_segments, write_index
    from searty_spark.merge import merge_indexes
    from searty_spark.streaming import incremental_index_stream

    corpus = synth_corpus(spark, 70, seed=42).cache()
    a = corpus.filter(F.col("doc_id") < 40)
    # re-crawl of docs 30..69 under new doc_ids (urls 30..39 duplicated)
    b = corpus.filter(F.col("doc_id") >= 30).withColumn(
        "doc_id", F.col("doc_id") + 1000
    )
    stream_dir = tmp_path / "stream"
    stream_dir.mkdir()
    import shutil
    import time

    for name, df in (("f0", a), ("f1", b)):
        df.coalesce(1).write.parquet(str(stream_dir / name), mode="overwrite")
        for f in (stream_dir / name).glob("part-*.parquet"):
            shutil.move(str(f), str(stream_dir / f"{name}.parquet"))
        shutil.rmtree(stream_dir / name)
        time.sleep(1.1)  # distinct mtimes -> deterministic batch order

    dirs = incremental_index_stream(
        spark, str(stream_dir), str(tmp_path / "partial"),
        n_shards=2, n_buckets=4, dedup_recrawl=True,
    )
    assert len(dirs) == 2
    merged_dir = str(tmp_path / "merged")
    merge_indexes(spark, dirs, merged_dir)  # plain merge: keys disjoint

    single = a.unionByName(b.filter(F.col("doc_id") >= 1040))
    single_dir = str(tmp_path / "single")
    write_index(single, single_dir, n_shards=2, n_buckets=4)

    def content(d):
        return {
            (r["shard"], r["term"]): (r["df"], bytes(r["blob"]), bytes(r["pos_blob"]))
            for r in load_segments(spark, d).collect()
        }

    assert content(merged_dir) == content(single_dir)

    # replaying the SAME stream against the SAME work_dir: every doc is
    # now a known key, so nothing is indexed at all
    more = incremental_index_stream(
        spark, str(stream_dir), str(tmp_path / "partial"),
        n_shards=2, n_buckets=4, dedup_recrawl=True,
    )
    assert more == []
