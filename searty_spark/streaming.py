"""Structured Streaming twins of the batch event operators.

The reference has no streaming surface (SURVEY.md §2.6); these exist
for the training-pipeline tier: incremental ingestion of event/corpus
streams with watermarked windows. Tested with the file source +
``processAllAvailable`` so a batch of parquet rows drives the stream
to completion synchronously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    from pathlib import Path

    # the file stream source requires a directory (or glob) whose
    # parent becomes basePath; a single-file path is turned into the
    # glob that matches exactly it so callers can stream one parquet
    # file without copying it into a directory first. The trick is only
    # safe when the path contains no glob metacharacters of its own —
    # Spark would expand those and match a different file.
    if Path(path).is_file():
        if any(c in path for c in "*?[]{}"):
            raise ValueError(
                "single-file stream paths must not contain glob "
                f"metacharacters ({path!r}) — move the file into its own "
                "directory and stream that"
            )
        path = f"{path[:-1]}[{path[-1]}]"
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path).withColumn("ts", F.col("ts").cast("timestamp"))


def windowed_counts_stream(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts with late-data watermark — the streaming
    twin of events.windowed_counts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


N_SEEN_KEY_BUCKETS = 64


def _seen_bucket_col(key_col: str):
    # same xxhash64 discipline as segment buckets (index.py); pmod so
    # negative hashes land in [0, n)
    return F.pmod(F.xxhash64(F.col(key_col)), F.lit(N_SEEN_KEY_BUCKETS)).cast("int")


def seen_store_append(
    df: DataFrame, seen_dir: str, doc_key: str = "url"
) -> None:
    """Append this batch's distinct keys to the persistent seen-keys
    store, hash-partitioned by ``kb = xxhash64(key) mod 64`` so later
    lookups prune to the buckets they actually touch."""
    (
        df.select(F.col(doc_key).alias("key"))
        .distinct()
        .withColumn("kb", _seen_bucket_col("key"))
        .write.mode("append")
        .partitionBy("kb")
        .parquet(seen_dir)
    )


def seen_store_lookup(
    spark: SparkSession, seen_dir: str, batch: DataFrame, doc_key: str = "url"
) -> DataFrame:
    """The store slice relevant to this batch: only the partitions the
    batch's own keys hash into are read. The batch's bucket set is
    collected (bounded by N_SEEN_KEY_BUCKETS=64 values, a driver-side
    triviality) and pushed as a LITERAL isin filter on the partition
    column — static partition pruning, visible as PartitionFilters in
    the scan, so a batch touching b of 64 buckets reads b/64 of the
    store regardless of how many keys the store holds."""
    buckets = [
        r["kb"]
        for r in batch.select(_seen_bucket_col(doc_key).alias("kb"))
        .distinct()
        .collect()
    ]
    store = spark.read.parquet(seen_dir)
    if "kb" not in store.columns:
        # a pre-bucketing store (plain key-only parquet, written before
        # the kb= partitioning existed) — fail fast with the remedy
        # instead of an unresolved-column error mid-stream (ADVICE r6);
        # same policy as stats.json's format stamp
        raise ValueError(
            f"seen-keys store at {seen_dir} has no kb= hash-bucket "
            "partitioning (pre-bucketing layout); rebuild it by replaying "
            "seen_store_append over the keys (read the old store's key "
            "column and append it to a fresh directory)"
        )
    return store.filter(F.col("kb").isin(buckets)).select("key")


def incremental_index_stream(
    spark: SparkSession,
    corpus_stream_dir: str,
    work_dir: str,
    n_shards: int = 4,
    n_buckets: int = 8,
    dedup_recrawl: bool = False,
    doc_key: str = "url",
) -> list[str]:
    """Streaming ingestion of a webpages corpus: every micro-batch is
    indexed into its own partial index (the map phase of SURVEY.md
    §3.2), which the hierarchical merge then reduces — exactly the
    reference's per-system-DB -> searty-merge topology, driven by
    Structured Streaming. Returns the partial index dirs (pass them to
    merge.merge_indexes). Batches must carry disjoint doc_id ranges
    (true for append-only crawls).

    ``dedup_recrawl=True`` adds cross-batch re-crawl detection: a
    persistent key store (``<work_dir>/seen_keys``, one row per
    already-indexed ``doc_key``, hash-partitioned into
    ``n_key_buckets`` directories by xxhash64(key) — the same bucket
    discipline as the segment store) is consulted per micro-batch and
    re-crawled documents are dropped (keep-FIRST, matching
    merge(dedup_docs=True) semantics) before indexing, so the partials
    stay key-disjoint and the plain blob-space merge applies. The
    per-batch lookup reads ONLY the store buckets the batch's own keys
    hash into (static partition pruning via an isin filter on the
    partition column — see seen_store_lookup), so batch cost scales
    with batch-key coverage, not store size. Within a batch, duplicate
    keys keep the lowest doc_id. foreachBatch runs batches
    sequentially, so read-then-append on the key store is race-free;
    at fleet scale the bucketed store plays the role of a state-store
    front on the crawl frontier."""
    from pathlib import Path

    from pyspark.sql import Window

    from searty_spark.index import write_index
    from searty_spark.schema import WEBPAGES

    dirs: list[str] = []
    seen_dir = f"{work_dir}/seen_keys"

    def per_batch(df: DataFrame, epoch_id: int) -> None:
        if df.isEmpty():
            return
        d = f"{work_dir}/batch_{epoch_id}"
        if dedup_recrawl:
            w = Window.partitionBy(doc_key).orderBy("doc_id")
            df = (
                df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
            if Path(seen_dir).exists():
                seen = seen_store_lookup(spark, seen_dir, df, doc_key)
                df = df.join(
                    seen, df[doc_key] == seen["key"], "left_anti"
                )
            # land the cleaned batch before indexing: breaks the lazy
            # self-reference with the key store we append to below, and
            # is what a production pipeline does anyway (the cleaned
            # batch is itself a deliverable)
            clean = f"{work_dir}/batch_{epoch_id}_corpus"
            df.write.mode("overwrite").parquet(clean)
            df = spark.read.parquet(clean)
            if df.isEmpty():
                return
        write_index(df, d, n_shards=n_shards, n_buckets=n_buckets, resume=False)
        if dedup_recrawl:
            seen_store_append(df, seen_dir, doc_key)
        dirs.append(d)

    q = (
        spark.readStream.schema(WEBPAGES)
        .option("maxFilesPerTrigger", 1)
        .parquet(corpus_stream_dir)
        .writeStream.foreachBatch(per_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return dirs


def run_stream_to_memory(stream_df: DataFrame, name: str) -> DataFrame:
    """Drive a bounded file-backed stream to completion; return results."""
    q = (
        stream_df.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


def sessionize_stream(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Stateful streaming sessionization via ``applyInPandasWithState``
    — the custom-stateful-operator shape Structured Streaming can't
    express with built-in windowed aggs (session identity depends on
    the PREVIOUS event's time, so per-user state must persist across
    micro-batches).

    Per user the state is (last_ts_epoch, n_sessions, n_events); each
    micro-batch folds its events in (ts, event_id) order into the
    state and emits the user's updated running totals (output mode
    "update": the LAST row per user is the answer so far). With the
    whole stream drained, the emitted totals equal the batch
    ``events.sessionize`` exactly (tested). Assumes batches arrive in
    non-decreasing time order per user (true for append-only event
    logs); within a batch order is irrelevant — rows are sorted.

    The in-state fold is vectorized: one diff + compare per batch, no
    per-event Python.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap = gap_minutes * 60.0

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        last_ts, n_sess, n_ev = state.get if state.exists else (None, 0, 0)
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            rows = pd.concat(chunks).sort_values(["ts", "event_id"])
            # truncate to whole epoch seconds — the batch twin compares
            # cast-to-long seconds, so sub-second timestamps must not
            # flip a gap decision here either
            ts = (
                np.floor(rows["ts"].map(pd.Timestamp.timestamp).to_numpy())
                if len(rows)
                else np.empty(0)
            )
            # first-ever event compares against -inf -> diff is +inf,
            # which is > gap, so it opens session 1 with no special case
            prev = np.concatenate([[last_ts if last_ts is not None else -np.inf], ts[:-1]])
            n_sess += int((ts - prev > gap).sum())
            n_ev += int(ts.size)
            last_ts = float(ts[-1]) if ts.size else last_ts
            state.update((last_ts, int(n_sess), int(n_ev)))
        yield pd.DataFrame(
            {"user_id": [user_id], "n_sessions": [n_sess], "n_events": [n_ev]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id long, n_sessions long, n_events long",
        stateStructType="last_ts double, n_sessions long, n_events long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def incremental_ann_stream(
    spark: SparkSession,
    emb_stream_dir: str,
    index_dir: str,
    n_cells: int = 32,
    n_iter: int = 2,
    sample: int = 4096,
    m: int = 8,
    pq_k: int = 16,
    checkpoint_dir: str | None = None,
) -> dict:
    """Streaming ingestion for the ANN artifact — the embedding-side
    twin of incremental_index_stream. The FIRST micro-batch bootstraps
    the index (trains IVF centroids + PQ codebooks on a bounded sample
    of that batch and writes it); every later batch encodes under the
    now-FROZEN codebooks and appends its rows to the cell partitions
    (ann_index.append_ann_index — exact, cost scales with the batch).
    No compaction tier is needed, unlike the text index: an append IS
    already the merged artifact (same-codebook merge is partition
    concat, so there is nothing to re-encode later).

    Freezing at the first batch is the standard streaming-ANN
    trade-off: codebooks trained on an early sample can drift from the
    eventual distribution, which degrades RECALL (probe/ADC quality),
    never correctness of what a query returns for the stored codes —
    when drift matters, retrain offline and rebuild (write_ann_index),
    exactly like the reference's build-once topology. Batches must
    carry disjoint vec_id ranges (append enforces this with a
    fail-fast check). foreachBatch runs batches sequentially, so
    bootstrap-then-append is race-free. Returns the final stats dict.

    The stream checkpoints to ``<index_dir>.stream_ckpt`` (override
    with ``checkpoint_dir``): a LATER invocation over the same source
    dir resumes from the file-source log and ingests only files that
    arrived since — without it, every re-run would replay file 0 and
    die on append's duplicate-vec_id check.
    """
    from pathlib import Path

    from searty_spark.ann_index import append_ann_index, write_ann_index
    from searty_spark.schema import EMBEDDINGS

    def per_batch(df: DataFrame, epoch_id: int) -> None:
        if df.isEmpty():
            return
        # the epoch id is stable across checkpoint replays, so tagging
        # each batch makes BOTH halves of the crash window idempotent:
        # crash before the manifest commit -> the replay overwrites the
        # orphan dir; crash after the commit but before the stream's
        # checkpoint commit -> the tag is already in the manifest and
        # the replay is a no-op (no duplicate-vec_id fail-fast wedge)
        tag = f"epoch-{epoch_id}"
        if not Path(index_dir, "ann_stats.json").exists():
            write_ann_index(
                df, index_dir, n_cells=n_cells, n_iter=n_iter,
                sample=sample, m=m, pq_k=pq_k, batch_tag=tag,
            )
        else:
            import json as _json

            stats = _json.loads(Path(index_dir, "ann_stats.json").read_text())
            if tag in stats.get("batch_tags", {}):
                return  # replay of a committed batch (incl. bootstrap)
            append_ann_index(df, index_dir, batch_tag=tag)

    q = (
        spark.readStream.schema(EMBEDDINGS)
        .option("maxFilesPerTrigger", 1)
        .parquet(emb_stream_dir)
        .writeStream.foreachBatch(per_batch)
        .option("checkpointLocation", checkpoint_dir or f"{index_dir}.stream_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    import json

    return json.loads((Path(index_dir) / "ann_stats.json").read_text())
