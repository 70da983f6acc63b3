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


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .parquet(path)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def windowed_counts_stream(events: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window counts with late-data watermark — the streaming
    twin of events.windowed_counts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def incremental_index_stream(
    spark: SparkSession,
    corpus_stream_dir: str,
    work_dir: str,
    n_shards: int = 4,
    n_buckets: int = 8,
) -> list[str]:
    """Streaming ingestion of a webpages corpus: every micro-batch is
    indexed into its own partial index (the map phase of SURVEY.md
    §3.2), which the hierarchical merge then reduces — exactly the
    reference's per-system-DB -> searty-merge topology, driven by
    Structured Streaming. Returns the partial index dirs (pass them to
    merge.merge_indexes). Batches must carry disjoint doc_id ranges
    (true for append-only crawls)."""
    from searty_spark.index import write_index
    from searty_spark.schema import WEBPAGES

    dirs: list[str] = []

    def per_batch(df: DataFrame, epoch_id: int) -> None:
        if df.isEmpty():
            return
        d = f"{work_dir}/batch_{epoch_id}"
        write_index(df, d, n_shards=n_shards, n_buckets=n_buckets, resume=False)
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
