"""Explicit StructType schemas — the Spark analogue of the reference's
fixed declarative schema.sql (ref lib/database/schema.sql:1-72,
embedded via lib/database/schema.go:7-8). No inference anywhere."""

from __future__ import annotations

from pyspark.sql import types as T

# BASELINE.json input_hint corpus shape (plays the role of the
# reference's `document(id, filename, body)` table, schema.sql:1-8).
WEBPAGES = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("lang", T.StringType(), False),
    ]
)

# (term, doc_id, tf, positions) — the exploded posting rows
# (ref lib/invertedindex/postinglist.go:8-12, positions are token
# sequence indices per lib/indexer/indexer.go:89).
POSTINGS = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("tf", T.IntegerType(), False),
        T.StructField("positions", T.ArrayType(T.IntegerType(), False), False),
    ]
)

# term dictionary (ref `token` table, schema.sql:10-17) — dense long
# ids instead of UUID strings (SURVEY.md §1.1).
DICTIONARY = T.StructType(
    [
        T.StructField("term", T.StringType(), False),
        T.StructField("token_id", T.LongType(), False),
    ]
)

# per-document stats needed by BM25 (the reference keeps none — no
# scorer; SURVEY.md §2.6).
DOC_STATS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("doc_len", T.LongType(), False),
    ]
)

# compressed docID-sorted segment rows, the analogue of the
# `inverted_index(token_id, posting_list BLOB)` table
# (ref schema.sql:19-23) extended with df/cf + block-max metadata for
# WAND pruning (north rule). The DDL-string form actually used by the
# encoder lives in segments.SEGMENT_SCHEMA (kept as one source of
# truth for applyInPandas).
SEGMENTS = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("df", T.LongType(), False),
        T.StructField("cf", T.LongType(), False),
        T.StructField("blob", T.BinaryType(), False),
        T.StructField("pos_blob", T.BinaryType(), False),
        T.StructField("block_last_doc", T.ArrayType(T.LongType(), False), False),
        T.StructField("block_max_tf", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("block_min_dl", T.ArrayType(T.LongType(), False), False),
        T.StructField("block_offset", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("pos_block_offset", T.ArrayType(T.IntegerType(), False), False),
    ]
)

# per-partition build checkpoint/lineage rows (north rule: resumable,
# per-stage metrics; analogue of the reference's single-tx commit,
# ref lib/database/database.go:79-105).
CHECKPOINT = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("n_terms", T.LongType(), False),
        T.StructField("n_postings", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("wall_sec", T.DoubleType(), False),
        T.StructField("lineage", T.StringType(), False),
    ]
)

# embedding rows for the ANN surface — the testdata
# embeddings.parquet shape (vec_id, float vector, class label).
EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType(), False), False),
        T.StructField("label", T.IntegerType(), True),
    ]
)
