"""searty_spark — a from-scratch PySpark-native rebuild of the
capabilities of cxxxr/searty (reference at /root/reference), extended
to a web-scale BM25 engine per BASELINE.json's north rule.

Pipeline:  corpus (url, warc_ts, html, text, lang)
        →  tokenize (char trigrams, JVM-side SQL expressions)
        →  postings (token_id, doc_id, tf, positions)
        →  delta+varbyte docID-sorted segments with block-max metadata
        →  hierarchical merge
        →  top-k BM25 (block-max WAND) + positional phrase queries.

Everything is DataFrame/SQL-first; Python appears only inside
vectorized Arrow UDFs (codec encode/decode, WAND inner loop).
"""

__version__ = "0.1.0"

NGRAM_N = 3  # character trigrams, ref lib/tokenizer/tokenizer.go:9-29

# BM25 constants (the reference has no scorer; SURVEY.md §2.6 defines
# the oracle: Okapi BM25 with Lucene-style idf).
BM25_K1 = 1.2
BM25_B = 0.75
SCORE_NDIGITS = 6  # cross-engine deterministic ranking (SURVEY.md §7 hard part a)
