"""Capture .explain('formatted') for the round-7-touched queries into
plans/<tag>/<name>_<suffix>.txt. Runs against an arbitrary source tree
(--tree), so the same script produces the before (round-start worktree)
and after (current tree) captures the judge compares.

Usage: python scripts/capture_plans.py --tree DIR --suffix before|after \
           [--plans-dir DIR] [op ...]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import sys
from pathlib import Path

ALL_OPS = [
    "ann_dup_lsh", "minhash_dedup", "substring_excise", "dup_spans",
    "lm_doc_scores", "ngram_contamination", "simhash_pairs",
    "prepare_corpus", "dedup_clusters", "clean_corpus", "jaccard_pairs",
    "phrase_ranges_df", "bm25_df", "postings_build", "ngram_counts",
    "top_terms_tfidf", "quality_gopher", "token_count_bpe",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree", default=str(Path(__file__).resolve().parent.parent))
    ap.add_argument("--suffix", required=True)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--sf-dir", default="/root/testdata/sf1.0")
    ap.add_argument("ops", nargs="*", default=None)
    args = ap.parse_args()
    tree = str(Path(args.tree).resolve())
    sys.path.insert(0, tree)

    from searty_spark.session import get_spark  # noqa: E402

    spark = get_spark(cpus=8, app_name="capture_plans")

    from pyspark.sql import functions as F  # noqa: E402

    from searty_spark import ann, dedup, textops  # noqa: E402
    from searty_spark.build import build_postings, doc_stats  # noqa: E402
    from searty_spark.pipeline import clean_corpus, prepare_training_corpus  # noqa: E402
    from searty_spark.query import bm25_topk, phrase_match_ranges  # noqa: E402

    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")

    def df_for(op):
        if op == "ann_dup_lsh":
            return ann.cosine_dup_pairs_lsh(emb, threshold=0.45, dim=64)
        if op == "minhash_dedup":
            return dedup.minhash_lsh_pairs(docs, threshold=0.2)
        if op == "substring_excise":
            return dedup.excise_duplicates(docs, k=10)
        if op == "dup_spans":
            return dedup.dup_spans(docs, k=10)
        if op == "lm_doc_scores":
            return textops.lm_score(docs)
        if op == "ngram_contamination":
            bench = docs.filter(F.col("doc_id") % 13 == 0)
            return textops.ngram_contamination(docs, bench, n=5)
        if op == "simhash_pairs":
            return dedup.simhash_pairs(docs)
        if op == "prepare_corpus":
            bench = docs.filter(F.col("doc_id") % 13 == 0)
            return prepare_training_corpus(docs, bench)
        if op == "dedup_clusters":
            return dedup.dup_clusters(docs, threshold=0.2)
        if op == "clean_corpus":
            return clean_corpus(docs)
        if op == "jaccard_pairs":
            return dedup.jaccard_pairs(docs, threshold=0.2)
        if op == "phrase_ranges_df":
            return phrase_match_ranges(build_postings(docs), "spark table")
        if op == "bm25_df":
            return bm25_topk(build_postings(docs), doc_stats(docs), "spark join", k=10)
        if op == "postings_build":
            return build_postings(docs)
        if op == "ngram_counts":
            return textops.ngram_counts(docs, n=2)
        if op == "top_terms_tfidf":
            return textops.top_terms_tfidf(docs, k=3)
        if op == "quality_gopher":
            return textops.quality_gopher(docs)
        if op == "token_count_bpe":
            return textops.token_count_bpe(docs)
        raise SystemExit(f"unknown op {op}")

    pdir = Path(args.plans_dir or (Path(__file__).resolve().parent.parent / "plans" / "r07"))
    pdir.mkdir(parents=True, exist_ok=True)
    for op in args.ops or ALL_OPS:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df_for(op).explain("formatted")
        (pdir / f"{op}_{args.suffix}.txt").write_text(buf.getvalue())
        print("captured", op)


if __name__ == "__main__":
    main()
