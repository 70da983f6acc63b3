"""Deterministic synthetic web-page corpus (FIXTURES.md §1).

Plays the role of the reference's Quicklisp source corpus
(scripts/download-repos.sh + spec files). Generated distributed via
``mapInPandas`` over ``spark.range`` — per-doc determinism comes from
seeding numpy with ``seed + doc_id``, so the corpus is identical for
any partitioning / parallelism (required for the local[8] vs local[32]
scaling comparison and for resume tests).

Schema = BASELINE.json input_hint: (url, warc_ts, html, text, lang)
plus our dense ``doc_id``. Invariant: ``text`` is byte-identically
recoverable from ``html`` (see extract.py).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from searty_spark.schema import WEBPAGES

VOCAB_SIZE = 2000
ZIPF_S = 1.07
_EPOCH = np.datetime64("2024-01-01T00:00:00")

# multibyte (hiragana) alphabet for the 'ja' slice — exercises the
# reference's multibyte trigram case (lib/tokenizer/tokenizer_test.go:19-22)
_HIRAGANA = [chr(c) for c in range(0x3042, 0x3094)]


def _make_vocab(seed: int = 42) -> list[str]:
    """Deterministic ~2k-word vocabulary of 3-8 lowercase-letter words."""
    rng = np.random.default_rng(seed)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab: list[str] = []
    seen: set[str] = set()
    while len(vocab) < VOCAB_SIZE:
        ln = int(rng.integers(3, 9))
        w = "".join(rng.choice(letters, ln))
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return vocab


def _zipf_probs(n: int, s: float = ZIPF_S) -> np.ndarray:
    ranks = np.arange(1, n + 1, dtype=np.float64)
    p = ranks**-s
    return p / p.sum()


def _doc_text(rng: np.random.Generator, vocab: list[str], probs: np.ndarray, lang: str) -> str:
    n_tokens = int(rng.integers(20, 401))
    if lang == "ja":
        chars = rng.choice(len(_HIRAGANA), n_tokens)
        return "".join(_HIRAGANA[i] for i in chars)
    idx = rng.choice(len(vocab), n_tokens, p=probs)
    return " ".join(vocab[i] for i in idx)


def html_wrap(title: str, text: str) -> bytes:
    return (
        f"<html><head><title>{title}</title></head><body><p>{text}</p></body></html>"
    ).encode("utf-8")


def synth_corpus(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    vocab = _make_vocab(seed)
    probs = _zipf_probs(len(vocab))
    parts = partitions or max(spark.sparkContext.defaultParallelism, 2)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id in pdf["id"].to_numpy():
                doc_id = int(doc_id)
                rng = np.random.default_rng(seed + doc_id)
                lang = "ja" if rng.random() < 0.05 else "en"
                if doc_id == 0:
                    text = "ab"  # sub-trigram doc: tokenizes to [] (ref tokenizer.go:22-24)
                elif doc_id == 1:
                    # repeated overlapping phrase -> range-coalescing path
                    text = "abcabcabc shared phrase marker"
                elif doc_id == 2:
                    text = "shared phrase marker " + _doc_text(rng, vocab, probs, "en")
                else:
                    text = _doc_text(rng, vocab, probs, lang)
                url = f"https://example{doc_id % 97}.org/p/{doc_id:08d}"
                rows.append(
                    (
                        doc_id,
                        url,
                        (_EPOCH + np.timedelta64(doc_id, "s")).item(),
                        html_wrap(f"doc {doc_id}", text),
                        text,
                        lang,
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "url", "warc_ts", "html", "text", "lang"]
            )

    return spark.range(0, n_docs, numPartitions=parts).mapInPandas(gen, WEBPAGES)
