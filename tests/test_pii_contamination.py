"""PII scrub and decontamination properties.

The scrub's contract is CLOSURE: after the sequential pattern passes,
no PII pattern matches the output. Layer 1 proves it over random
adversarial text with a pure-Python `re` twin (hypothesis, 300
examples — the patterns use only ASCII classes, so Python/Java/RE2
agree); layer 2 binds the Spark implementation to that twin on a
deterministic adversarial batch in ONE job (engine parity: the JVM
regexp must produce byte-identical output and the same counts).
"""

import random
import re

import pytest
from pyspark.sql import functions as F

from searty_spark.textops import PII_PATTERNS, ngram_contamination, redact_pii


def _py_redact(text: str) -> tuple[str, int]:
    """The pure-Python twin of textops.redact_pii: counts on the
    ORIGINAL text per pattern, replacements applied sequentially."""
    n = sum(len(re.findall(pat, text)) for _, pat, _ in PII_PATTERNS)
    for _, pat, repl in PII_PATTERNS:
        text = re.sub(pat, repl, text)
    return text, n


PII_SNIPPETS = [
    "bob.smith+x@mail-host.co.uk", "a@b.cc", "http://x.y/z?a=b@c.d",
    "https://e.f/%20g", "10.0.0.1", "255.255.255.255", "1.2.3.4.5.6.7.8",
    "+1 555-000-1234", "+491 711 234567", "12http://x.com3.4.5.6",
    "1.2.3.a@b.co4.5.6.7", "http://u:p@h.i/j", "a@b.c", "@nouser",
    "http:/notaurl", "999.1.2.3", "+12", "call+12 3456-789 now",
]


def test_scrub_closure_property():
    """Hypothesis: for any generated text, the sequential scrub leaves
    NO pattern matching (replacement splices never re-create PII)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    frag = st.one_of(
        st.text(alphabet="abz 019.@:/+-<>", max_size=12),
        st.sampled_from(PII_SNIPPETS),
    )
    texts = st.lists(frag, min_size=0, max_size=6).map(" ".join)

    @settings(max_examples=300, deadline=None)
    @given(texts)
    def check(text):
        clean, _ = _py_redact(text)
        for name, pat, _ in PII_PATTERNS:
            assert re.search(pat, clean) is None, (name, text, clean)

    check()


def test_spark_scrub_matches_python_twin(spark):
    """One batch job: Spark redact_pii == the Python twin byte-for-byte
    on a deterministic adversarial corpus, and no pattern survives."""
    rng = random.Random(1234)
    words = ["data", "a@b", "10.1", "http", "://", "+12", "x.co", "<URL>"]
    texts = []
    for i in range(120):
        parts = [rng.choice(words + PII_SNIPPETS) for _ in range(rng.randint(1, 10))]
        texts.append(" ".join(parts))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_redactions"])
        for r in redact_pii(df).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == _py_redact(t), (i, t)
    # closure, asserted Spark-side too
    residual = F.lit(0)
    for _, pat, _ in PII_PATTERNS:
        residual = residual + F.size(
            F.regexp_extract_all(F.col("clean_text"), F.lit(pat), F.lit(0))
        )
    assert (
        redact_pii(df).select(residual.alias("r")).agg(F.sum("r")).collect()[0][0] == 0
    )


def test_contamination_properties(spark, small_corpus):
    """(a) bench == corpus -> every doc with at least one n-gram is
    contaminated by itself; (b) disjoint-vocabulary bench contaminates
    nothing; (c) n_contaminated <= n_ngrams always."""
    full = ngram_contamination(small_corpus, small_corpus, n=5).collect()
    for r in full:
        assert r["n_contaminated"] <= r["n_ngrams"], r
        assert r["contaminated"] == (r["n_ngrams"] > 0), r

    foreign = small_corpus.select(
        "doc_id", F.lit("zzq wwk vvj uuh tty rre qqw eer rrt yyu").alias("text")
    )
    none = ngram_contamination(small_corpus, foreign, n=5)
    assert none.filter(F.col("contaminated")).count() == 0


def test_contamination_short_docs_have_zero_ngrams(spark):
    df = spark.createDataFrame(
        [(0, "one two three four"), (1, "a b c d e"), (2, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in ngram_contamination(df, df, n=5).collect()}
    assert rows[0]["n_ngrams"] == 0 and not rows[0]["contaminated"]
    assert rows[1]["n_ngrams"] == 1 and rows[1]["contaminated"]
    # empty string splits to [''] -> 1 token -> 0 grams
    assert rows[2]["n_ngrams"] == 0 and not rows[2]["contaminated"]


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_lm_score_hand_computed(spark):
    """Laplace bigram LM against hand math: c2/c1/V from a 3-doc
    corpus, sub-2-token docs omitted."""
    import math

    from searty_spark.textops import lm_score

    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b"), (2, "z")], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_logprob"]) for r in lm_score(docs).collect()}
    # c1: a=3 b=3 z=1; V=3; c2: (a,b)=3 (b,a)=1
    p_ab = math.log((3 + 1) / (3 + 3))
    p_ba = math.log((1 + 1) / (3 + 3))
    assert got == {
        0: (3, round((2 * p_ab + p_ba) / 3, 6)),
        1: (1, round(p_ab, 6)),
    }  # doc 2 has no bigram and is omitted
