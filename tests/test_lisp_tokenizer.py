"""Golden cases ported verbatim from the reference's behavioral spec
/root/reference/tests/lisp-tokenizer.lisp:11-110 (the test there checks
term + position; the :KIND annotations are asserted here too for the
cases that carry them)."""

import pytest

from searty_spark.lisp_tokenizer import lisp_token_rows, lisp_tokenize


def tp(toks):
    return [(t, p) for t, p, _ in toks]


GOLDENS = [
    ("foo", [("foo", 0)]),
    ("   foo", [("foo", 3)]),
    ("'foo", [("'", 0), ("foo", 1)]),
    ("'(xyz)", [("'", 0), ("(", 1), ("xyz", 2), (")", 5)]),
    (
        "(cons car cdr)",
        [("(", 0), ("cons", 1), ("car", 6), ("cdr", 10), (")", 13)],
    ),
    ("|f  \\|oo| xxx", [("|f  \\|oo|", 0), ("xxx", 10)]),
    ('"abcd"', [('"abcd"', 0)]),
    ('"foo\\"xbar"', [('"foo\\"xbar"', 0)]),
    ("#:\\|", [("\\|", 0)]),
    ("foo; comment\n", [("foo", 0), (" comment", 3)]),
    ("foo;\n", [("foo", 0), ("", 3)]),
    ("foo;comment\n", [("foo", 0), ("comment", 3)]),
    ("foo;comment\nbar", [("foo", 0), ("comment", 3), ("bar", 12)]),
    ("#\\space", [("space", 0)]),
    ("#\\'", [("'", 0)]),
    ("#'car", [("car", 0)]),
    (
        "#'(lambda ())",
        [("#'", 0), ("(", 2), ("lambda", 3), ("(", 10), (")", 11), (")", 12)],
    ),
    ("#(abc)", [("#(", 0), ("abc", 2), (")", 5)]),
    ("#:foo", [("foo", 0)]),
    ("#| foo #||# |#", [(" foo #||# ", 0)]),
    (
        "#1=(x y z)",
        [("#1=", 0), ("(", 3), ("x", 4), ("y", 6), ("z", 8), (")", 9)],
    ),
    ("abc あいうえお xyz", [("abc", 0), ("あいうえお", 4), ("xyz", 10)]),
    ("#|#|foo|#|#", [("#|foo|#", 0)]),
]


@pytest.mark.parametrize("text,expected", GOLDENS, ids=[g[0][:20] for g in GOLDENS])
def test_golden(text, expected):
    assert tp(lisp_tokenize(text)) == expected


KINDS = [
    ("#:\\|", ["UNINTERN_SYMBOL"]),
    ("foo; comment\n", ["SYMBOL", "LINE_COMMENT"]),
    ("#\\space", ["CHARACTER"]),
    ("#'car", ["FUNCTION_OBJECT"]),
    ("#'(lambda ())", ["T", "T", "SYMBOL", "T", "T", "T"]),
    ("#(abc)", ["T", "SYMBOL", "T"]),
    ("#:foo", ["UNINTERN_SYMBOL"]),
    ("#| foo #||# |#", ["BLOCK_COMMENT"]),
    ("#1=(x y z)", ["T", "T", "SYMBOL", "SYMBOL", "SYMBOL", "T"]),
    ("abc あいうえお xyz", ["SYMBOL", "SYMBOL", "SYMBOL"]),
    ("#|#|foo|#|#", ["BLOCK_COMMENT"]),
    ('"abcd"', ["STRING"]),
]


@pytest.mark.parametrize("text,kinds", KINDS, ids=[k[0][:20] for k in KINDS])
def test_kinds(text, kinds):
    assert [k for _, _, k in lisp_tokenize(text)] == kinds


def test_spark_token_rows(spark):
    docs = spark.createDataFrame(
        [(0, "(defun foo (x) x)"), (1, "#'car ; pick"), (2, "")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["doc_id"], r["term"], r["pos"], r["kind"])
        for r in lisp_token_rows(docs).collect()
    )
    want = []
    for d, t in [(0, "(defun foo (x) x)"), (1, "#'car ; pick"), (2, "")]:
        for term, pos, kind in lisp_tokenize(t):
            want.append((d, term, pos, kind))
    assert rows == sorted(want)


from hypothesis import given
from hypothesis import strategies as st


@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200))
def test_tokenizer_total_and_monotonic(text):
    """The lexer must terminate on ANY input, yield strictly increasing
    positions within bounds, and never emit a token that starts past
    the end of the input."""
    toks = lisp_tokenize(text)
    last = -1
    for term, pos, kind in toks:
        assert 0 <= pos < max(len(text), 1)
        assert pos > last or (pos == 0 and last == -1)
        last = pos
        assert isinstance(term, str) and isinstance(kind, str)
