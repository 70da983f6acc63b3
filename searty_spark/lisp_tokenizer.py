"""Lisp lexical tokenizer (SURVEY.md T2) — the reference's second
analyzer.

The reference never ships the tokenizer's source in this repo; its
behavior is specified entirely by the golden cases in
/root/reference/tests/lisp-tokenizer.lisp:11-110 (which check term +
character position; the :KIND annotations there document the intended
token classes). This is an original scanner implementing exactly that
spec — every golden case is ported verbatim to
tests/test_lisp_tokenizer.py.

Emitted kinds (the ``token.kind`` column the reference's schema
declares but never writes — schema.sql:12-16, SURVEY.md §1.2):

- SYMBOL            plain or ``|...|``-quoted symbols
- STRING            ``"..."`` with ``\\"`` escapes
- LINE_COMMENT      ``; ...`` (term = text after the ``;``)
- BLOCK_COMMENT     ``#| ... |#`` nested (term = inner text)
- CHARACTER         ``#\\x`` / ``#\\space``
- FUNCTION_OBJECT   ``#'symbol`` (term = the symbol)
- UNINTERN_SYMBOL   ``#:symbol``
- T                 structural/dispatch tokens: ( ) ' ` , #' #( #N= ...

Positions are CHARACTER offsets (multibyte-safe: the ``abc あいうえお
xyz`` golden).

Spark surface: :func:`lisp_token_rows` maps a corpus to a kind-aware
token table (doc_id, term, pos, kind) via an Arrow-batched
mapInPandas — the scanner is pure per-document work, so it
parallelizes embarrassingly and shuffles nothing.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

_WS = set(" \t\n\r\f\v")
_TERMINATING = _WS | set("()';\"")


def _read_symbol(text: str, i: int) -> int:
    """End index of a plain symbol starting at i (handles ``\\``
    single-char escapes)."""
    n = len(text)
    while i < n:
        c = text[i]
        if c == "\\" and i + 1 < n:
            i += 2
            continue
        if c in _TERMINATING or c == "|":
            break
        i += 1
    return i


def lisp_tokenize(text: str) -> list[tuple[str, int, str]]:
    """text -> [(term, position, kind)] per the reference goldens."""
    out: list[tuple[str, int, str]] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c in _WS:
            i += 1
            continue
        start = i
        if c in "()'`,":
            out.append((c, start, "T"))
            i += 1
        elif c == ";":
            j = text.find("\n", i)
            j = n if j < 0 else j
            out.append((text[i + 1 : j], start, "LINE_COMMENT"))
            i = j + 1
        elif c == '"':
            j = i + 1
            while j < n:
                if text[j] == "\\" and j + 1 < n:
                    j += 2
                    continue
                if text[j] == '"':
                    j += 1
                    break
                j += 1
            out.append((text[i:j], start, "STRING"))
            i = j
        elif c == "|":
            j = i + 1
            while j < n:
                if text[j] == "\\" and j + 1 < n:
                    j += 2
                    continue
                if text[j] == "|":
                    j += 1
                    break
                j += 1
            out.append((text[i:j], start, "SYMBOL"))
            i = j
        elif c == "#":
            nxt = text[i + 1] if i + 1 < n else ""
            if nxt == "|":
                # nested block comment; term = inner text
                depth, j = 1, i + 2
                while j < n and depth:
                    if text.startswith("#|", j):
                        depth += 1
                        j += 2
                    elif text.startswith("|#", j):
                        depth -= 1
                        j += 2
                    else:
                        j += 1
                out.append((text[i + 2 : max(j - 2, i + 2)], start, "BLOCK_COMMENT"))
                i = j
            elif nxt == "\\":
                j = i + 2
                if j < n and text[j].isalpha():
                    k = j
                    while k < n and (text[k].isalnum() or text[k] in "-_"):
                        k += 1
                    # single escaped char (e.g. #\a) vs named (#\space)
                    j = k if k - j > 1 else j + 1
                else:
                    j = min(j + 1, n)
                out.append((text[i + 2 : j], start, "CHARACTER"))
                i = j
            elif nxt == "'":
                j = i + 2
                if j < n and text[j] not in _TERMINATING and text[j] != "#":
                    k = _read_symbol(text, j)
                    out.append((text[j:k], start, "FUNCTION_OBJECT"))
                    i = k
                else:
                    out.append(("#'", start, "T"))
                    i = j
            elif nxt == ":":
                j = _read_symbol(text, i + 2)
                out.append((text[i + 2 : j], start, "UNINTERN_SYMBOL"))
                i = j
            elif nxt == "(":
                out.append(("#(", start, "T"))
                i += 2
            elif nxt.isdigit():
                j = i + 1
                while j < n and text[j].isdigit():
                    j += 1
                if j < n and text[j] in "=#":
                    out.append((text[i : j + 1], start, "T"))
                    i = j + 1
                else:  # e.g. #2A(...) — emit the dispatch prefix as-is
                    out.append((text[i:j], start, "T"))
                    i = j
            else:
                out.append((text[i : i + 2] if i + 1 < n else "#", start, "T"))
                i += 2
        else:
            j = _read_symbol(text, i)
            out.append((text[i:j], start, "SYMBOL"))
            i = j
    return out


def lisp_token_rows(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, term, pos, kind) kind-aware token table."""

    def run(batches):
        for pdf in batches:
            recs = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                for term, pos, kind in lisp_tokenize(text):
                    recs.append((int(doc_id), term, pos, kind))
            yield pd.DataFrame(
                recs, columns=["doc_id", "term", "pos", "kind"]
            ) if recs else pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"), "term": pd.Series(dtype="object"),
                 "pos": pd.Series(dtype="int64"), "kind": pd.Series(dtype="object")}
            )

    return docs.select("doc_id", text_col).mapInPandas(
        run, "doc_id long, term string, pos long, kind string"
    )
