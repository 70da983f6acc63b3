"""html -> text extraction (the reference's analyzer front-end
analogue, SURVEY.md S4: lisp-analyzer/lisp-analyzer.lisp:238-267).

The north-rule invariant is "byte-identical extracted text per url":
``extract_text(html) == text`` for every corpus row. Implemented as a
vectorized Arrow pandas UDF (batch-level, no per-row Python UDF at the
Spark layer).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_OPEN = b"<p>"
_CLOSE = b"</p>"


def extract_text_bytes(html: bytes) -> str:
    """Extract the body text between the first <p> and last </p>."""
    i = html.index(_OPEN) + len(_OPEN)
    j = html.rindex(_CLOSE)
    return html[i:j].decode("utf-8")


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text_bytes)


def extracted_text_col(html_col: str = "html") -> Column:
    return extract_text_udf(F.col(html_col))
