"""resolve_ranges line-bound extraction (Q8+Q11 parity,
ref lib/searcher/pretty_print.go:11-41): the emitted `line` is the
newline-delimited line containing the match."""

from searty_spark.query import resolve_ranges


def test_resolve_ranges_line_bounds(spark):
    text = "first line\nthe match is here\nlast line"
    #       0123456789 0          1
    # "match" starts at char 15 (0-based), ends at 20
    docs = spark.createDataFrame([(1, "https://u/1", text)], "doc_id long, url string, text string")
    ranges = spark.createDataFrame([(1, 15, 20)], "doc_id long, start int, end int")
    row = resolve_ranges(ranges, docs).collect()[0]
    assert row["key"] == "https://u/1"
    assert row["line"] == "the match is here"

    # match at the very start / very end (no surrounding newlines)
    docs2 = spark.createDataFrame([(2, "u2", "justoneline")], "doc_id long, url string, text string")
    r2 = spark.createDataFrame([(2, 0, 4)], "doc_id long, start int, end int")
    assert resolve_ranges(r2, docs2).collect()[0]["line"] == "justoneline"

    # match on the first line of a multi-line doc
    docs3 = spark.createDataFrame([(3, "u3", "abc def\nxyz")], "doc_id long, url string, text string")
    r3 = spark.createDataFrame([(3, 4, 7)], "doc_id long, start int, end int")
    assert resolve_ranges(r3, docs3).collect()[0]["line"] == "abc def"

    # match on the last line
    r4 = spark.createDataFrame([(3, 8, 11)], "doc_id long, start int, end int")
    assert resolve_ranges(r4, docs3).collect()[0]["line"] == "xyz"
