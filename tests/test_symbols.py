"""Symbol/package/definition search (SURVEY.md Q9/T3/A10).

Parser cases mirror the reference's Go regex semantics
(definition_searcher.go:17-20,32-55): greedy groups mean the LAST
separator splits, `::` is tried before `:`, and an empty package part
means unqualified.
"""

import pytest
from pyspark.sql import functions as F

from searty_spark.symbols import (
    package_definitions,
    parse_symbol_query,
    search_definitions,
    symbol_definitions,
    symbol_table,
)


@pytest.mark.parametrize(
    "q,expect",
    [
        ("foo", ("FOO", None)),
        ("pkg:foo", ("FOO", "PKG")),
        ("pkg::foo", ("FOO", "PKG")),
        ("::foo", ("FOO", None)),  # empty package part -> unqualified
        (":foo", ("FOO", None)),
        ("a:b:c", ("C", "A:B")),  # greedy: last colon splits
        ("a::b::c", ("C", "A::B")),
        ("a::b:c", ("B:C", "A")),  # internal regex wins, greedy to last ::
        ("alexandria:make-keyword", ("MAKE-KEYWORD", "ALEXANDRIA")),
    ],
)
def test_parse_symbol_query(q, expect):
    assert parse_symbol_query(q) == expect


def _expected_defs(rows, name, pkg):
    out = []
    for r in rows:
        toks = r["text"].split(" ")
        for p in range(0, len(toks) - 1, 5):
            sym = toks[p + 1].upper()
            if sym != name:
                continue
            package = r["lang"].upper()
            if pkg is not None and package != pkg:
                continue
            spec = ("DEFUN", "DEFMACRO", "DEFVAR")[len(toks[p + 1]) % 3]
            out.append((r["doc_id"], r["url"], p, spec, sym, package))
    return sorted(out)


@pytest.fixture(scope="module")
def corpus_rows(small_corpus):
    return small_corpus.select("doc_id", "url", "text", "lang").collect()


def _pick_symbol(corpus_rows):
    """A symbol defined in >1 package on the test corpus, else any."""
    from collections import defaultdict

    pkgs = defaultdict(set)
    for r in corpus_rows:
        toks = r["text"].split(" ")
        for p in range(0, len(toks) - 1, 5):
            pkgs[toks[p + 1].upper()].add(r["lang"].upper())
    multi = [s for s, ps in pkgs.items() if len(ps) > 1]
    return (multi or list(pkgs))[0]


def test_search_definitions_bare_and_qualified(small_corpus, corpus_rows):
    name = _pick_symbol(corpus_rows)
    got = [
        tuple(r)
        for r in search_definitions(small_corpus, name.lower(), meta_col="url").collect()
    ]
    assert got == _expected_defs(corpus_rows, name, None)
    assert len(got) > 0

    got_q = [
        tuple(r)
        for r in search_definitions(
            small_corpus, f"en:{name.lower()}", meta_col="url"
        ).collect()
    ]
    assert got_q == _expected_defs(corpus_rows, name, "EN")
    assert all(g[5] == "EN" for g in got_q)
    assert len(got_q) < len(got) or not any(g[5] != "EN" for g in got)


def test_missing_symbol_returns_empty(small_corpus):
    assert search_definitions(small_corpus, "zz:noSuchSymbolXyz", meta_col="url").count() == 0


def test_symbol_ids_are_stable_across_builds(spark, small_corpus):
    """md5 surrogate ids make independently-built symbol tables
    union+distinct mergeable (unlike the reference's random UUIDs,
    which force an id remap at merge time — merge.go:192-238)."""
    half_a = small_corpus.filter(F.col("doc_id") % 2 == 0)
    half_b = small_corpus.filter(F.col("doc_id") % 2 == 1)
    merged = symbol_table(half_a).unionByName(symbol_table(half_b)).distinct()
    whole = symbol_table(small_corpus)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0
    # definitions are disjoint by doc -> plain union
    u = symbol_definitions(half_a).unionByName(symbol_definitions(half_b))
    assert u.count() == symbol_definitions(small_corpus).count()


def test_package_definitions_one_per_lang(small_corpus):
    pd_ = package_definitions(small_corpus)
    langs = small_corpus.select(F.upper("lang")).distinct().count()
    assert pd_.count() == langs
    assert pd_.filter(F.col("specifier") != "DEFPACKAGE").count() == 0


def test_index_sidecar_roundtrip_and_merge(spark, small_corpus, tmp_path, corpus_rows):
    """write_index persists the metadata tables; query_symbols over the
    sidecar == search_definitions over the corpus; merging two
    half-indexes reproduces the single-shot sidecar."""
    from searty_spark.index import query_symbols, write_index
    from searty_spark.merge import merge_indexes

    name = _pick_symbol(corpus_rows)
    whole, ha, hb, merged = (str(tmp_path / x) for x in ("whole", "ha", "hb", "m"))
    write_index(small_corpus, whole, n_shards=2, n_buckets=8)
    got = [tuple(r) for r in query_symbols(spark, whole, name.lower()).collect()]
    assert got == _expected_defs(corpus_rows, name, None)

    write_index(small_corpus.filter(F.col("doc_id") % 2 == 0), ha, n_shards=2, n_buckets=8)
    write_index(small_corpus.filter(F.col("doc_id") % 2 == 1), hb, n_shards=2, n_buckets=8)
    merge_indexes(spark, [ha, hb], merged)
    got_m = [tuple(r) for r in query_symbols(spark, merged, name.lower()).collect()]
    assert got_m == got
    # package_definitions dedups to the single-shot row set
    pd_whole = sorted(tuple(r) for r in spark.read.parquet(whole + "/package_definitions").collect())
    pd_merged = sorted(tuple(r) for r in spark.read.parquet(merged + "/package_definitions").collect())
    assert pd_merged == pd_whole


def test_symbol_join_is_broadcast(small_corpus):
    plan = search_definitions(small_corpus, "en:anything", meta_col="url")._sc._jvm.PythonSQLUtils.explainString(
        search_definitions(small_corpus, "en:anything", meta_col="url")._jdf.queryExecution(),
        "formatted",
    )
    assert "BroadcastHashJoin" in plan
