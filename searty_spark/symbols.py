"""Symbol / package / definition metadata and search — the
reference's second query family (SURVEY.md Q9/T3/A10), Spark-first.

The reference's analyzer emits normalized metadata tables
(symbol(id, name, package_name), package(id, name),
symbol_definition(symbol_id, specifier, document_id, position),
package_definition(...) — ref lib/database/schema.sql:26-64) and its
searcher parses ``pkg:name`` / ``pkg::name`` / bare-name queries
(ref lib/searcher/definition_searcher.go:17-20,32-55), resolves the
matching symbols, fetches their definitions and resolves documents —
a three-way lookup (ref lib/database/database.go:553-569,605-614;
search loop definition_searcher.go:101-124).

Here the corpus is synthetic web text rather than Lisp source, so the
"analyzer" is a deterministic extraction rule over the token stream
(fully expressible in both Spark SQL and the DuckDB oracle):

- a definition site is every token position p with ``p % 5 == 0`` and
  a following token; the defined symbol is ``upper(token[p+1])``;
- the symbol's package is ``upper(lang)`` (the document's language
  plays the role of the Lisp package);
- the specifier cycles DEFUN/DEFMACRO/DEFVAR by the symbol token's
  length (deterministic stand-in for the reference's form specifier);
- each package is "defined" (DEFPACKAGE) at position 0 of the lowest
  doc_id in that language — mirroring package_definition.

Everything downstream of the extraction is structure-identical to the
reference: normalized tables, md5 surrogate ids (the reference uses
random UUIDs — md5(name) keeps them deterministic AND identical
across independently-built indexes, which is what makes the metadata
merge a pure union+distinct), and a three-way broadcast join at query
time (the symbol side of the join is always tiny — it is the parsed
query's match set).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPECIFIERS = ("DEFUN", "DEFMACRO", "DEFVAR")

# Go-greedy regexes: "(.*)::(.*)" / "(.*):(.*)" — greedy first group
# means the LAST separator splits, exactly like the reference
# (definition_searcher.go:17-20). Internal (::) is tried first.
_INTERNAL_RE = re.compile(r"^(.*)::(.*)$")
_EXTERNAL_RE = re.compile(r"^(.*):(.*)$")


def parse_symbol_query(q: str) -> tuple[str, str | None]:
    """``pkg::name`` / ``pkg:name`` / ``name`` -> (NAME, PKG or None).

    Both parts are upcased; an empty package part (``::name``) means
    "no package constraint", matching makeSymbol's Valid flag
    (definition_searcher.go:34-43).
    """
    for rx in (_INTERNAL_RE, _EXTERNAL_RE):
        m = rx.match(q)
        if m:
            pkg = m.group(1).upper()
            return m.group(2).upper(), (pkg or None)
    return q.upper(), None


def _definition_sites(docs: DataFrame) -> DataFrame:
    """(doc_id, position, symbol_name, package_name, specifier) — the
    deterministic analyzer output (one narrow projection + explode,
    all JVM-side)."""
    # resolve (position, symbol) INSIDE the array before exploding —
    # exploding bare positions and resolving after carries the full
    # token array on every output row through the generator. The token
    # array MUST be a materialized column before the lambdas touch it:
    # common-subexpression elimination stops at higher-order-function
    # boundaries, so an inline split() would re-tokenize the document
    # once per array element (measured 2.5x the whole stage).
    # Positions come from a STEPPED sequence (0, 5, 10, ...) — the same
    # set as filter(sequence(0, n-2), p % 5 == 0) without building and
    # filtering the full n-element index array (measured 3.3x this
    # projection at sf1.0, rows identical).
    toks = F.col("toks")
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2, F.lit(5)),
            lambda p: F.struct(
                p.cast("long").alias("position"),
                F.upper(F.element_at(toks, p + 2)).alias("symbol_name"),
            ),
        ),
    ).otherwise(
        F.array().cast("array<struct<position:bigint,symbol_name:string>>")
    )
    from searty_spark.session import spread_input

    return (
        spread_input(docs).select(
            "doc_id",
            F.upper("lang").alias("package_name"),
            F.split(F.col("text"), " ").alias("toks"),
        )
        .select("doc_id", "package_name", F.explode(pairs).alias("s"))
        .select(
            "doc_id",
            F.col("s.position").alias("position"),
            F.col("s.symbol_name").alias("symbol_name"),
            "package_name",
        )
        .withColumn(
            "specifier",
            F.element_at(
                F.array(*[F.lit(s) for s in SPECIFIERS]),
                (F.length("symbol_name") % 3 + 1).cast("int"),
            ),
        )
    )


def _symbol_id() -> F.Column:
    return F.md5(F.concat_ws(":", F.col("package_name"), F.col("symbol_name")))


def symbol_table(docs: DataFrame) -> DataFrame:
    """symbol(id, name, package_name) — ref schema.sql:26-31.

    The md5 surrogate id is a pure function of the (package, name)
    pair, so it is computed AFTER the distinct (n_symbols hashes, not
    one per occurrence row)."""
    return (
        _definition_sites(docs)
        .select(F.col("symbol_name").alias("name"), "package_name")
        .distinct()
        .select(
            F.md5(F.concat_ws(":", F.col("package_name"), F.col("name"))).alias("id"),
            "name",
            "package_name",
        )
    )


def package_table(docs: DataFrame) -> DataFrame:
    """package(id, name) — ref schema.sql:33-38."""
    return (
        docs.select(F.upper("lang").alias("name"))
        .distinct()
        .select(F.md5("name").alias("id"), "name")
    )


def symbol_definitions(docs: DataFrame) -> DataFrame:
    """symbol_definition(symbol_id, specifier, doc_id, position) —
    ref schema.sql:44-49."""
    return _definition_sites(docs).select(
        _symbol_id().alias("symbol_id"), "specifier", "doc_id", "position"
    )


def package_definitions(docs: DataFrame) -> DataFrame:
    """package_definition(package_id, specifier, doc_id, position):
    the lowest doc_id of each language defines its package at
    position 0 — ref schema.sql:52-57."""
    return (
        docs.groupBy(F.upper("lang").alias("name"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select(
            F.md5("name").alias("package_id"),
            F.lit("DEFPACKAGE").alias("specifier"),
            "doc_id",
            F.lit(0).cast("long").alias("position"),
        )
    )


def search_definition_tables(
    syms: DataFrame, defs: DataFrame, meta: DataFrame, query: str
) -> DataFrame:
    """The reference's SymbolSearcher.Search
    (definition_searcher.go:101-124) over already-materialized tables
    (in-memory or the parquet sidecar an index persists), as one
    declarative plan:

    parse the query -> filter the symbol table (tiny match set,
    broadcast) -> join symbol_definition on symbol_id -> join the doc
    metadata on doc_id for the filename — a three-way join whose only
    shuffle-sized relation is the definitions fact table.

    Output: (doc_id, source, position, specifier, symbol_name,
    package_name) sorted by (doc_id, position), the column set the
    reference renders per Result (definition_searcher.go:82-96).
    """
    name, pkg = parse_symbol_query(query)
    syms = syms.filter(F.col("name") == name)
    if pkg is not None:
        syms = syms.filter(F.col("package_name") == pkg)
    return (
        defs.join(F.broadcast(syms), defs["symbol_id"] == syms["id"])
        .join(meta, "doc_id")
        .select(
            "doc_id",
            "source",
            "position",
            "specifier",
            F.col("name").alias("symbol_name"),
            "package_name",
        )
        .orderBy("doc_id", "position")
    )


def search_definitions(docs: DataFrame, query: str, meta_col: str = "source") -> DataFrame:
    """Q9 end-to-end from the corpus: derive the metadata tables, then
    run the three-way lookup (see search_definition_tables)."""
    return search_definition_tables(
        symbol_table(docs),
        symbol_definitions(docs),
        docs.select("doc_id", F.col(meta_col).alias("source")),
        query,
    )


def search_package_definitions(
    docs: DataFrame, name: str, meta_col: str = "source"
) -> DataFrame:
    """Package-definition lookup (the DEFPACKAGE analogue of
    search_definitions)."""
    pkgs = package_table(docs).filter(F.col("name") == name.upper())
    defs = package_definitions(docs)
    meta = docs.select("doc_id", F.col(meta_col).alias("source"))
    return (
        defs.join(F.broadcast(pkgs), defs["package_id"] == pkgs["id"])
        .join(meta, "doc_id")
        .select("doc_id", "source", "position", "specifier",
                F.col("name").alias("package_name"))
        .orderBy("doc_id", "position")
    )
