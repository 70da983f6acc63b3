"""spark-submit / python -m entrypoints (the rebuild of the three
reference binaries, SURVEY.md §3):

    searty-index  (cmd/searty-index/index.go:18-28)
      python -m searty_spark.cli build --corpus <parquet|synth:N> --out DIR
                                       [--shards 4] [--buckets 32]
    searty-merge  (cmd/searty-merge/merge.go:19-27)
      python -m searty_spark.cli merge --inputs DIR1 DIR2 ... --out DIR
    searty        (cmd/searty/searty.go:28-75)
      python -m searty_spark.cli query --index DIR [-k 10] [--phrase] "Q" ...

Plus the training-data surface the reference doesn't have:
      python -m searty_spark.cli clean --corpus P --out DIR
        [--bench P] [--substring-k 10] [--min-stopword-ratio 0.0]

Cluster form: spark-submit --py-files /tmp/searty_spark_pyfiles.zip
(session.py builds that zip and ships it automatically in local runs).
"""

from __future__ import annotations

import argparse
import json
import sys
import time  # noqa: F401 — used by several subcommands
from pathlib import Path


def _corpus(spark, spec: str):
    from searty_spark.corpus import synth_corpus

    if spec.startswith("synth:"):
        return synth_corpus(spark, int(spec.split(":", 1)[1]))
    df = spark.read.parquet(spec)
    if "doc_id" not in df.columns:
        raise SystemExit("corpus parquet must have a doc_id column")
    return df


def cmd_build(args) -> None:
    from searty_spark.index import write_index
    from searty_spark.session import get_spark

    spark = get_spark(cpus=args.cpus, app_name="searty-index")
    t0 = time.perf_counter()
    m = write_index(
        _corpus(spark, args.corpus),
        args.out,
        n_shards=args.shards,
        n_buckets=args.buckets,
        resume=not args.no_resume,
        store_docs=args.store_docs,
        doc_key=args.doc_key,
        analyzer=args.analyzer,
    )
    print(json.dumps({"wall_sec": time.perf_counter() - t0, **m["stats"]}))


def cmd_clean(args) -> None:
    """Training-prep composite from the CLI: corpus parquet (or
    synth:N) in, (doc_id, clean_text, n_redactions) parquet out —
    pipeline.prepare_training_corpus end-to-end (gopher gate,
    optional benchmark decontamination, PII redaction, exact dedup,
    optional Lee-et-al substring excision), with one JSON stats line
    on stdout."""
    from pyspark.sql import functions as F

    from searty_spark.pipeline import prepare_training_corpus
    from searty_spark.session import get_spark

    spark = get_spark(cpus=args.cpus, app_name="searty-clean")
    docs = _corpus(spark, args.corpus)
    bench = spark.read.parquet(args.bench) if args.bench else None
    kw = {}
    if args.min_stopword_ratio is not None:
        kw["min_stopword_ratio"] = args.min_stopword_ratio
    if args.max_symbol_ratio is not None:
        kw["max_symbol_ratio"] = args.max_symbol_ratio
    t0 = time.perf_counter()
    out = prepare_training_corpus(
        docs,
        bench=bench,
        n_contam=args.n_contam,
        min_tokens=args.min_tokens,
        substring_k=args.substring_k,
        **kw,
    )
    out.write.mode("overwrite").parquet(args.out)
    wall = time.perf_counter() - t0
    written = spark.read.parquet(args.out)
    stats = written.agg(
        F.count("*").alias("n_survivors"), F.sum("n_redactions").alias("n_redactions")
    ).collect()[0]
    print(
        json.dumps(
            {
                "wall_sec": round(wall, 3),
                "n_docs_in": docs.count(),
                "n_survivors": stats["n_survivors"],
                "n_redactions": int(stats["n_redactions"] or 0),
                "out": args.out,
            }
        )
    )


def cmd_serve(args) -> None:
    """Warm query server over stdin: one request per line, one JSON
    result line per request (flushed) — the deployment shape the
    reference's per-invocation CLI cannot offer, and the reason a
    long-lived SparkSession pays off: the segments are cached
    shard-partitioned once, every query is the no-exchange
    pre_partitioned path with champion-seeded pruning.

    Request syntax: a plain line is a BM25 top-k; `:phrase <q>` ranks
    a positional phrase; `:regex <pat>` needs a --store-docs index;
    `:batch ["q1", "q2", ...]` answers MANY BM25 queries in ONE
    segment scan (wand_topk_batch: each term decodes once per shard
    and is shared across the batch — measured ~3x the per-query
    throughput of answering them one job each); `:quit` exits.
    Responses: {"query":..., "mode":..., "results":[[doc_id,
    score]...], "wall_sec":...} — for :batch, "results" is a list of
    per-query result lists aligned with the request array — or
    {"error": ...}.

    ``--threads N`` answers up to N requests concurrently (the shape
    the interleaved A/B in BENCH/concurrent_ab.json measured at
    ~1.5x sequential throughput on the no-exchange path): response
    lines then arrive in COMPLETION order, each tagged with its
    request ``seq`` number so a pipelining client can reorder."""
    import threading

    from searty_spark.champions import champion_theta
    from searty_spark.phrase_seg import phrase_bm25_topk_segments
    from searty_spark.session import get_spark
    from searty_spark.tokenize import tokenize
    from searty_spark.wand import wand_topk

    spark = get_spark(cpus=args.cpus, app_name="searty-serve")
    stats, seg, dic, champs = _warm_server(spark, args.index)
    docs = None
    docs_path = Path(args.index) / "documents"
    if docs_path.exists():
        docs = spark.read.parquet(str(docs_path)).cache()
        docs.count()
    threads = getattr(args, "threads", 1)
    print(json.dumps({"ready": True, "n_docs": stats["n_docs"],
                      "index": args.index, "threads": threads}), flush=True)
    out_lock = threading.Lock()

    def answer(seq: int, mode: str, arg: str) -> None:
        t0 = time.perf_counter()
        try:
            if mode == "bm25":
                terms = sorted(set(tokenize(arg)))
                dfl = dic.lookup(terms)
                rows = wand_topk(
                    seg, None, arg, k=args.k,
                    n_docs=stats["n_docs"], avgdl=stats["avgdl"],
                    n_shards=stats["n_shards"], df_lookup=dfl,
                    theta0=champion_theta(
                        champs.lookup(terms), dfl, args.k,
                        stats["n_docs"], stats["avgdl"],
                    ),
                    pre_partitioned=True,
                ).collect()
                res = [[r["doc_id"], r["score"]] for r in rows]
            elif mode == "phrase":
                rows = phrase_bm25_topk_segments(
                    seg, arg, k=args.k,
                    n_docs=stats["n_docs"], avgdl=stats["avgdl"],
                    n_shards=stats["n_shards"],
                    df_lookup=dic.lookup(sorted(set(tokenize(arg)))),
                    pre_partitioned=True,
                ).collect()
                res = [[r["doc_id"], r["score"]] for r in rows]
            elif mode == "batch":
                from searty_spark.wand import wand_topk_batch

                qs = json.loads(arg)
                if not isinstance(qs, list) or not all(
                    isinstance(x, str) for x in qs
                ):
                    raise ValueError(
                        ':batch expects a JSON array of query strings, e.g. '
                        ':batch ["foo", "bar baz"]'
                    )
                qmap = {str(i): q for i, q in enumerate(qs)}
                all_terms = sorted({t for q in qs for t in tokenize(q)})
                rows = wand_topk_batch(
                    seg, qmap, k=args.k,
                    n_docs=stats["n_docs"], avgdl=stats["avgdl"],
                    n_shards=stats["n_shards"],
                    df_lookup=dic.lookup(all_terms),
                    pre_partitioned=True,
                ).collect()
                by_q: dict[str, list] = {}
                for r in rows:
                    by_q.setdefault(r["query_id"], []).append(
                        [r["doc_id"], r["score"]]
                    )
                res = [by_q.get(str(i), []) for i in range(len(qs))]
            elif mode == "regex":
                if docs is None:
                    raise ValueError(":regex needs a --store-docs index")
                from searty_spark.query import regex_search_segments

                rows = regex_search_segments(
                    docs, seg, arg, n_shards=stats["n_shards"]
                ).collect()
                res = [[r["doc_id"]] for r in rows]
            else:
                raise ValueError(f"unknown mode {mode!r} (bm25|phrase|regex|batch)")
            line = json.dumps({
                "seq": seq, "query": arg, "mode": mode, "results": res,
                "wall_sec": round(time.perf_counter() - t0, 4),
            })
        # catch EVERYTHING, not just ValueError: a malformed :regex
        # raises re.error (literal extraction) or Py4JJavaError (JVM
        # rlike at collect) — an escaping exception would kill the
        # worker thread silently and break the every-request-answered-
        # exactly-once contract a pipelining client relies on
        except Exception as err:  # noqa: BLE001
            line = json.dumps({"seq": seq, "query": arg, "error": str(err)})
        with out_lock:
            print(line, flush=True)

    import concurrent.futures as cf

    pending: list = []
    with cf.ThreadPoolExecutor(max_workers=max(threads, 1)) as ex:
        seq = 0
        for line in sys.stdin:
            q = line.strip()
            if not q:
                continue
            if q == ":quit":
                break
            mode, arg = "bm25", q
            if q.startswith(":"):
                head, _, rest = q.partition(" ")
                mode, arg = head[1:], rest
            if threads > 1:
                pending.append(ex.submit(answer, seq, mode, arg))
            else:
                answer(seq, mode, arg)
            seq += 1
        for f in pending:
            f.result()


def cmd_upgrade(args) -> None:
    """Format-1 -> format-2 re-encode without the source corpus
    (index.upgrade_index): merge-of-one over the old segments,
    sidecars re-derived/copied."""
    from searty_spark.index import upgrade_index
    from searty_spark.session import get_spark

    spark = get_spark(cpus=args.cpus, app_name="searty-upgrade")
    t0 = time.perf_counter()
    stats = upgrade_index(spark, args.index, args.out)
    print(json.dumps({"wall_sec": time.perf_counter() - t0, **stats}))


def cmd_merge(args) -> None:
    from searty_spark.merge import compact_partials, merge_indexes
    from searty_spark.session import get_spark

    spark = get_spark(cpus=args.cpus, app_name="searty-merge")
    t0 = time.perf_counter()
    if args.fanin and len(args.inputs) > args.fanin:
        stats = compact_partials(
            spark, args.inputs, args.out, fanin=args.fanin, dedup_docs=args.dedup_docs
        )
    else:
        stats = merge_indexes(spark, args.inputs, args.out, dedup_docs=args.dedup_docs)
    print(json.dumps({"wall_sec": time.perf_counter() - t0, **stats}))


def cmd_query(args) -> None:
    from searty_spark.index import load_segments, query_index
    from searty_spark.phrase_seg import phrase_ranges_segments
    from searty_spark.session import get_spark

    spark = get_spark(cpus=args.cpus, app_name="searty-query")
    from pathlib import Path

    docs_path = Path(args.index) / "documents"
    for q in args.queries:
        if args.symbol:
            # ref `searty -symbol pkg:name` (cmd/searty/searty.go:38-44)
            from searty_spark.index import query_symbols

            for r in query_symbols(spark, args.index, q).collect():
                print(
                    f"{r['source']}:{r['position']}\t{r['specifier']}\t"
                    f"{r['package_name']}:{r['symbol_name']}"
                )
        elif args.regex:
            from searty_spark.index import load_stats
            from searty_spark.query import regex_search_segments

            if load_stats(args.index).get("analyzer", "trigram") != "trigram":
                raise SystemExit("--regex needs a trigram-analyzer index")
            if not docs_path.exists():
                raise SystemExit(
                    "--regex verification needs the doc texts: rebuild the "
                    "index with --store-docs (or query the corpus directly "
                    "via the library API)"
                )
            docs = spark.read.parquet(str(docs_path))
            seg = load_segments(spark, args.index)
            for r in regex_search_segments(docs, seg, q).collect():
                print(r["doc_id"])
        elif args.phrase:
            from searty_spark.index import load_stats

            if load_stats(args.index).get("analyzer", "trigram") != "trigram":
                raise SystemExit(
                    "--phrase needs a trigram-analyzer index; this index was "
                    "built with --analyzer lisp (positional phrase search is "
                    "defined over character trigrams)"
                )
            ranges = phrase_ranges_segments(load_segments(spark, args.index), q)
            if docs_path.exists():
                # ref pretty-print shape: key:start:end:line
                # (lib/searcher/pretty_print.go:34-40)
                from searty_spark.query import resolve_ranges

                docs = spark.read.parquet(str(docs_path))
                for r in resolve_ranges(ranges, docs).collect():
                    print(f"{r['key']}:{r['start']}:{r['end']}:{r['line']}")
            else:
                for r in ranges.collect():
                    print(f"{r['doc_id']}:{r['start']}:{r['end']}")
        else:
            from searty_spark.index import load_stats, query_index_lisp

            if load_stats(args.index).get("analyzer", "trigram") == "lisp":
                rows = query_index_lisp(
                    spark, args.index, q, k=args.k, kind=args.kind
                ).collect()
            else:
                rows = query_index(spark, args.index, q, k=args.k).collect()
            for rank, r in enumerate(rows, 1):
                print(f"{rank}\t{r['doc_id']}\t{r['score']}")


def cmd_build_ann(args) -> None:
    """Persisted ANN index build (ann_index.write_ann_index): trained
    IVF centroids + PQ codebooks + cell-partitioned codes parquet.
    --append instead encodes the batch under the existing index's
    frozen codebooks and appends its partitions."""
    from searty_spark.ann_index import append_ann_index, write_ann_index
    from searty_spark.session import get_spark

    spark = get_spark(cpus=args.cpus, app_name="searty-build-ann")
    emb = spark.read.parquet(args.embeddings)
    t0 = time.perf_counter()
    if args.append:
        stats = append_ann_index(emb, args.out)
    else:
        stats = write_ann_index(
            emb, args.out, n_cells=args.cells, n_iter=args.iters,
            sample=args.sample, m=args.m, pq_k=args.pq_k,
        )
    print(json.dumps({"wall_sec": time.perf_counter() - t0, **stats}))


def cmd_merge_ann(args) -> None:
    """Merge same-codebook ANN artifacts (partition concat; fails fast
    on any codebook mismatch)."""
    from searty_spark.ann_index import merge_ann_indexes
    from searty_spark.session import get_spark

    spark = get_spark(cpus=args.cpus, app_name="searty-merge-ann")
    t0 = time.perf_counter()
    stats = merge_ann_indexes(spark, args.indexes, args.out)
    print(json.dumps({"wall_sec": time.perf_counter() - t0, **stats}))


def cmd_query_ann(args) -> None:
    """Top-k ANN query against the persisted artifact: probe cells from
    the stored centroids (partition-pruned codes scan), ADC, exact
    re-rank against the raw embeddings."""
    from searty_spark.ann_index import ivf_pq_topk_indexed
    from searty_spark.session import get_spark

    spark = get_spark(cpus=args.cpus, app_name="searty-query-ann")
    emb = spark.read.parquet(args.embeddings)
    for qid in args.vec_ids:
        rows = ivf_pq_topk_indexed(
            emb, args.index, int(qid), k=args.k,
            n_probe=args.probe, refine=args.refine,
        ).collect()
        for rank, r in enumerate(rows, 1):
            print(f"{qid}\t{rank}\t{r['vec_id']}\t{r['cos']}")


def cmd_describe(args) -> None:
    """Index describe (ref lib/indexer/describe.go:11-29): global stats,
    per-shard segment counts, heaviest terms."""
    from pyspark.sql import functions as F

    from searty_spark.index import load_segments, load_stats
    from searty_spark.session import get_spark

    spark = get_spark(cpus=args.cpus, app_name="searty-describe")
    stats = load_stats(args.index)
    seg = load_segments(spark, args.index)
    shards = seg.groupBy("shard").agg(
        F.count("*").alias("segments"), F.sum("df").alias("postings")
    ).orderBy("shard").collect()
    top = (
        seg.groupBy("term").agg(F.sum("df").alias("df")).orderBy(F.desc("df"), "term")
        .limit(args.top).collect()
    )
    print(json.dumps(stats))
    for r in shards:
        print(f"shard={r['shard']} segments={r['segments']} postings={r['postings']}")
    for r in top:
        print(f"term={r['term']!r} df={r['df']}")


def _warm_server(spark, index_dir: str, full_driver_dict: bool = False):
    """The query-server warm state shared by bench-queries and serve:
    shard-partitioned cached segments (the pre_partitioned fast path's
    contract), bounded term->df client, champion client. Startup is
    O(1) in vocabulary size unless full_driver_dict."""
    from searty_spark.champions import ChampionClient
    from searty_spark.index import load_segments, load_stats
    from searty_spark.wand import TermDfClient

    stats = load_stats(index_dir)
    seg = (
        load_segments(spark, index_dir)
        .repartition(stats["n_shards"], "shard")
        .cache()
    )
    seg.count()
    dic = TermDfClient(spark, index_dir)
    if full_driver_dict:
        dic._cache = {
            r["term"]: int(r["df_global"]) for r in dic._df.collect()
        }
    champs = ChampionClient(spark, index_dir)
    return stats, seg, dic, champs


def cmd_bench_queries(args) -> None:
    """Repeated warmed top-k queries -> one JSON line of latencies.

    The term->df dictionary is fetched per query through TermDfClient
    (pushed-filter scan of only the query's terms + a driver-side
    hot-term cache) — never a full-dictionary collect, so the server
    starts in O(1) regardless of vocabulary size. --full-driver-dict
    restores the old load-everything behavior for small indexes."""
    from searty_spark.champions import champion_theta
    from searty_spark.session import get_spark
    from searty_spark.tokenize import tokenize
    from searty_spark.wand import wand_topk

    spark = get_spark(cpus=args.cpus, app_name="searty-bench-queries")
    stats, seg, dic, champs = _warm_server(
        spark, args.index, full_driver_dict=args.full_driver_dict
    )

    docs = None
    if args.mode == "regex":
        from pathlib import Path

        docs_path = Path(args.index) / "documents"
        if not docs_path.exists():
            raise SystemExit("--mode regex needs a --store-docs index")
        docs = spark.read.parquet(str(docs_path)).cache()
        docs.count()

    def one(q: str) -> float:
        t0 = time.perf_counter()
        if args.mode == "lisp":
            # kind-filtered composite terms, same warm path as
            # index.query_index_lisp but against the cached segments
            from searty_spark.index import lisp_term
            from searty_spark.lisp_tokenizer import lisp_tokenize

            terms = sorted(
                {lisp_term(args.kind, t) for t, _, kd in lisp_tokenize(q) if kd == args.kind}
            )
            dfl = dic.lookup(terms)
            wand_topk(
                seg, None, "", k=args.k,
                n_docs=stats["n_docs"], avgdl=stats["avgdl"],
                n_shards=stats["n_shards"],
                df_lookup=dfl, terms=terms,
                theta0=champion_theta(
                    champs.lookup(terms), dfl, args.k,
                    stats["n_docs"], stats["avgdl"],
                ),
                pre_partitioned=True,
            ).collect()
        elif args.mode == "phrase":
            from searty_spark.phrase_seg import phrase_bm25_topk_segments

            phrase_bm25_topk_segments(
                seg, q, k=args.k,
                n_docs=stats["n_docs"], avgdl=stats["avgdl"],
                n_shards=stats["n_shards"],
                df_lookup=dic.lookup(sorted(set(tokenize(q)))),
                pre_partitioned=True,
            ).collect()
        elif args.mode == "regex":
            from searty_spark.query import regex_search_segments

            regex_search_segments(
                docs, seg, q, n_shards=stats["n_shards"]
            ).collect()
        else:
            terms = sorted(set(tokenize(q)))
            dfl = dic.lookup(terms)
            wand_topk(
                seg, None, q, k=args.k,
                n_docs=stats["n_docs"], avgdl=stats["avgdl"],
                n_shards=stats["n_shards"],
                df_lookup=dfl,
                theta0=champion_theta(
                    champs.lookup(terms), dfl, args.k,
                    stats["n_docs"], stats["avgdl"],
                ),
                pre_partitioned=True,
            ).collect()
        return time.perf_counter() - t0

    lats = []
    if args.threads > 1:
        # query-server shape: concurrent requests against one warmed
        # session (Spark schedules the jobs FIFO across its cores)
        import concurrent.futures as cf

        with cf.ThreadPoolExecutor(max_workers=args.threads) as ex:
            list(ex.map(one, args.queries))  # warmup, untimed
            t_all0 = time.perf_counter()
            for _ in range(args.repeat - 1):
                lats.extend(ex.map(one, args.queries))
            wall = time.perf_counter() - t_all0
    else:
        for q in args.queries:  # warmup, untimed
            one(q)
        t_all0 = time.perf_counter()
        for _ in range(args.repeat - 1):
            for q in args.queries:
                lats.append(one(q))
        wall = time.perf_counter() - t_all0
    lats.sort()
    print(
        json.dumps(
            {
                "n": len(lats),
                "mode": args.mode,
                "threads": args.threads,
                "p50": lats[len(lats) // 2],
                "p95": lats[int(len(lats) * 0.95)],
                # honest aggregate throughput: completed timed requests
                # over the timed wall (warmup excluded)
                "qps": len(lats) / wall,
                "wall_sec": wall,
            }
        )
    )


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="searty_spark")
    p.add_argument("--cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--corpus", required=True, help="parquet path or synth:N")
    b.add_argument("--out", required=True)
    b.add_argument("--shards", type=int, default=4)
    b.add_argument("--buckets", type=int, default=32)
    b.add_argument("--no-resume", action="store_true")
    b.add_argument("--store-docs", action="store_true",
                   help="persist (doc_id, url, text) for pretty-printed query results")
    b.add_argument("--analyzer", default="trigram", choices=["trigram", "lisp"],
                   help="tokenizer: char trigrams (default) or the kind-aware "
                        "Lisp lexical scanner (SURVEY.md T2)")
    b.add_argument("--doc-key", default="auto",
                   help="document-identity column for shared-identity merge "
                        "(default: auto = url when present; must be UNIQUE per document)")
    b.set_defaults(fn=cmd_build)

    cl = sub.add_parser("clean")
    cl.add_argument("--corpus", required=True, help="parquet path or synth:N")
    cl.add_argument("--out", required=True)
    cl.add_argument("--bench", default=None,
                    help="evaluation-set parquet for n-gram decontamination")
    cl.add_argument("--n-contam", type=int, default=5)
    cl.add_argument("--min-tokens", type=int, default=16)
    cl.add_argument("--substring-k", type=int, default=None,
                    help="also excise duplicated k-token runs from the "
                         "survivors (Lee et al. 2022 rewrite)")
    cl.add_argument("--min-stopword-ratio", type=float, default=None,
                    help="override the gopher stop-word floor "
                         "(0.0 for non-prose corpora)")
    cl.add_argument("--max-symbol-ratio", type=float, default=None)
    cl.set_defaults(fn=cmd_clean)

    m = sub.add_parser("merge")
    m.add_argument("--inputs", nargs="+", required=True)
    m.add_argument("--out", required=True)
    m.add_argument("--fanin", type=int, default=0,
                   help="tiered compaction: merge at most N inputs per step (0 = flat merge)")
    m.add_argument("--dedup-docs", action="store_true",
                   help="shared-document-identity merge: dedup by url/source key, "
                        "keep-first (ref merge.go:137-190 semantics)")
    m.set_defaults(fn=cmd_merge)

    sv = sub.add_parser("serve")
    sv.add_argument("--index", required=True)
    sv.add_argument("-k", type=int, default=10)
    sv.add_argument("--threads", type=int, default=1,
                    help="answer up to N requests concurrently "
                         "(responses in completion order, tagged seq)")
    sv.set_defaults(fn=cmd_serve)

    up = sub.add_parser("upgrade")
    up.add_argument("--index", required=True, help="format-1 index dir")
    up.add_argument("--out", required=True)
    up.set_defaults(fn=cmd_upgrade)

    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--phrase", action="store_true")
    q.add_argument("--regex", action="store_true",
                   help="trigram-accelerated regex search (needs --store-docs index)")
    q.add_argument("--symbol", action="store_true",
                   help="symbol-definition search (pkg:name / pkg::name / name)")
    q.add_argument("--kind", default="SYMBOL",
                   help="token kind to match on a lisp-analyzer index "
                        "(SYMBOL, STRING, LINE_COMMENT, ...)")
    q.add_argument("queries", nargs="+")
    q.set_defaults(fn=cmd_query)

    d = sub.add_parser("describe")
    d.add_argument("--index", required=True)
    d.add_argument("--top", type=int, default=10)
    d.set_defaults(fn=cmd_describe)

    ba = sub.add_parser("build-ann")
    ba.add_argument("--embeddings", required=True, help="parquet with (vec_id, embedding)")
    ba.add_argument("--out", required=True)
    ba.add_argument("--cells", type=int, default=32)
    ba.add_argument("--iters", type=int, default=2)
    ba.add_argument("--sample", type=int, default=4096)
    ba.add_argument("--m", type=int, default=8)
    ba.add_argument("--pq-k", type=int, default=16)
    ba.add_argument(
        "--append", action="store_true",
        help="encode --embeddings under --out's FROZEN codebooks and append "
        "to its cell partitions (exact; no retrain/re-encode)",
    )
    ba.set_defaults(fn=cmd_build_ann)

    ma = sub.add_parser("merge-ann")
    ma.add_argument("--out", required=True)
    ma.add_argument("indexes", nargs="+", help="same-codebook ANN index dirs")
    ma.set_defaults(fn=cmd_merge_ann)

    qa = sub.add_parser("query-ann")
    qa.add_argument("--index", required=True)
    qa.add_argument("--embeddings", required=True)
    qa.add_argument("-k", type=int, default=10)
    qa.add_argument("--probe", type=int, default=4)
    qa.add_argument("--refine", type=int, default=50)
    qa.add_argument("vec_ids", nargs="+")
    qa.set_defaults(fn=cmd_query_ann)

    bq = sub.add_parser("bench-queries")
    bq.add_argument("--index", required=True)
    bq.add_argument("-k", type=int, default=10)
    def _repeat(v: str) -> int:
        n = int(v)
        if n < 2:  # iteration 0 is warmup; latencies need >= 1 timed run
            raise argparse.ArgumentTypeError("--repeat must be >= 2 (first run is warmup)")
        return n

    bq.add_argument("--repeat", type=_repeat, default=5)
    bq.add_argument("--threads", type=int, default=1,
                    help="concurrent request threads (query-server shape)")
    bq.add_argument("--mode", default="trigram",
                    choices=["trigram", "lisp", "phrase", "regex"],
                    help="warm query path to exercise: trigram BM25 top-k "
                         "(default), kind-filtered lisp BM25, ranked phrase "
                         "(segments), or trigram-accelerated regex (needs a "
                         "--store-docs index)")
    bq.add_argument("--kind", default="SYMBOL",
                    help="token kind for --mode lisp")
    bq.add_argument("--full-driver-dict", action="store_true",
                    help="preload the ENTIRE term->df dictionary to the driver "
                         "(bounded only for small vocabularies; default is the "
                         "per-query pushed-filter fetch + hot-term cache)")
    bq.add_argument("queries", nargs="+")
    bq.set_defaults(fn=cmd_bench_queries)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
