"""The stdin query-server loop (cli serve): request/response contract
driven in-process against a real index — plain BM25 line, :phrase,
:regex (store-docs), error handling, :quit termination. The BM25
results must equal the one-shot query_index path (the warm server is
a deployment shape, never a different engine)."""

import argparse
import io
import json

from searty_spark.index import query_index, write_index


def test_serve_loop_contract(spark, small_corpus, tmp_path, monkeypatch, capsys):
    from searty_spark import cli

    d = str(tmp_path / "idx")
    write_index(small_corpus, d, n_shards=2, n_buckets=4, store_docs=True)

    monkeypatch.setattr(
        "sys.stdin",
        io.StringIO(
            "shared\n"
            ":phrase shared phrase\n"
            ":regex shar(ed|k)\n"
            ":bogus x\n"
            "\n"
            ":quit\n"
            "never reached\n"
        ),
    )
    cli.cmd_serve(argparse.Namespace(cpus=4, index=d, k=5))
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]

    assert lines[0]["ready"] is True
    bm25 = lines[1]
    assert bm25["mode"] == "bm25"
    want = [
        [r["doc_id"], r["score"]] for r in query_index(spark, d, "shared", k=5).collect()
    ]
    assert bm25["results"] == want

    phrase = lines[2]
    assert phrase["mode"] == "phrase" and len(phrase["results"]) > 0

    regex = lines[3]
    assert regex["mode"] == "regex" and len(regex["results"]) > 0

    assert "error" in lines[4] and "bogus" in lines[4]["error"]
    # :quit stopped the loop before the trailing line
    assert len(lines) == 5

    # :batch answers many BM25 queries in ONE segment scan; results
    # must equal the sequential per-query answers, aligned with the
    # request array (including a no-hit query -> empty list)
    monkeypatch.setattr(
        "sys.stdin",
        io.StringIO(
            'shared\nmodule\nquery\n:batch ["shared", "module", "query", "@@"]\n:quit\n'
        ),
    )
    cli.cmd_serve(argparse.Namespace(cpus=4, index=d, k=5))
    blines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    seq = blines[1:4]
    batch = blines[4]
    assert batch["mode"] == "batch"
    for i in range(3):
        assert batch["results"][i] == seq[i]["results"]
    assert batch["results"][3] == []  # "@@" yields no trigram at all

    # a malformed regex raises re.error / Py4JJavaError, NOT ValueError
    # — the server must still answer that seq with an error line (and
    # with --threads the worker must not die silently)
    monkeypatch.setattr("sys.stdin", io.StringIO(":regex ([unclosed\nshared\n:quit\n"))
    cli.cmd_serve(argparse.Namespace(cpus=4, index=d, k=5, threads=2))
    elines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    got_e = {r["seq"]: r for r in elines[1:]}
    assert sorted(got_e) == [0, 1]
    assert "error" in got_e[0] and "results" in got_e[1]

    # --threads: responses arrive in completion order, tagged with seq;
    # every request is answered exactly once and bm25 results match
    monkeypatch.setattr(
        "sys.stdin", io.StringIO("shared\nmodule\nquery\nshared\n:quit\n")
    )
    cli.cmd_serve(argparse.Namespace(cpus=4, index=d, k=5, threads=4))
    clines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert clines[0]["threads"] == 4
    got = {r["seq"]: r for r in clines[1:]}
    assert sorted(got) == [0, 1, 2, 3]
    assert got[0]["results"] == want and got[3]["results"] == want


def test_clean_subcommand_end_to_end(spark, tmp_path, capsys):
    """`cli clean` writes the composite's survivors as parquet and the
    stats line agrees with a direct prepare_training_corpus call —
    including the optional substring-excision stage."""
    from pyspark.sql import functions as F

    from searty_spark import cli
    from searty_spark.pipeline import prepare_training_corpus

    src = "/root/testdata/sf0.001/documents.parquet"
    out = str(tmp_path / "cleaned")
    cli.cmd_clean(
        argparse.Namespace(
            cpus=4,
            corpus=src,
            out=out,
            bench=None,
            n_contam=5,
            min_tokens=4,
            substring_k=10,
            min_stopword_ratio=0.0,
            max_symbol_ratio=1.0,
        )
    )
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    docs = spark.read.parquet(src).select("doc_id", "text")
    want = prepare_training_corpus(
        docs,
        min_tokens=4,
        substring_k=10,
        min_stopword_ratio=0.0,
        max_symbol_ratio=1.0,
    )
    got = spark.read.parquet(out).orderBy("doc_id")
    assert stats["n_survivors"] == want.count() == got.count()
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]
    # the excision stage actually rewrote something
    assert (
        got.join(docs, "doc_id").filter(F.col("clean_text") != F.col("text")).count()
        > 0
    )
