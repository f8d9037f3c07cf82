"""Interactive shell (reference REPL parity, cmds.rs surface)."""
from __future__ import annotations

import pytest

from textindex_spark.build import build_index
from textindex_spark.corpus import synth_corpus
from textindex_spark.shell import PAGE, Shell

from tests.spark_fixtures import corpus_df, spark  # noqa: F401


@pytest.fixture(scope="module")
def shell(spark, tmp_path_factory):
    rows = synth_corpus(220, seed=5)
    out = str(tmp_path_factory.mktemp("shellidx"))
    docs_path = str(tmp_path_factory.mktemp("shelldocs") / "documents.parquet")
    df = corpus_df(spark, rows)
    df.write.parquet(docs_path, mode="overwrite")
    build_index(spark, df, out, range_bits=6)
    return Shell(spark, out, docs_path)


def test_help_and_unknown(shell):
    out = shell.dispatch("help")
    for cmd in ("find <match...> [-exclude...]", "files <match>", "stats base | debug | <word>"):
        assert cmd in out
    assert "unknown command" in shell.dispatch("bogus")
    assert shell.dispatch("") == ""


def test_find_pages_and_matched_lines(shell):
    out = shell.dispatch("find spark")
    # reference prints "  idx:file" then matched lines indented
    assert "  0:" in out and "https://" in out
    n_found = len(shell.found)
    assert n_found > PAGE  # hot term: more than one page
    assert out.strip().endswith("...")  # cursor not exhausted
    assert shell.lines_idx == PAGE
    # every printed line block contains the query term
    for url, lines in shell.found[:5]:
        assert all("spark" in line.split(" ") or "spark" in line for line in lines)
    # next pages forward; first rewinds
    out2 = shell.dispatch("next")
    assert f"  {PAGE}:" in out2
    out3 = shell.dispatch("first")
    assert "  0:" in out3 and shell.lines_idx == PAGE


def test_find_with_not_terms(shell, spark):
    """`find spark -archive` drops every doc containing `archive`
    (NOT syntax, engine extension) and matches
    find_unranked(exclude=)."""
    from textindex_spark.query import find_unranked

    shell.dispatch("find spark")
    base = {u for u, _ in shell.found}
    shell.dispatch("find spark -archive")
    got = {u for u, _ in shell.found}
    want = {
        r["url"]
        for r in find_unranked(
            spark, shell.index_dir, ["spark"], exclude=["archive"]
        ).collect()
    }
    assert got == want
    with_excl = {
        r["url"]
        for r in find_unranked(spark, shell.index_dir, ["archive"]).collect()
    }
    assert got == base - with_excl and got < base


def test_bool_with_scope(shell, spark):
    """`bool <expr> lang:de` strips the scope token from the expr and
    keeps only matching docs — matches search_bool(scope=)."""
    from textindex_spark.boolquery import search_bool

    shell.dispatch("bool spark OR vector")
    base = {u.split("  [")[0] for u, _ in shell.found}
    shell.dispatch("bool spark OR vector lang:de")
    got = {u.split("  [")[0] for u, _ in shell.found}
    want = {
        r["url"]
        for r in search_bool(
            spark, shell.index_dir, "spark OR vector", k=20, scope="lang:de"
        ).collect()
    }
    assert got == want and got and got != base
    assert all("/de/" in u for u in got)
    # a scope token glued to a paren would become an unmatchable
    # boolean leaf — rejected with guidance instead
    assert "outside the expression" in shell.dispatch(
        "bool spark AND (lang:de OR vector)"
    )
    assert "outside the expression" in shell.dispatch(
        "bool spark AND (ts:2025-01-01..2025-02-01 OR vector)"
    )
    # a token merely CONTAINING a scope prefix mid-word (e.g. the
    # term "stats:x") is an ordinary — unmatchable — leaf, not a
    # misplaced scope: the query still runs
    shell.dispatch("bool spark")
    only_spark = {u.split("  [")[0] for u, _ in shell.found}
    shell.dispatch("bool spark OR stats:x")
    assert {u.split("  [")[0] for u, _ in shell.found} == only_spark


def test_suggest_command(shell, spark):
    """`suggest querry` prints did-you-mean candidates matching
    suggest_terms' ranking (engine extension)."""
    from textindex_spark.query import suggest_terms

    out = shell.dispatch("suggest querry")
    want = suggest_terms(spark, shell.index_dir, "querry")
    assert len(want) and "distance" in out
    for r in want.itertuples(index=False):
        assert f"  {r.term} (distance {r.dist}, {r.df} docs)" in out
    assert "usage" in shell.dispatch("suggest")
    assert "no suggestions" in shell.dispatch("suggest qqqqzzzzzzqq")


def test_similar_command(shell, spark, capsys):
    """`similar <doc_id>` prints the more-like-this ranking with
    urls; bad input gets a usage line."""
    from textindex_spark.query import more_like_this

    out = shell.dispatch("similar 0")
    want = more_like_this(
        spark, shell.index_dir, spark.read.parquet(shell.docs_path), 0,
        with_urls=True,
    ).collect()
    assert want and "  0:" in out
    for i, r in enumerate(want):
        assert f"  {i}:{r['url']}" in out
    assert "usage" in shell.dispatch("similar")
    assert "usage" in shell.dispatch("similar notanumber")
    assert "not found" in shell.dispatch("similar 999999999")


def test_find_with_scope(shell, spark):
    """`find spark lang:de` keeps only German docs (metadata scope,
    engine extension) and matches find_unranked(scope=)."""
    from textindex_spark.query import find_unranked

    shell.dispatch("find spark")
    base = {u for u, _ in shell.found}
    shell.dispatch("find spark lang:de")
    got = {u for u, _ in shell.found}
    want = {
        r["url"]
        for r in find_unranked(
            spark, shell.index_dir, ["spark"], scope="lang:de"
        ).collect()
    }
    assert got == want
    assert got and got < base  # the scope bites
    assert all("/de/" in u for u in got)
    # one scope max; bad field rejected upstream by parse_scope
    assert "at most one" in shell.dispatch("find spark lang:de site:x")


def test_find_with_ts_scope(shell, spark):
    """`find spark ts:A..B` keeps only docs whose crawl fetch time
    falls in the window (corpus: 2025-01-01Z + 13 s · doc_id)."""
    from textindex_spark.query import find_unranked

    shell.dispatch("find spark")
    base = {u for u, _ in shell.found}
    win = "ts:2025-01-01T00:05:00..2025-01-01T00:25:00"
    shell.dispatch(f"find spark {win}")
    got = {u for u, _ in shell.found}
    want = {
        r["url"]
        for r in find_unranked(
            spark, shell.index_dir, ["spark"], scope=win
        ).collect()
    }
    assert got == want
    assert got and got < base  # the window bites
    assert "at most one" in shell.dispatch(f"find spark lang:de {win}")


def test_files_and_stats_and_store(shell, tmp_path):
    out = shell.dispatch("files *site3.example*")
    assert "site3.example" in out and "  0:" in out
    assert shell.dispatch("next") == ""  # files prints everything at once

    out = shell.dispatch("stats base")
    assert "n_docs=" in out and "postings:" in out and "snapshot=v" in out

    out = shell.dispatch("stats spark")
    assert "df=" in out and "blocks=" in out and "range=" in out
    assert "not in dictionary" in shell.dispatch("stats zzznotaword")

    out = shell.dispatch("stats debug")
    assert "written to" in out
    log = out.strip().split()[-1]
    head = open(log, encoding="utf-8").readline()
    assert ": [" in head and "n=" in head  # "word: [id] n=count" shape

    assert "snapshot v" in shell.dispatch("store")
    assert shell.dispatch("summary 5") == ""  # reference no-op


def test_delete_then_find_excludes(shell):
    before = len(shell.dispatch("find spark") and shell.found)
    out = shell.dispatch("delete *site3.example*")
    assert "deleted" in out and "deleted 0" not in out
    shell.dispatch("find spark")
    after = len(shell.found)
    assert after < before
    assert all("site3.example" not in url for url, _ in shell.found)


def test_completion(shell):
    assert shell.complete("f", "f") == ["find", "files", "first"]
    assert shell.complete("st", "st") == ["stats", "store"]
    terms = shell.complete("spar", "find spar")
    assert terms == ["spark"]
    assert shell.complete("", "files ") == []  # no term completion for files


def test_run_loop_scripted(shell, capsys):
    from textindex_spark.shell import run_loop

    run_loop(shell, input_lines=["files *site5*", "quit", "files *site6*"])
    out = capsys.readouterr().out
    assert "site5.example" in out
    assert "site6.example" not in out  # quit stops the loop


def test_bool_command(shell, spark):
    """`bool` runs a ranked nested tree and pages urls+scores; the
    hit set matches search_bool directly."""
    from textindex_spark.boolquery import search_bool

    out = shell.dispatch("bool spark AND (query OR woven)")
    assert "  0:" in out and "[" in out  # url + score rendering
    want = [
        r["url"]
        for r in search_bool(
            spark, shell.index_dir, "spark AND (query OR woven)", k=PAGE
        ).collect()
    ]
    got = [u.split("  [")[0] for u, _ in shell.found]
    assert got == want
    assert "usage: bool" in shell.dispatch("bool")
    assert "error" in shell.dispatch("bool NOT spark")  # pure negation


def test_anchor_command(shell, spark, tmp_path):
    # without an anchor index the command explains how to get one
    out = shell.dispatch("anchor spark")
    assert "--anchor-index" in out
    # wire one up: two minted incoming links per indexed doc
    from pyspark.sql import functions as F

    from textindex_spark import fields, manifest

    docs = manifest.read_table(spark, shell.index_dir, "docs").select(
        "doc_id", "url"
    )
    links = docs.select(
        F.lit("http://ref.example/").alias("src_url"),
        F.col("url").alias("dst_url"),
        F.lit("zzshellanchor probe").alias("anchor"),
        F.lit(False).alias("nofollow"),
    ).where(F.col("doc_id") % 7 == 0)
    adir = str(tmp_path / "anchor")
    fields.build_anchor_index(spark, shell.index_dir, adir, links=links,
                              range_bits=6)
    shell.anchor_dir = adir
    try:
        out = shell.dispatch("anchor zzshellanchor")
        assert "https://" in out and "(" in out  # ranked url + score lines
        assert "usage:" in shell.dispatch("anchor")
    finally:
        # module-scoped fixture: leave no anchor_dir for later tests
        shell.anchor_dir = None
