"""Tombstone deletes (beyond the reference's remove_file stub,
index2.rs:462-464) and first/next pagination (main.rs:233-276)."""
import pytest

from textindex_spark.build import build_index
from textindex_spark.corpus import synth_corpus
from textindex_spark.query import SearchSession, delete_docs, find_unranked, search

from tests.spark_fixtures import corpus_df, spark  # noqa: F401


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    rows = synth_corpus(200)
    out = str(tmp_path_factory.mktemp("del") / "idx")
    build_index(spark, corpus_df(spark, rows), out, range_bits=6)
    return out


def test_delete_removes_from_results(spark, index_dir):
    before = [r["doc_id"] for r in search(spark, index_dir, ["spark"], k=5, with_urls=True).collect()]
    victim = before[0]
    url = [
        r["url"] for r in
        spark.read.parquet(f"{index_dir}/docs").filter(f"doc_id = {victim}").collect()
    ][0]
    n = delete_docs(spark, index_dir, url)
    assert n == 1
    after_local = [r["doc_id"] for r in search(spark, index_dir, ["spark"], k=5, with_urls=False, local_score=True).collect()]
    after_dist = [r["doc_id"] for r in search(spark, index_dir, ["spark"], k=5, with_urls=False, local_score=False).collect()]
    assert victim not in after_local and victim not in after_dist
    assert after_local == after_dist
    assert victim not in {r["doc_id"] for r in find_unranked(spark, index_dir, ["spark"]).collect()}
    # deleting a url glob with no match is a no-op
    assert delete_docs(spark, index_dir, "nosuch*") == 0


def test_pruned_search_respects_tombstones(spark, index_dir):
    """θ for block-max pruning must come from LIVE scores: after
    deleting several of the top docs, prune=True must return exactly
    what prune=False returns (the pruner previously took θ from a
    probe that still counted deleted docs and could prune away the
    true live top-k)."""
    before = [
        r["doc_id"]
        for r in search(spark, index_dir, ["spark"], k=5, with_urls=False).collect()
    ]
    for victim in before[:3]:
        url = spark.read.parquet(f"{index_dir}/docs").filter(
            f"doc_id = {victim}"
        ).collect()[0]["url"]
        delete_docs(spark, index_dir, url)
    exact = [
        (r["doc_id"], round(r["score"], 9))
        for r in search(
            spark, index_dir, ["spark"], k=5, with_urls=False, prune=False
        ).collect()
    ]
    pruned = [
        (r["doc_id"], round(r["score"], 9))
        for r in search(
            spark, index_dir, ["spark"], k=5, with_urls=False, prune=True
        ).collect()
    ]
    assert pruned == exact
    assert not (set(before[:3]) & {d for d, _ in pruned})


def test_pagination(spark, index_dir):
    sess = SearchSession(spark, index_dir, ["spark"], k=100, page_size=7)
    p1 = sess.first()
    p2 = sess.next()
    assert len(p1) == 7 and len(p2) == 7
    assert [r["doc_id"] for r in p1] != [r["doc_id"] for r in p2]
    # first() rewinds
    assert [r["doc_id"] for r in sess.first()] == [r["doc_id"] for r in p1]
