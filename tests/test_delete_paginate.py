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


def test_purge_deleted_equals_fresh_build(spark, tmp_path_factory):
    """Physical purge after tombstone deletes: the purged index must
    be rank- AND score-identical to a fresh build over the surviving
    docs (exact df/avgdl, not the tombstone approximation), with the
    deleted table dropped, no dead doc in any posting block, and the
    pre-purge snapshot still readable for rollback."""
    import math

    from textindex_spark import manifest
    from textindex_spark.build import purge_deleted
    from textindex_spark.corpus import query_set

    rows = synth_corpus(200)
    base = tmp_path_factory.mktemp("purge")
    idx = str(base / "idx")
    build_index(spark, corpus_df(spark, rows), idx, range_bits=6)
    assert purge_deleted(spark, idx) == 0  # no tombstones: no-op
    n = delete_docs(spark, idx, "*site3.example*")
    assert n > 0
    v_tomb = manifest.current_manifest(spark, idx)["version"]
    dead = {
        r["doc_id"] for r in manifest.read_table(spark, idx, "deleted").collect()
    }
    assert purge_deleted(spark, idx) == n
    assert not manifest.table_exists(spark, idx, "deleted")
    # the staging subtree must NOT carry its own manifest — an orphan
    # nested snapshot would make purge_N/ masquerade as a live index
    import glob as _glob

    assert not _glob.glob(f"{idx}/purge_*/_manifests")
    # no dead doc survives in docs or postings
    live = {r["doc_id"] for r in manifest.read_table(spark, idx, "docs").collect()}
    assert not (live & dead)
    from textindex_spark.query import _decoded_postings, cached_stats

    stats = cached_stats(spark, idx)
    import pyspark.sql.functions as F

    some_docs = {
        r["doc_id"]
        for r in _decoded_postings(
            spark, idx,
            spark.createDataFrame([("spark", 0.0, 1)], "term string, idf double, mask int"),
            stats, ["spark"],
        ).select("doc_id").distinct().collect()
    }
    assert not (some_docs & dead)
    # score-identical to a fresh build over the survivors
    fresh = str(base / "fresh")
    kept_rows = [r for r in rows if "site3.example" not in r["url"]]
    build_index(spark, corpus_df(spark, kept_rows), fresh, range_bits=6)
    for q in query_set()[:3]:
        want = [
            (r["doc_id"], r["score"])
            for r in search(spark, fresh, q["terms"], k=q["k"], with_urls=False).collect()
        ]
        got = [
            (r["doc_id"], r["score"])
            for r in search(spark, idx, q["terms"], k=q["k"], with_urls=False).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (gd, gs), (_, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=1e-9), (q, gd)
    # the tombstoned snapshot is still there (rollback-able)
    assert manifest.manifest_at(spark, idx, v_tomb)["tables"]["deleted"]


def test_append_after_purge(spark, tmp_path_factory):
    """The purged snapshot composes with incremental append: purge
    swaps every table to purge_{gen}/ dirs, and a later append must
    stage against THOSE lists and stay rank-identical to a fresh
    build over (survivors + appended batch)."""
    import math

    from textindex_spark.build import append_batch, purge_deleted
    from textindex_spark.corpus import query_set

    rows = synth_corpus(250)
    base = tmp_path_factory.mktemp("purgeapp")
    idx = str(base / "idx")
    build_index(spark, corpus_df(spark, rows[:200]), idx, range_bits=6)
    assert delete_docs(spark, idx, "*site3.example*") > 0
    purge_deleted(spark, idx)
    append_batch(spark, corpus_df(spark, rows[200:]), idx)

    fresh = str(base / "fresh")
    kept = [r for r in rows[:200] if "site3.example" not in r["url"]] + rows[200:]
    build_index(spark, corpus_df(spark, kept), fresh, range_bits=6)
    for q in query_set()[:3]:
        want = [
            (r["doc_id"], r["score"])
            for r in search(spark, fresh, q["terms"], k=q["k"], with_urls=False).collect()
        ]
        got = [
            (r["doc_id"], r["score"])
            for r in search(spark, idx, q["terms"], k=q["k"], with_urls=False).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (gd, gs), (_, ws) in zip(got, want):
            assert math.isclose(gs, ws, rel_tol=1e-9), (q, gd)


def test_redelete_overlapping_pattern_is_noop(spark, tmp_path_factory):
    """Re-deleting an overlapping pattern must count (and tombstone)
    only NEWLY dead docs: duplicate tombstone rows would inflate the
    reported count and prematurely trip TOMBSTONE_LOCAL_MAX's
    row-count cap, disabling the zero-job serving path."""
    from textindex_spark import manifest

    rows = synth_corpus(120)
    idx = str(tmp_path_factory.mktemp("redel") / "idx")
    build_index(spark, corpus_df(spark, rows), idx, range_bits=6)
    n1 = delete_docs(spark, idx, "*site3.example*")
    assert n1 > 0
    # identical pattern again: nothing newly dead
    assert delete_docs(spark, idx, "*site3.example*") == 0
    # superset pattern: counts only the docs not already tombstoned
    n_all = delete_docs(spark, idx, "*")
    total = manifest.read_table(spark, idx, "docs").count()
    assert n_all == total - n1
    # tombstone table holds exactly one row per dead doc
    dead = manifest.read_table(spark, idx, "deleted")
    assert dead.count() == dead.select("doc_id").distinct().count() == total


def test_too_many_patterns_rejected(spark, index_dir):
    """64+ patterns overflow the int64 bitmask paths — reject with a
    clear error instead of an OverflowError mid-aggregation."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="too many query patterns"):
        search(spark, index_dir, [f"t{i}" for i in range(64)], k=5)


def test_delete_before_retention(spark, tmp_path_factory):
    """Retention delete (`delete_before`, admin --delete-before):
    docs crawled strictly before the cutoff are tombstoned — same
    staged-commit machinery as url deletes — while docs with a null
    fetch time are KEPT (an unknown crawl time must not satisfy a
    retention cutoff). Malformed cutoffs fail loudly."""
    from textindex_spark.build import purge_deleted
    from textindex_spark.query import delete_before

    rows = synth_corpus(120, seed=3)
    # one doc with an unknown fetch time, old enough that a naive
    # predicate would delete it
    rows[5] = dict(rows[5], warc_ts=None)
    out = str(tmp_path_factory.mktemp("ret") / "idx")
    build_index(spark, corpus_df(spark, rows), out, range_bits=6)
    import pyspark.sql.functions as F

    docs = spark.read.parquet(f"{out}/docs")
    cutoff = "2025-01-01T00:10:00"
    import datetime as dt

    bound = dt.datetime(2025, 1, 1, 0, 10, 0)
    old_ids = {
        r["doc_id"]
        for r in docs.collect()
        if r["warc_ts"] is not None
        and r["warc_ts"].replace(tzinfo=None) < bound
    }
    assert old_ids and 5 not in old_ids  # null-ts doc not a victim
    n = delete_before(spark, out, cutoff)
    assert n == len(old_ids)
    hits = {
        r["doc_id"]
        for r in search(
            spark, out, ["spark"], k=10**6, mode="or", with_urls=False
        ).collect()
    }
    assert hits and not (hits & old_ids)
    # the null-ts doc (if it matches) is still servable
    # re-run: idempotent (no new victims)
    assert delete_before(spark, out, cutoff) == 0
    # physical reclaim composes
    assert purge_deleted(spark, out) == len(old_ids)
    hits2 = {
        r["doc_id"]
        for r in search(
            spark, out, ["spark"], k=10**6, mode="or", with_urls=False
        ).collect()
    }
    assert hits2 == hits
    with pytest.raises(ValueError):
        delete_before(spark, out, "not-a-timestamp")
