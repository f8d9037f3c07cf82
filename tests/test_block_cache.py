"""X5 — query-node posting-block cache.

The reference retains hot index blocks in memory between commands and
evicts the rest after each save (``cleanup``, reference
``src/index2.rs:363-374``; iteration-time ``discard``,
``src/index2/word_map.rs:326-334``). The Spark analog caches fetched
posting-block rows on the query node under an LRU byte budget
(``textindex_spark/query.py``: ``_block_cache`` / ``_fetch_blocks``).
These tests pin: (1) a warm serving query launches ZERO Spark jobs,
(2) warm results are identical to cold, on every path — including an
appended index where one (term, range_id) key owns several block
rows, (3) the byte budget evicts LRU, (4) snapshot mutations
invalidate.
"""
from __future__ import annotations

import pytest

from textindex_spark import query
from textindex_spark.build import append_batch, build_index
from textindex_spark.corpus import synth_corpus
from textindex_spark.query import delete_docs, invalidate_cache, search

from tests.spark_fixtures import corpus_df, spark  # noqa: F401


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    rows = synth_corpus(200)
    out = str(tmp_path_factory.mktemp("blockcache") / "idx")
    build_index(spark, corpus_df(spark, rows), out, range_bits=6)
    return out


def _cd_bytes(cd: str) -> int:
    return sum(v[1] for k, v in query._block_cache.items() if k[0] == cd)


def _jobs_during(spark, group: str, fn):
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try:
        out = fn()
    finally:
        sc.setJobGroup(None, None)
    return out, len(sc.statusTracker().getJobIdsForGroup(group))


def test_warm_query_zero_jobs_and_identical(spark, index_dir):
    invalidate_cache(index_dir)
    shapes = [
        dict(mode="and", prune=False),
        dict(mode="and", prune=True),
        dict(mode="or", prune=False),
        dict(mode="or", prune=True),
    ]
    for i, kw in enumerate(shapes):
        cold = search(
            spark, index_dir, ["spark", "index"], k=5, with_urls=False, **kw
        ).collect()
        warm, n_jobs = _jobs_during(
            spark,
            f"warm-{i}",
            lambda: search(
                spark, index_dir, ["spark", "index"], k=5, with_urls=False, **kw
            ).collect(),
        )
        assert [tuple(r) for r in warm] == [tuple(r) for r in cold], kw
        assert n_jobs == 0, f"{kw}: warm serving query launched {n_jobs} Spark jobs"
    cd = query.canon_dir(index_dir)
    assert _cd_bytes(cd) > 0
    assert any(k[0] == cd for k in query._meta_cache)


def test_wildcard_and_partial_warm_parity(spark, index_dir):
    invalidate_cache(index_dir)
    # warm one term via an exact query, then hit a wildcard whose
    # expansion overlaps it — the fetch must merge cached + missing
    # blocks without duplication
    search(spark, index_dir, ["spark"], k=5, with_urls=False).collect()
    cold = search(spark, index_dir, ["quer*", "spark"], k=5, with_urls=False).collect()
    invalidate_cache(index_dir)
    fresh = search(spark, index_dir, ["quer*", "spark"], k=5, with_urls=False).collect()
    assert [tuple(r) for r in cold] == [tuple(r) for r in fresh]


def test_eviction_respects_byte_budget(spark, index_dir, monkeypatch):
    invalidate_cache(index_dir)
    search(spark, index_dir, ["spark"], k=5, with_urls=False).collect()
    cd = query.canon_dir(index_dir)
    one_term = _cd_bytes(cd)
    assert one_term > 0
    # budget fits roughly one term's blocks: loading a second evicts
    # older entries (LRU), the GLOBAL total never exceeding the budget
    monkeypatch.setattr(query, "BLOCK_CACHE_MAX_BYTES", int(one_term * 1.5))
    search(spark, index_dir, ["index"], k=5, with_urls=False).collect()
    assert query._block_bytes <= int(one_term * 1.5)
    assert "index" in {k[1] for k in query._block_cache if k[0] == cd}
    invalidate_cache(index_dir)


def test_oversize_insert_skipped(spark, index_dir, monkeypatch):
    invalidate_cache(index_dir)
    monkeypatch.setattr(query, "BLOCK_CACHE_MAX_BYTES", 1)  # nothing fits
    a = search(spark, index_dir, ["spark"], k=5, with_urls=False).collect()
    b = search(spark, index_dir, ["spark"], k=5, with_urls=False).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert _cd_bytes(query.canon_dir(index_dir)) == 0
    invalidate_cache(index_dir)


def test_split_key_after_append_warm_parity(spark, tmp_path_factory):
    """After append_batch a (term, range_id) key owns SEVERAL block
    rows (build.py append_batch docstring); the cache must serve all
    of them — a warm query on an appended index must match cold on
    every shape (the r4 review's split-key finding)."""
    rows = synth_corpus(90, seed=3)
    out = str(tmp_path_factory.mktemp("splitkey") / "idx")
    # range_bits=6 → 64-doc ranges: batch 2 starts at doc_id 60,
    # inside batch 1's last range → guaranteed split keys for hot terms
    build_index(spark, corpus_df(spark, rows[:60]), out, range_bits=6)
    append_batch(spark, corpus_df(spark, rows[60:]), out)
    pdf = query._cached_table(spark, out, "postings").toPandas()
    dup = pdf.groupby(["term", "range_id"]).size()
    assert (dup > 1).any(), "fixture must produce split (term, range) keys"
    for kw in (dict(prune=False), dict(prune=True), dict(mode="or", prune=True)):
        cold = search(spark, out, ["spark", "index"], k=10, with_urls=False, **kw).collect()
        warm = search(spark, out, ["spark", "index"], k=10, with_urls=False, **kw).collect()
        warm2 = search(spark, out, ["spark", "index"], k=10, with_urls=False, **kw).collect()
        assert [tuple(r) for r in warm] == [tuple(r) for r in cold], kw
        assert [tuple(r) for r in warm2] == [tuple(r) for r in cold], kw


def test_mutation_invalidates_block_cache(spark, index_dir):
    invalidate_cache(index_dir)
    before = search(spark, index_dir, ["spark"], k=5, with_urls=False).collect()
    victim = before[0]["doc_id"]
    url = spark.read.parquet(f"{index_dir}/docs").filter(
        f"doc_id = {victim}"
    ).collect()[0]["url"]
    assert delete_docs(spark, index_dir, url) == 1
    after = search(spark, index_dir, ["spark"], k=5, with_urls=False).collect()
    assert victim not in [r["doc_id"] for r in after]


def test_warm_bool_query_zero_jobs(spark, index_dir):
    """A warm boolean-tree query serves entirely from the resident
    caches — zero Spark jobs, identical to the cold result."""
    from textindex_spark.boolquery import search_bool

    invalidate_cache(index_dir)
    q = "spark AND (index OR quer*) AND NOT merge"
    cold = search_bool(spark, index_dir, q, k=5, with_urls=False).collect()
    warm, n_jobs = _jobs_during(
        spark,
        "warm-bool",
        lambda: search_bool(spark, index_dir, q, k=5, with_urls=False).collect(),
    )
    # scores rounded: the cache returns blocks in a different order
    # than the cold scan, so the float sum can differ in the last ulp
    assert [(r["doc_id"], round(r["score"], 9)) for r in warm] == [
        (r["doc_id"], round(r["score"], 9)) for r in cold
    ]
    assert n_jobs == 0, f"warm bool query launched {n_jobs} Spark jobs"
