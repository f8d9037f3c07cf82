"""Incremental append: index(200)+append(100) ≡ index(300), without
rewriting existing posting blocks; compaction merges split rows."""
import math

import pytest
from pyspark.sql import functions as F

from textindex_spark import manifest
from textindex_spark.build import append_batch, build_index, compact_postings
from textindex_spark.corpus import query_set, synth_corpus
from textindex_spark.query import search
from textindex_spark.refimpl.oracle import OracleIndex

from tests.spark_fixtures import corpus_df, spark  # noqa: F401


@pytest.fixture(scope="module")
def rows():
    return synth_corpus(300)


@pytest.fixture(scope="module")
def dirs(spark, rows, tmp_path_factory):
    base = tmp_path_factory.mktemp("append")
    full_dir = str(base / "full")
    inc_dir = str(base / "inc")
    build_index(spark, corpus_df(spark, rows), full_dir, range_bits=6)
    build_index(spark, corpus_df(spark, rows[:200]), inc_dir, range_bits=6)
    append_batch(spark, corpus_df(spark, rows[200:]), inc_dir)
    return full_dir, inc_dir


def _sig(spark, d):
    terms = sorted(
        (r["term"], r["df"], r["cf"])
        for r in manifest.read_table(spark, d, "terms").collect()
    )
    docs = sorted(
        (r["doc_id"], r["doc_len"])
        for r in manifest.read_table(spark, d, "docs").collect()
    )
    stats = manifest.read_table(spark, d, "stats").collect()[0]
    return terms, docs, stats["n_docs"], round(stats["avgdl"], 9)


def test_append_matches_full_build(spark, dirs):
    full_dir, inc_dir = dirs
    assert _sig(spark, full_dir) == _sig(spark, inc_dir)


def test_append_search_rank_identical(spark, rows, dirs):
    full_dir, inc_dir = dirs
    oracle = OracleIndex.build(rows)
    for q in query_set()[:8]:
        want = oracle.search(q["terms"], q["k"])
        for prune in (False, True):
            got = [
                (r["doc_id"], r["score"])
                for r in search(
                    spark, inc_dir, q["terms"], k=q["k"],
                    with_urls=False, prune=prune,
                ).collect()
            ]
            assert [d for d, _ in got] == [d for d, _ in want], (q, prune)
            for (gd, gs), (_, ws) in zip(got, want):
                assert math.isclose(gs, ws, rel_tol=1e-9)


def test_append_rejects_id_collision(spark, rows, dirs):
    _, inc_dir = dirs
    with pytest.raises(ValueError, match="doc_ids above"):
        append_batch(spark, corpus_df(spark, rows[:5]), inc_dir)


def test_compaction_preserves_results(spark, rows, dirs):
    full_dir, inc_dir = dirs
    post = manifest.read_table(spark, inc_dir, "postings")
    n_split = (
        post.groupBy("term", "range_id").count().filter(F.col("count") > 1).count()
    )
    assert n_split > 0  # the append really did split some (term, range) keys
    merged = compact_postings(spark, inc_dir)
    assert merged == n_split
    post2 = manifest.read_table(spark, inc_dir, "postings")
    assert post2.groupBy("term", "range_id").count().filter(F.col("count") > 1).count() == 0
    oracle = OracleIndex.build(rows)
    q = query_set()[1]
    want = oracle.search(q["terms"], q["k"])
    got = [
        (r["doc_id"], r["score"])
        for r in search(spark, inc_dir, q["terms"], k=q["k"], with_urls=False).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]


def test_maybe_compact_policy(spark, rows, dirs):
    """maybe_compact triggers only at the postings-dir threshold and
    is manifest-only (free) below it."""
    from textindex_spark.build import maybe_compact

    _, inc_dir = dirs
    if len(manifest.table_paths(spark, inc_dir, "postings")) == 1:
        # an earlier test may have compacted the shared index —
        # re-split it with a fresh tiny append
        extra = [dict(r, doc_id=10_000 + i, url=f"{r['url']}?v2")
                 for i, r in enumerate(rows[:40])]
        append_batch(spark, corpus_df(spark, extra), inc_dir)
    n_dirs = len(manifest.table_paths(spark, inc_dir, "postings"))
    assert n_dirs >= 2  # base + at least one append
    assert maybe_compact(spark, inc_dir, max_postings_dirs=n_dirs + 1) == 0
    assert len(manifest.table_paths(spark, inc_dir, "postings")) == n_dirs
    rts_before = {
        r["range_id"]: (r["min_ts"], r["max_ts"])
        for r in manifest.read_table(spark, inc_dir, "range_ts")
        .groupBy("range_id")
        .agg(F.min("min_ts").alias("min_ts"), F.max("max_ts").alias("max_ts"))
        .collect()
    }
    maybe_compact(spark, inc_dir, max_postings_dirs=n_dirs)
    # triggered: dirs fold to one (via key merge or consolidation)
    assert len(manifest.table_paths(spark, inc_dir, "postings")) == 1
    # the per-append range_ts dirs fold too, bounds unchanged
    assert len(manifest.table_paths(spark, inc_dir, "range_ts")) == 1
    rts_after = {
        r["range_id"]: (r["min_ts"], r["max_ts"])
        for r in manifest.read_table(spark, inc_dir, "range_ts").collect()
    }
    assert rts_after == rts_before
    # and the index still answers identically
    extra_appended = (
        manifest.read_table(spark, inc_dir, "docs")
        .filter(F.col("doc_id") >= 10_000)
        .count()
        > 0
    )
    oracle = OracleIndex.build(
        rows
        + (
            [dict(r, doc_id=10_000 + i, url=f"{r['url']}?v2")
             for i, r in enumerate(rows[:40])]
            if extra_appended
            else []
        )
    )
    q = query_set()[0]
    want = oracle.search(q["terms"], q["k"])
    got = [
        (r["doc_id"], r["score"])
        for r in search(spark, inc_dir, q["terms"], k=q["k"], with_urls=False).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]


def test_append_zero_surviving_docs_no_collision(spark, rows, tmp_path_factory):
    """ADVICE r2: staging dirs were keyed only by base doc_id; an
    append that survives with ZERO docs leaves old_max unchanged, so
    the NEXT append reused the same staging names — overwriting live
    committed dirs and double-registering their paths. The tag now
    includes the manifest version."""
    d = str(tmp_path_factory.mktemp("zappend") / "idx")
    build_index(spark, corpus_df(spark, rows[:100]), d, range_bits=6)
    ref_terms, ref_docs, ref_n, ref_avgdl = _sig(spark, d)

    empty = corpus_df(spark, rows[:0])
    append_batch(spark, empty, d)   # zero docs -> old_max unchanged
    append_batch(spark, empty, d)   # would have collided pre-fix
    assert _sig(spark, d)[:3] == (ref_terms, ref_docs, ref_n)

    # a real append after the empties must equal a from-scratch build
    # of the union (nothing clobbered, nothing duplicated)
    append_batch(spark, corpus_df(spark, rows[100:150]), d)
    full = str(tmp_path_factory.mktemp("zappend_full") / "idx")
    build_index(spark, corpus_df(spark, rows[:150]), full, range_bits=6)
    assert _sig(spark, d) == _sig(spark, full)
    # registered postings dirs are all distinct
    paths = manifest.table_paths(spark, d, "postings")
    assert len(paths) == len(set(paths))


def test_rollback_restores_snapshot(spark, rows, tmp_path_factory):
    """Iceberg-style rollback: build(200) → append(100) → rollback to
    the pre-append snapshot must reproduce the 200-doc index exactly
    (tables, stats, and BM25 results), with history moving forward
    and list_versions reflecting both steps."""
    from textindex_spark.query import invalidate_cache

    d = str(tmp_path_factory.mktemp("rb") / "idx")
    build_index(spark, corpus_df(spark, rows[:200]), d, range_bits=6)
    v_before = manifest.current_manifest(spark, d)["version"]
    sig_before = _sig(spark, d)
    oracle200 = OracleIndex.build(rows[:200])
    append_batch(spark, corpus_df(spark, rows[200:]), d)
    assert _sig(spark, d) != sig_before

    man = manifest.rollback(spark, d, v_before)
    invalidate_cache(d)
    assert man["version"] > manifest.manifest_at(spark, d, v_before)["version"]
    assert man["props"]["rolled_back_to"] == v_before
    assert _sig(spark, d) == sig_before
    q = query_set()[0]
    want = oracle200.search(q["terms"], q["k"])
    got = [
        (r["doc_id"], round(r["score"], 9))
        for r in search(spark, d, q["terms"], k=q["k"], with_urls=False).collect()
    ]
    assert got == [(doc, round(s, 9)) for doc, s in want]
    hist = manifest.list_versions(spark, d)
    assert [h["version"] for h in hist] == list(range(1, man["version"] + 1))
    # nothing was deleted: the appended snapshot is still readable
    assert manifest.manifest_at(spark, d, v_before + 1)["tables"]["postings"]


def test_append_after_delete_keeps_live_stats(spark, rows, tmp_path_factory):
    """Regression (r4 close-out): append after a tombstone delete must
    compute n_docs/avgdl over LIVE docs only — previously the dead
    docs were resurrected into the stats and every idf drifted.
    Contract: delete→append is COMMUTATIVE with append→delete (same
    stats, same scores; exact-vs-fresh-build identity is the purge
    contract, since tombstoned postings keep their df until purge)."""
    base = tmp_path_factory.mktemp("append_del")
    from textindex_spark.query import delete_docs

    d1 = str(base / "del_then_append")
    build_index(spark, corpus_df(spark, rows[:200]), d1, range_bits=6)
    # the pattern must only match docs present BEFORE the append, or
    # the two orders genuinely delete different sets
    n_del = delete_docs(spark, d1, "*page1?.*")
    assert n_del > 0
    append_batch(spark, corpus_df(spark, rows[200:]), d1)

    d2 = str(base / "append_then_del")
    build_index(spark, corpus_df(spark, rows[:200]), d2, range_bits=6)
    append_batch(spark, corpus_df(spark, rows[200:]), d2)
    delete_docs(spark, d2, "*page1?.*")

    for d in (d1, d2):
        stats = manifest.read_table(spark, d, "stats").collect()[0]
        live = manifest.read_table(spark, d, "docs").join(
            manifest.read_table(spark, d, "deleted").select("doc_id"),
            "doc_id",
            "left_anti",
        )
        srow = live.agg(
            F.count("*").alias("n"), F.avg("doc_len").alias("a")
        ).collect()[0]
        assert stats["n_docs"] == srow["n"]
        assert abs(stats["avgdl"] - srow["a"]) < 1e-9
    for q in [["spark"], ["merge", "table"]]:
        got = [(r["url"], round(r["score"], 9))
               for r in search(spark, d1, q, k=10).collect()]
        want = [(r["url"], round(r["score"], 9))
                for r in search(spark, d2, q, k=10).collect()]
        assert got == want, q
        assert not any("/page1" == u[-10:-5] for u, _ in got)


def test_append_replace_by_url_upsert(spark, rows, tmp_path_factory):
    """Re-crawl upsert: replace_by_url tombstones the old version of
    each incoming url in the SAME commit that adds the new one —
    n_docs is unchanged, the old content is unfindable, the new
    content ranks; after a physical purge the index is
    score-identical to a fresh build over the replaced corpus."""
    from textindex_spark.build import purge_deleted

    base = tmp_path_factory.mktemp("upsert")
    d = str(base / "idx")
    build_index(spark, corpus_df(spark, rows[:200]), d, range_bits=6)
    n0 = manifest.read_table(spark, d, "stats").collect()[0]["n_docs"]
    # re-crawl two pages with fresh content (no doc_id: minting path)
    # re-fetched pages arrive as plain text (html=None — otherwise
    # the build pipeline extracts from the ORIGINAL html bytes and the
    # edited text column never reaches the tokenizer)
    refetch = [
        dict(rows[5], html=None, text="zanzibar unicorn " + rows[5]["text"]),
        dict(rows[7], html=None, text="zanzibar gazette " + rows[7]["text"]),
    ]
    stats = append_batch(
        spark,
        corpus_df(spark, refetch).drop("doc_id"),
        d,
        replace_by_url=True,
    )
    assert stats["n_docs"] == n0  # replaced, not added
    hits = search(spark, d, ["zanzibar"], k=5).collect()
    assert {r["url"] for r in hits} == {rows[5]["url"], rows[7]["url"]}
    assert all(r["doc_id"] >= 200 for r in hits)  # the new versions
    # retry idempotence at the corpus level: upserting the same batch
    # again replaces the just-added versions, n_docs stays stable
    stats2 = append_batch(
        spark,
        corpus_df(spark, refetch).drop("doc_id"),
        d,
        replace_by_url=True,
    )
    assert stats2["n_docs"] == n0
    # physical purge → exact equality with a fresh build over the
    # replaced corpus (df of the dead versions leaves the postings)
    purge_deleted(spark, d)
    by_url = {r["url"]: r for r in refetch}
    replaced = [by_url.get(r["url"], r) for r in rows[:200]]
    fresh = str(base / "fresh")
    build_index(spark, corpus_df(spark, replaced), fresh, range_bits=6)
    for q in [["zanzibar"], ["spark"], ["merge", "table"]]:
        got = [(r["url"], round(r["score"], 9))
               for r in search(spark, d, q, k=10).collect()]
        want = [(r["url"], round(r["score"], 9))
                for r in search(spark, fresh, q, k=10).collect()]
        assert got == want, q
