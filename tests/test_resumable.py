"""Resumable-build semantics: lineage skip (S8 analog), crash
recovery, metrics rows, and equality with the single-shot build."""
import pytest

from textindex_spark import manifest
from textindex_spark.build import (
    build_index,
    build_index_resumable,
    pending_partitions,
    read_lineage,
)
from textindex_spark.corpus import synth_corpus

from tests.spark_fixtures import corpus_df, spark  # noqa: F401


@pytest.fixture(scope="module")
def rows():
    return synth_corpus(120)


def _index_signature(spark, index_dir):
    terms = sorted(
        (r["term"], r["df"], r["cf"])
        for r in manifest.read_table(spark, index_dir, "terms").collect()
    )
    docs = sorted(
        (r["doc_id"], r["doc_len"])
        for r in manifest.read_table(spark, index_dir, "docs").collect()
    )
    return terms, docs


def test_resume_after_crash_matches_full_build(spark, rows, tmp_path):
    full_dir = str(tmp_path / "full")
    res_dir = str(tmp_path / "resumable")
    build_index(spark, corpus_df(spark, rows), full_dir, range_bits=6)

    # crash after 2 of 5 partitions
    with pytest.raises(RuntimeError, match="simulated failure"):
        build_index_resumable(
            spark, corpus_df(spark, rows), res_dir, n_parts=5, range_bits=6,
            fail_after=2,
        )
    assert len(pending_partitions(spark, res_dir, 5)) == 3
    lineage = read_lineage(spark, res_dir).collect()
    assert len(lineage) == 2
    for row in lineage:
        assert row["n_docs"] > 0 and row["bytes"] > 0 and row["n_postings"] > 0

    # resume: only the 3 remaining partitions are built
    stats = build_index_resumable(
        spark, corpus_df(spark, rows), res_dir, n_parts=5, range_bits=6
    )
    assert pending_partitions(spark, res_dir, 5) == []
    assert len(read_lineage(spark, res_dir).collect()) == 5
    assert stats["n_docs"] > 0

    assert _index_signature(spark, res_dir) == _index_signature(spark, full_dir)


def test_rerun_is_noop_on_segments(spark, rows, tmp_path):
    out = str(tmp_path / "idx")
    build_index_resumable(spark, corpus_df(spark, rows), out, n_parts=3, range_bits=6)
    lineage1 = sorted(r["pid"] for r in read_lineage(spark, out).collect())
    # second run: nothing pending, lineage unchanged
    build_index_resumable(spark, corpus_df(spark, rows), out, n_parts=3, range_bits=6)
    lineage2 = sorted(r["pid"] for r in read_lineage(spark, out).collect())
    assert lineage1 == lineage2 == [0, 1, 2]


def test_resume_refuses_changed_mint_assignment(spark, rows, tmp_path):
    """Minted doc_ids are only stable across runs when the input scan
    partitioning is unchanged — a resume whose id↔content assignment
    drifted must RAISE instead of silently minting ids that collide
    with committed partitions (two docs per doc_id would corrupt
    AND-masks and BM25 sums)."""
    res_dir = str(tmp_path / "res_mint")
    src_many = str(tmp_path / "src_many")
    src_one = str(tmp_path / "src_one")
    # same DATA, two physical layouts → different scan splits →
    # different minted assignment
    corpus_df(spark, rows).drop("doc_id").repartition(6).write.parquet(src_many)
    spark.read.parquet(src_many).orderBy("url").coalesce(1).write.parquet(
        src_one
    )

    with pytest.raises(RuntimeError, match="simulated failure"):
        build_index_resumable(
            spark, spark.read.parquet(src_many), res_dir,
            n_parts=5, range_bits=6, fail_after=2,
        )
    with pytest.raises(RuntimeError, match="assignment"):
        build_index_resumable(
            spark, spark.read.parquet(src_one), res_dir,
            n_parts=5, range_bits=6,
        )
    # resuming with the ORIGINAL layout completes normally
    stats = build_index_resumable(
        spark, spark.read.parquet(src_many), res_dir, n_parts=5, range_bits=6
    )
    assert stats["n_docs"] > 0
