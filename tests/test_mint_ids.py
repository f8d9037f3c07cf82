"""Scale-safe doc_id minting: dense ids, no global-sort window.

The default build path for the input_hint shape (url, warc_ts, html,
text, lang — no doc_id) must not funnel the corpus through a single
task. ``mint_doc_ids`` replaces ``Window.orderBy(url)`` with the
two-pass partition-offset scheme; these tests pin density,
determinism, base offsets, and the physical-plan property (no
single-partition Exchange / no Window in the minting plan).
"""
from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from tests.spark_fixtures import corpus_df, spark  # noqa: F401
from textindex_spark.build import mint_doc_ids, normalize_input


def _docs_no_id(spark, n=200, parts=7):
    rows = [
        {
            "doc_id": i,  # dropped below
            "url": f"http://site{i % 13}.example/p{i:04d}.html",
            "warc_ts": datetime.datetime(2026, 1, 1),
            "html": None,
            "text": f"word{i} common text row {i % 5}",
            "lang": "en",
        }
        for i in range(n)
    ]
    return corpus_df(spark, rows).drop("doc_id").repartition(parts)


def test_mint_dense_and_unique(spark):
    df = mint_doc_ids(_docs_no_id(spark))
    ids = sorted(r["doc_id"] for r in df.select("doc_id").collect())
    assert ids == list(range(200))


def test_mint_base_offset(spark):
    df = mint_doc_ids(_docs_no_id(spark, n=50), base=1000)
    ids = sorted(r["doc_id"] for r in df.select("doc_id").collect())
    assert ids == list(range(1000, 1050))


def test_mint_deterministic_and_url_sorted_within_partition(spark):
    src = _docs_no_id(spark)
    a = {r["url"]: r["doc_id"] for r in mint_doc_ids(src).collect()}
    b = {r["url"]: r["doc_id"] for r in mint_doc_ids(src).collect()}
    assert a == b


def test_normalize_input_mints_when_missing(spark):
    out = normalize_input(_docs_no_id(spark, n=64))
    ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert ids == list(range(64))


def test_mint_plan_has_no_global_window(spark):
    plan = mint_doc_ids(_docs_no_id(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Exchange SinglePartition" not in plan
    # rangepartitioning(url) would also be a (sampled) global sort
    assert "rangepartitioning" not in plan.lower()
