"""Anchor-text retrieval field (the classic web-ranking signal).

A page is retrievable not only by its own words but by the words
OTHER pages use to link to it — incoming anchor text. The reference
has no link notion (it indexes a file tree); this is the
engine-extension surface that makes the inverted index a web search
engine: build a second index over each page's incoming-anchor digest
and rank with a weighted per-field BM25 sum (the Lucene
"linear-combination multi-field" model; per-field idf/avgdl/N come
from that field's own corpus, as in BM25F's simple form).

Scale shapes:

* the anchor corpus is `links → top_anchors` (two-level skew-safe
  aggregation, `ops/links.py`) joined to the docs table on canonical
  URL — one shuffle join keyed by near-unique page identity, then a
  normal `build_index` over rows that are ~a sentence each;
* `search_fielded` runs each field's scorer over its own index and
  merges with ONE full-outer join on doc_id: exact (every candidate
  keeps its partial scores), no per-field top-k truncation bias.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from textindex_spark import build as B
from textindex_spark import query as Q
from textindex_spark.ops.links import extract_links, top_anchors
from textindex_spark.ops.urls import with_canonical_url


def anchor_documents(
    docs: DataFrame, links: DataFrame, k: int = 8
) -> DataFrame:
    """→ (doc_id, url, text): one row per page with ≥1 incoming
    anchor; ``text`` is the page's top-K incoming anchor strings
    joined with spaces (the bounded digest — a 10⁷-in-link page
    contributes K strings, not 10⁷).

    ``docs`` needs (doc_id, url) — the index's docs table or a
    normalized corpus. ``links`` is `extract_links` output (dst_url
    already canonicalized); the join key is the canonical form of
    the page url, so trivially different spellings of the same page
    collect the same anchors."""
    pages = with_canonical_url(
        docs.select("doc_id", "url"), "url", "_curl"
    )
    digest = top_anchors(links, k=k)
    return (
        pages.join(digest, pages["_curl"] == digest["dst_url"], "inner")
        .select(
            "doc_id",
            "url",
            F.array_join("anchors", " ").alias("text"),
        )
    )


def build_anchor_index(
    spark: SparkSession,
    index_dir: str,
    anchor_dir: str,
    pages: DataFrame | None = None,
    links: DataFrame | None = None,
    k: int = 8,
    **build_kwargs,
) -> dict:
    """Build the anchor-field index for an existing body index.

    Either pass ``links`` (pre-extracted) or ``pages`` (raw crawl
    rows with url+html — links are extracted here). Doc ids are the
    BODY index's ids (joined by canonical url), so a fielded query
    merges scores on doc_id directly. Returns the build stats dict."""
    if links is None:
        if pages is None:
            raise ValueError("build_anchor_index needs pages or links")
        links = extract_links(pages)
    docs = Q._cached_table(spark, index_dir, "docs").select("doc_id", "url")
    adocs = anchor_documents(docs, links, k=k)
    return B.build_index(spark, adocs, anchor_dir, **build_kwargs)


def search_fielded(
    spark: SparkSession,
    index_dir: str,
    anchor_dir: str,
    patterns: list[str],
    k: int = 10,
    w_anchor: float = 1.0,
    with_urls: bool = True,
    scope: str | None = None,
) -> DataFrame:
    """Two-field BM25 top-k → (doc_id, score[, url]):
    score = bm25_body(doc) + w_anchor · bm25_anchor(doc), disjunctive
    over the union of both fields' match sets (a page matched ONLY by
    its incoming anchors still ranks — the web-search property this
    field exists for). Exact by construction: both scorers return
    their full match sets (`search(k=None)`) and merge in one
    full-outer join; ordering (score desc, doc_id asc).

    Conjunctive (mode='and') cross-field semantics are deliberately
    not offered: "every term in some field" has no single accepted
    meaning (per-field AND vs cross-field AND differ); compose
    `search(mode='and')` per field if that is wanted."""
    # scope is enforced ONCE, on the merged frame (anchor-only matches
    # must obey it too, so a body-side-only filter can never suffice).
    # The exception is a ts: scope, which ALSO rides down into the
    # body search for range_ts time pruning — posting ranges outside
    # the crawl window are skipped before decode; the merge-level
    # re-filter is then an idempotent semi-join. lang:/site: scopes
    # are NOT passed down: their only effect is the complement
    # filter, and running it per-field would just do the (driver
    # collect + join) work twice.
    body_scope = scope if scope and scope.startswith("ts:") else None
    body = Q.search(
        spark, index_dir, patterns, k=None, mode="or", with_urls=False,
        scope=body_scope,
    )
    anchor = Q.search(
        spark, anchor_dir, patterns, k=None, mode="or", with_urls=False,
        scope=None,
    )
    merged = (
        body.select("doc_id", F.col("score").alias("_sb"))
        .join(
            anchor.select("doc_id", F.col("score").alias("_sa")),
            "doc_id",
            "full_outer",
        )
        .select(
            "doc_id",
            (
                F.coalesce("_sb", F.lit(0.0))
                + F.lit(float(w_anchor)) * F.coalesce("_sa", F.lit(0.0))
            ).alias("score"),
        )
    )
    # the anchor index is a derived artifact: deletes land on the BODY
    # index, so body tombstones must kill anchor-only matches too
    # (idempotent for body-side matches, which are already filtered)
    merged = Q.apply_tombstones(spark, index_dir, merged)
    if scope:
        # the anchor side carries no metadata: the scope's complement
        # comes from the BODY index and applies to the whole merge
        merged = Q._apply_scope(spark, index_dir, merged, scope, None)
    result = merged.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    if with_urls:
        docs = Q._cached_table(spark, index_dir, "docs").select(
            "doc_id", "url"
        )
        result = (
            result.join(docs, "doc_id", "left")
            .select("doc_id", "score", "url")
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )
    return result
