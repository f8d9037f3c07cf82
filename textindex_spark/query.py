"""Query engine: wildcard expansion, BM25 top-k, matched lines.

Spark re-expression of ``Words::find`` (``/root/reference/src/
index2.rs:550-582``) plus the BM25 block-max ranking the north_star
adds on top:

* wildcard term → vocabulary probe (J1): Catalyst filter on the terms
  table (``rlike`` for globs, equality for exact terms) — pushed down
  to the term-sorted parquet/Iceberg scan.
* posting fetch (J2): broadcast semi-join of the (small) expanded
  query-term set against the postings table; term-range row-group
  skipping applies.
* AND intersection (J3): per-doc pattern bitmask aggregation
  (``bit_or``) — one shuffle keyed doc_id, no chained joins.
* ranking (T5): exact BM25 from the self-contained posting blocks
  (tf + doc_len both stored), ``orderBy desc limit k`` →
  TakeOrderedAndProject (per-partition heaps + driver merge).
* block-max pruning (``prune=True``): ranges are scored by their
  summed per-term upper bounds first; a cheap exact pass over the
  best range sets the threshold θ and only ranges with ub ≥ θ are
  decoded — the distributed, Catalyst-expressible form of block-max
  WAND (upper bounds and candidate filtering are plain columnar ops;
  only surviving blocks reach the Python decode kernel).
"""
from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from textindex_spark.build import B, K1, read_stats
from textindex_spark.codec import decode_batch
from textindex_spark.refimpl.oracle import wildcard_to_regex

DECODED_SCHEMA = "term string, doc_id long, tf int, doc_len long, tfnorm double"


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def _is_wildcard(p: str) -> bool:
    return "*" in p or "?" in p


def expand_patterns(
    spark: SparkSession, index_dir: str, patterns: list[str]
) -> pd.DataFrame:
    """→ pandas (pattern_idx, term, df, max_tfnorm). Exact terms probe
    by equality; globs by anchored regex (WildMatch semantics,
    index2.rs:554). The expansion is collected — it is the query's
    working vocabulary and is small by construction."""
    terms_df = spark.read.parquet(f"{index_dir}/terms")
    exact = [p for p in patterns if not _is_wildcard(p)]
    frames = []
    if exact:
        got = (
            terms_df.filter(F.col("term").isin(exact))
            .select("term", "df", "max_tfnorm")
            .toPandas()
        )
        for i, p in enumerate(patterns):
            if not _is_wildcard(p):
                hit = got[got["term"] == p].copy()
                hit["pattern_idx"] = i
                frames.append(hit)
    for i, p in enumerate(patterns):
        if _is_wildcard(p):
            rx = wildcard_to_regex(p).pattern
            hit = (
                terms_df.filter(F.col("term").rlike(f"^(?s:{rx})$"))
                .select("term", "df", "max_tfnorm")
                .toPandas()
            )
            hit["pattern_idx"] = i
            frames.append(hit)
    if not frames:
        return pd.DataFrame(columns=["pattern_idx", "term", "df", "max_tfnorm"])
    out = pd.concat(frames, ignore_index=True)
    return out[["pattern_idx", "term", "df", "max_tfnorm"]]


def _decode_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        if len(pdf) == 0:
            continue
        range_bits = int(pdf["range_bits"].iat[0])
        bases = pdf["range_id"].values.astype(np.int64) << range_bits
        doc_lists, tf_lists, dl_lists = decode_batch(
            list(pdf["doc_gaps"]), bases, [list(pdf["tf_bytes"]), list(pdf["dl_bytes"])]
        )
        counts = np.fromiter((len(d) for d in doc_lists), dtype=np.int64, count=len(doc_lists))
        terms = np.repeat(pdf["term"].values, counts)
        doc_ids = np.concatenate(doc_lists) if len(doc_lists) else np.array([], dtype=np.int64)
        tfs = np.concatenate(tf_lists) if tf_lists else np.array([], dtype=np.int64)
        dls = np.concatenate(dl_lists) if dl_lists else np.array([], dtype=np.int64)
        avgdl = float(pdf["avgdl"].iat[0]) or 1.0
        tfnorm = tfs * (K1 + 1.0) / (tfs + K1 * (1.0 - B + B * dls / avgdl))
        yield pd.DataFrame(
            {
                "term": terms,
                "doc_id": doc_ids,
                "tf": tfs.astype(np.int32),
                "doc_len": dls,
                "tfnorm": tfnorm,
            }
        )


def _decoded_postings(
    spark: SparkSession, index_dir: str, qterms: DataFrame, stats: dict
) -> DataFrame:
    """Posting blocks for the query vocabulary, decoded to
    (term, doc_id, tf, doc_len, tfnorm) rows."""
    postings = spark.read.parquet(f"{index_dir}/postings")
    blocks = postings.join(F.broadcast(qterms.select("term").distinct()), "term")
    blocks = blocks.withColumn("range_bits", F.lit(stats["range_bits"])).withColumn(
        "avgdl", F.lit(stats["avgdl"])
    )
    return blocks.mapInPandas(_decode_kernel, DECODED_SCHEMA)


def search(
    spark: SparkSession,
    index_dir: str,
    patterns: list[str],
    k: int = 10,
    mode: str = "and",
    prune: bool = False,
    with_urls: bool = True,
) -> DataFrame:
    """BM25 top-k → DataFrame (doc_id, score[, url]), ordered
    (score desc, doc_id asc). mode='and' keeps reference AND
    semantics across query patterns."""
    stats = read_stats(spark, index_dir)
    expanded = expand_patterns(spark, index_dir, patterns)
    n_patterns = len(patterns)
    full_mask = (1 << n_patterns) - 1
    empty = spark.createDataFrame([], "doc_id long, score double")
    if len(expanded) == 0 or (
        mode == "and" and expanded["pattern_idx"].nunique() < n_patterns
    ):
        result = empty
    else:
        expanded = expanded.copy()
        expanded["idf"] = [idf(stats["n_docs"], int(d)) for d in expanded["df"]]
        # one row per matched vocab term: idf + pattern-coverage mask
        term_info = (
            expanded.groupby("term")
            .agg(
                idf=("idf", "first"),
                mask=("pattern_idx", lambda s: int(np.bitwise_or.reduce([1 << i for i in s]))),
            )
            .reset_index()
        )
        qterms = spark.createDataFrame(term_info[["term", "idf", "mask"]])
        decoded = _decoded_postings(spark, index_dir, qterms, stats)
        if prune and mode == "and":
            decoded = _pruned_decode(spark, index_dir, qterms, stats, k, full_mask)
        scored = (
            decoded.join(F.broadcast(qterms), "term")
            .groupBy("doc_id")
            .agg(
                F.sum(F.col("idf") * F.col("tfnorm")).alias("score"),
                F.bit_or("mask").alias("mask"),
            )
        )
        if mode == "and":
            scored = scored.filter(F.col("mask") == full_mask)
        result = scored.select("doc_id", "score").orderBy(
            F.desc("score"), F.asc("doc_id")
        ).limit(k)
    if with_urls:
        docs = spark.read.parquet(f"{index_dir}/docs").select("doc_id", "url")
        result = (
            result.join(docs, "doc_id", "left")
            .select("doc_id", "score", "url")
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )
    return result


def _pruned_decode(
    spark: SparkSession,
    index_dir: str,
    qterms: DataFrame,
    stats: dict,
    k: int,
    full_mask: int,
) -> DataFrame:
    """Block-max pruning: score ranges by Σ_term idf·max_tfnorm upper
    bound, set θ from an exact pass over the best range, decode only
    ranges whose upper bound reaches θ (and which can satisfy AND)."""
    postings = spark.read.parquet(f"{index_dir}/postings")
    blocks = postings.join(F.broadcast(qterms), "term")
    range_ub = (
        blocks.groupBy("range_id")
        .agg(
            F.sum(F.col("idf") * F.col("max_tfnorm")).alias("ub"),
            F.bit_or("mask").alias("mask"),
        )
        .filter(F.col("mask") == full_mask)
    )
    cand = range_ub.orderBy(F.desc("ub")).limit(64).toPandas()
    if len(cand) == 0:
        return spark.createDataFrame([], DECODED_SCHEMA)
    best_range = int(cand["range_id"].iat[0])
    probe = blocks.filter(F.col("range_id") == best_range).withColumn(
        "range_bits", F.lit(stats["range_bits"])
    ).withColumn("avgdl", F.lit(stats["avgdl"]))
    probe_scores = (
        probe.mapInPandas(_decode_kernel, DECODED_SCHEMA)
        .join(F.broadcast(qterms), "term")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("idf") * F.col("tfnorm")).alias("score"),
            F.bit_or("mask").alias("mask"),
        )
        .filter(F.col("mask") == full_mask)
        .orderBy(F.desc("score"))
        .limit(k)
        .toPandas()
    )
    theta = float(probe_scores["score"].min()) if len(probe_scores) >= k else 0.0
    surviving = range_ub.filter(F.col("ub") >= theta).select("range_id")
    pruned_blocks = blocks.join(F.broadcast(surviving), "range_id").withColumn(
        "range_bits", F.lit(stats["range_bits"])
    ).withColumn("avgdl", F.lit(stats["avgdl"]))
    return pruned_blocks.mapInPandas(_decode_kernel, DECODED_SCHEMA)


def find_unranked(
    spark: SparkSession, index_dir: str, patterns: list[str]
) -> DataFrame:
    """Exact reference `find` semantics (index2.rs:550-582): unranked
    AND-intersection, urls ordered by doc_id."""
    stats = read_stats(spark, index_dir)
    expanded = expand_patterns(spark, index_dir, patterns)
    n_patterns = len(patterns)
    if len(expanded) == 0 or expanded["pattern_idx"].nunique() < n_patterns:
        return spark.createDataFrame([], "doc_id long, url string")
    term_info = (
        expanded.groupby("term")
        .agg(mask=("pattern_idx", lambda s: int(np.bitwise_or.reduce([1 << i for i in s]))))
        .reset_index()
    )
    qterms = spark.createDataFrame(term_info[["term", "mask"]]).withColumn(
        "idf", F.lit(0.0)
    )
    decoded = _decoded_postings(spark, index_dir, qterms, stats)
    full_mask = (1 << n_patterns) - 1
    hits = (
        decoded.join(F.broadcast(qterms.select("term", "mask")), "term")
        .groupBy("doc_id")
        .agg(F.bit_or("mask").alias("mask"))
        .filter(F.col("mask") == full_mask)
        .select("doc_id")
    )
    docs = spark.read.parquet(f"{index_dir}/docs").select("doc_id", "url")
    return hits.join(docs, "doc_id", "left").orderBy("doc_id")


def find_files(spark: SparkSession, index_dir: str, pattern: str) -> DataFrame:
    """File-name wildcard search (index2.rs:447-456)."""
    rx = wildcard_to_regex(pattern).pattern
    return (
        spark.read.parquet(f"{index_dir}/docs")
        .filter(F.col("url").rlike(f"^(?s:{rx})$"))
        .select("doc_id", "url")
        .orderBy("doc_id")
    )


def matched_lines(
    spark: SparkSession,
    documents: DataFrame,
    hits: DataFrame,
    patterns: list[str],
) -> DataFrame:
    """J5 (proc3.rs:396-435): for each hit, re-read the RAW document
    (lossy-decoded, NOT the extracted text — the reference reads the
    file bytes), split into lines, keep lines where any space-split
    word glob-matches any query term."""
    from textindex_spark.build import normalize_input
    from textindex_spark.refimpl.html_extract import decode_lossy

    regexes = [wildcard_to_regex(p) for p in patterns]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_url, out_lines = [], [], []
            for i in range(len(pdf)):
                raw = pdf["html"].iat[i]
                txt = decode_lossy(raw) if raw else (pdf["text"].iat[i] or "")
                lines = [
                    line
                    for line in txt.split("\n")
                    if any(
                        rx.fullmatch(word)
                        for word in line.split(" ")
                        for rx in regexes
                    )
                ]
                out_doc.append(pdf["doc_id"].iat[i])
                out_url.append(pdf["url"].iat[i])
                out_lines.append(lines)
            yield pd.DataFrame(
                {"doc_id": out_doc, "url": out_url, "lines": out_lines}
            )

    joined = normalize_input(documents).join(
        F.broadcast(hits.select("doc_id")), "doc_id"
    )
    return joined.mapInPandas(kernel, "doc_id long, url string, lines array<string>")
