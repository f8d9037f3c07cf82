"""URL canonicalization + per-URL snapshot deduplication.

Common-Crawl-style corpora key pages by ``(url, warc_ts)``: the same
logical page appears under trivially different URL spellings (case,
default ports, tracking parameters, param order, fragments) and under
many fetch timestamps. Before any content-level dedup, a web pipeline
collapses those: canonicalize the URL, then keep ONE snapshot per
canonical URL (the latest fetch).

Everything here is pure Catalyst string expressions — whole-stage
codegen'd, no Python, and every regex is RE2-compatible so the DuckDB
oracle runs the same patterns.

Scale shape: canonicalization is per-row (narrow); snapshot dedup is
ONE groupBy on the canonical URL — keys are (near-)unique page
identities, so groups are bounded by the per-page snapshot count
(CC re-crawl depth, ~10s), never corpus-sized. No joins, no skew.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tracking query parameters dropped during canonicalization: the
# utm_* family plus the common click-id params. Public convention
# (Google Analytics / Facebook / Microsoft ad params).
TRACKING_PARAM_PREFIX = "utm_"
TRACKING_PARAMS = ("fbclid", "gclid", "msclkid", "mc_eid")

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"^[^#?]*\?([^#]*)"


# -- shared canonicalization builders: BOTH public forms (the Column
# -- composition and the staged-projection DataFrame form) assemble
# -- from these, so a rule added here lands in both and link-graph
# -- keys can never drift from snapshot-dedup keys.


def _canon_host(scheme: Column, hostport: Column) -> Column:
    """Default-port stripping on an already-lowercased host[:port]."""
    return (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )


def _canon_path(path: Column) -> Column:
    return F.when(path == "", F.lit("/")).otherwise(path)


def _canon_query(query: Column) -> Column:
    """Tracking params dropped, the rest sorted bytewise, re-joined."""
    keep_params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~p.startswith(TRACKING_PARAM_PREFIX)
        & ~F.element_at(F.split(p, "="), 1).isin(*TRACKING_PARAMS),
    )
    return F.array_join(F.array_sort(keep_params), "&")


def _canon_rebuild(
    scheme: Column, host: Column, path: Column, canon_query: Column
) -> Column:
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(canon_query != "", F.concat(F.lit("?"), canon_query)).otherwise(
            F.lit("")
        ),
    )


def canonical_url_col(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL:

    * scheme and host lowercased;
    * default ports stripped (``:80`` for http, ``:443`` for https);
    * fragment dropped;
    * tracking parameters dropped (``utm_*`` prefix + fbclid / gclid /
      msclkid / mc_eid);
    * remaining query parameters sorted bytewise (param order never
      distinguishes pages);
    * empty path normalized to ``/``.

    URLs without a ``scheme://`` prefix are returned unchanged (the
    expression is total; no nulls introduced)."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    host = _canon_host(scheme, hostport)
    path = _canon_path(F.regexp_extract(url, _PATH_RE, 1))
    canon_query = _canon_query(F.regexp_extract(url, _QUERY_RE, 1))
    rebuilt = _canon_rebuild(scheme, host, path, canon_query)
    return F.when(scheme == "", url).otherwise(rebuilt)


def with_canonical_url(df: DataFrame, url_col: str, out_col: str) -> DataFrame:
    """Add ``out_col`` = canonical form of ``url_col`` — the SAME
    semantics as `canonical_url_col`, staged through named
    projections so each sub-expression is computed once and referenced
    as an attribute. Use this form when the input column is itself a
    derived expression (e.g. a resolved href): composing
    `canonical_url_col` over a non-trivial input duplicates the
    input's tree at every internal reference and the serialized plan
    grows ~10× (measured 60 KB → 693 KB on the link-extraction plan).
    Parity with the Column form is test-pinned
    (`test_links.test_with_canonical_url_matches_column_form`)."""
    passthru = [c for c in df.columns if c != out_col]
    url = F.col(url_col)
    s = df.select(
        *passthru,
        F.lower(F.regexp_extract(url, _SCHEME_RE, 1)).alias("_csch"),
        F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1)).alias("_chp"),
        F.regexp_extract(url, _PATH_RE, 1).alias("_cp0"),
        F.regexp_extract(url, _QUERY_RE, 1).alias("_cq0"),
    )
    s = s.select(
        "*",
        _canon_host(F.col("_csch"), F.col("_chp")).alias("_chost"),
        _canon_path(F.col("_cp0")).alias("_cpath"),
        _canon_query(F.col("_cq0")).alias("_ccq"),
    )
    rebuilt = _canon_rebuild(
        F.col("_csch"), F.col("_chost"), F.col("_cpath"), F.col("_ccq")
    )
    out = F.when(F.col("_csch") == "", url).otherwise(rebuilt)
    return s.select(*passthru, out.alias(out_col))


def url_snapshot_dedup(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (canon_url, n_snapshots, keep_doc_id, keep_ts): one row per
    canonical URL, keeping the LATEST snapshot (max ``ts_col``, ties
    broken to the max ``id_col`` — deterministic). One
    map-side-combining groupBy; the keep row comes from a single
    ``max(struct(ts, id))`` agg, not a ranking window."""
    c = pages.select(
        canonical_url_col(F.col(url_col)).alias("canon_url"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
    )
    return c.groupBy("canon_url").agg(
        F.count("*").alias("n_snapshots"),
        F.max(F.struct(F.col("_ts").alias("ts"), F.col("_id").alias("id"))).alias(
            "_keep"
        ),
    ).select(
        "canon_url",
        "n_snapshots",
        F.col("_keep.id").alias("keep_doc_id"),
        F.col("_keep.ts").alias("keep_ts"),
    )


def latest_snapshots(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ ``pages`` reduced to the latest snapshot per canonical URL
    (semi-join on the keep list; the keep list is snapshot-deduped and
    therefore small relative to a multi-crawl corpus)."""
    keep = url_snapshot_dedup(pages, url_col, ts_col, id_col).select(
        F.col("keep_doc_id").alias(id_col)
    )
    return pages.join(keep, id_col, "left_semi")
