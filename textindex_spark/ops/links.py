"""Web link graph: anchor extraction, host graph, PageRank.

Engine extension (no reference counterpart — the reference indexes a
local file tree, `/root/reference/src/main.rs`, and has no notion of
hyperlinks). For a Common-Crawl-style corpus the link graph IS the
quality signal a training-data pipeline runs on: in-link counts and
centrality feed document quality scores, anchor text feeds retrieval
(see `build.py` anchor field), and the host graph drives crawl-frontier
and spam analyses.

Everything in the extraction path is pure Catalyst string expressions
(regexp_extract_all / regexp_extract / aggregate over split path
segments) — whole-stage codegen'd, no Python in the hot path, and the
per-row work is narrow (no shuffle until the first groupBy).

Scale shapes:

* `extract_links` — narrow per-row explode; output is edge rows
  (~50-100 per page), never materialized driver-side.
* `host_graph` — ONE map-side-combining groupBy on (src_host,
  dst_host); group count is bounded by the distinct host-pair count,
  orders of magnitude below the edge count.
* `pagerank` — the canonical iterative join: the normalized edge list
  is partitioned by src once and persisted; each iteration shuffles
  only the rank vector (one row per node — hosts, not pages) to the
  edges and one groupBy(dst) back. Lineage is cut with
  localCheckpoint so 10+ iterations don't stack plans.
* `top_anchors` — two-level aggregation: groupBy(dst, anchor) first
  (spreads a hot destination across its distinct anchor strings),
  then a bounded top-K slice per dst — a page with 10^7 in-links
  never produces an unbounded collect_list.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from textindex_spark.ops.urls import with_canonical_url

# One full <a ...>...</a> element, case-insensitive, DOTALL (anchors
# wrap newlines). Lazy body so adjacent anchors split correctly.
_ANCHOR_ELEM_RE = r"(?is)<a\s[^>]*>.*?</a\s*>"
# href value, double- or single-quoted (group 1 — the boundary class
# before 'href' keeps data-href / xlink:href from matching).
_HREF_DQ_RE = r'(?is)[\s"\'<]href\s*=\s*"([^"]*)"'
_HREF_SQ_RE = r"(?is)[\s\"'<]href\s*=\s*'([^']*)'"
_ANCHOR_BODY_RE = r"(?is)^<a\s[^>]*>(.*)</a\s*>$"
_NOFOLLOW_RE = r"""(?is)rel\s*=\s*["'][^"']*nofollow"""
_ABS_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://"
# Schemes that never name a fetchable document.
_SKIP_SCHEME_RE = r"(?i)^(javascript|mailto|data|tel|ftp):"
# ANY scheme prefix: an href like 'skype:alice' or 'urn:x' is an
# absolute URI per RFC 3986 (':' cannot appear in the first segment of
# a relative reference), so a scheme WITHOUT '://' is a non-document
# target, never a relative path to join against the base.
_ANY_SCHEME_RE = r"(?i)^[A-Za-z][A-Za-z0-9+.-]*:"

# host: skip userinfo ('user:pass@h.example'), keep a bracketed IPv6
# literal whole, stop at the port otherwise
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?(\[[^\]]*\]|[^/?#:]+)"
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
# scheme://host[:port] prefix (no path).
_ORIGIN_RE = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)"
# Directory of the base url's path: scheme://host/...up to the last /.
_BASE_DIR_RE = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(?:/[^?#]*/)?)"


def host_of(url: Column | str) -> Column:
    """Lowercased host of an absolute URL ('' when there is none).
    Ports are excluded (the character class stops at ':')."""
    return F.lower(F.regexp_extract(url, _HOST_RE, 1))


def _with_resolved(
    df: DataFrame, href_col: str, base_col: str, out_col: str
) -> DataFrame:
    """Add ``out_col`` = ``href_col`` resolved against ``base_col``
    (absolute URL, or NULL for non-document targets:
    javascript:/mailto:/data:/tel:, fragment-only, empty).

    * fragment stripped first (never part of a page identity);
    * absolute (`scheme://`) kept as-is;
    * protocol-relative (`//host/p`) gets the base scheme;
    * root-relative (`/p`) joins the base origin;
    * query-only (`?q`) replaces the base query;
    * path-relative joins the base directory, then RFC 3986 §5.2.4
      dot-segment removal (an `F.aggregate` fold over the split path
      — exact at any nesting depth).

    Staged as a chain of projections on purpose: every intermediate
    (trimmed href, origin, base dir, joined path, fold result) is a
    NAMED column the next step references as an attribute. Composing
    the same logic as one Column expression duplicates each input's
    sub-tree at every reference — the tree doubles per derivation
    level and the serialized task binary reaches multi-MB (measured:
    5.4 MiB → 59 KiB for this pipeline). All steps collapse into one
    codegen stage at runtime; only the PLAN representation differs."""
    passthru = [c for c in df.columns if c != out_col]
    h0 = F.trim(F.col(href_col))
    step = df.select(
        *passthru, F.regexp_replace(h0, r"#.*$", "").alias("_h")
    )
    base = F.col(base_col)
    step = step.select(
        "*",
        F.regexp_extract(base, _SCHEME_RE, 1).alias("_sch"),
        F.regexp_extract(base, _ORIGIN_RE, 1).alias("_org"),
        F.regexp_extract(base, _BASE_DIR_RE, 1).alias("_bd0"),
        F.regexp_extract(
            base, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1
        ).alias("_bp"),
    )
    # base url with no path → directory is origin + '/'
    bd = F.when(
        F.col("_bd0") == F.col("_org"), F.concat("_org", F.lit("/"))
    ).otherwise(F.col("_bd0"))
    step = step.select("*", F.concat(bd, F.col("_h")).alias("_joined"))
    # dot-segment removal on _joined, staged
    step = step.select(
        "*", F.regexp_extract("_joined", _ORIGIN_RE, 1).alias("_jorg")
    )
    step = step.select(
        "*",
        F.substring(
            F.col("_joined"), F.length("_jorg") + 1, F.lit(2 ** 30)
        ).alias("_rest"),
    )
    step = step.select("*", F.instr(F.col("_rest"), "?").alias("_qp"))
    step = step.select(
        "*",
        F.when(
            F.col("_qp") > 0, F.substring(F.col("_rest"), 1, F.col("_qp") - 1)
        )
        .otherwise(F.col("_rest"))
        .alias("_path"),
        F.when(
            F.col("_qp") > 0,
            F.substring(F.col("_rest"), F.col("_qp"), F.lit(2 ** 30)),
        )
        .otherwise(F.lit(""))
        .alias("_query"),
    )
    step = step.select("*", F.split("_path", "/").alias("_segs"))
    folded = F.aggregate(
        F.col("_segs"),
        F.array().cast("array<string>"),
        lambda acc, s: F.when(s == ".", acc)
        .when(
            s == "..",
            # pop (never below the root: acc[0] is the '' before the
            # leading slash)
            F.when(F.size(acc) > 1, F.slice(acc, 1, F.size(acc) - 1)).otherwise(
                acc
            ),
        )
        .otherwise(F.concat(acc, F.array(s))),
    )
    step = step.select(
        "*",
        F.array_join(folded, "/").alias("_np0"),
        # a trailing '.' or '..' segment leaves a directory reference:
        # keep the trailing slash RFC 3986 prescribes
        F.element_at(F.col("_segs"), -1).isin(".", "..").alias("_dirref"),
    )
    norm_path = F.when(
        F.col("_np0").endswith("/") | ~F.col("_dirref"), F.col("_np0")
    ).otherwise(F.concat("_np0", F.lit("/")))
    step = step.select(
        "*", F.concat("_jorg", norm_path, F.col("_query")).alias("_norm")
    )
    h = F.col("_h")
    resolved = (
        F.when(h == "", F.lit(None).cast("string"))
        .when(h.rlike(_SKIP_SCHEME_RE), F.lit(None).cast("string"))
        .when(h.rlike(_ABS_RE), h)
        # any other 'scheme:' prefix (no '//'): absolute non-document
        # URI, NOT a relative path (RFC 3986 §4.2)
        .when(h.rlike(_ANY_SCHEME_RE), F.lit(None).cast("string"))
        .when(h.startswith("//"), F.concat("_sch", F.lit(":"), h))
        .when(h.startswith("/"), F.concat("_org", h))
        .when(
            h.startswith("?"),
            F.concat(
                "_org",
                F.when(F.col("_bp") == "", F.lit("/")).otherwise(F.col("_bp")),
                h,
            ),
        )
        .otherwise(F.col("_norm"))
    )
    return step.select(*passthru, resolved.alias(out_col))


def resolve_href_col(
    spark, hrefs_and_bases: list[tuple[str, str]]
) -> list[str | None]:
    """Driver-side convenience/test hook: resolve (href, base_url)
    pairs through the SAME staged plan `extract_links` uses. Returns
    resolved URLs in input order."""
    df = spark.createDataFrame(
        [(i, h, b) for i, (h, b) in enumerate(hrefs_and_bases)],
        "i long, href string, base string",
    )
    out = _with_resolved(df, "href", "base", "dst").orderBy("i").collect()
    return [r.dst for r in out]


def clean_anchor_col(elem: Column) -> Column:
    """Visible anchor text of an <a> element: inner markup stripped,
    whitespace collapsed, trimmed."""
    body = F.regexp_extract(elem, _ANCHOR_BODY_RE, 1)
    no_tags = F.regexp_replace(body, r"(?s)<[^>]*>", " ")
    return F.trim(F.regexp_replace(no_tags, r"\s+", " "))


def extract_links(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url",
    canonicalize: bool = True,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """→ one row per outgoing hyperlink:
    (src_url, dst_url, anchor, nofollow [, *keep_cols]).

    The html column may be binary (decoded as UTF-8 with replacement,
    matching the crawl-corpus input_hint) or string. Extraction is
    `regexp_extract_all` of whole <a> elements + per-element attribute
    pulls — all JVM-side, no Python. Relative hrefs are resolved
    against the page URL (RFC 3986 subset, `resolve_href_col`);
    non-document schemes and fragment-only hrefs drop out. With
    ``canonicalize`` the destination also goes through
    `ops.urls.canonical_url_col` so the graph keys match the
    snapshot-dedup keys."""
    html = F.col(html_col)
    for f in pages.schema.fields:
        if f.name == html_col and f.dataType.simpleString() == "binary":
            # cast, not decode(): decode raises MALFORMED_CHARACTER_CODING
            # on real-crawl bytes; the cast wraps the bytes as-is and the
            # anchor regexes are pure-ASCII, so invalid sequences pass
            # through harmlessly inside anchor text
            html = html.cast("string")
            break
    elems = F.regexp_extract_all(html, F.lit(_ANCHOR_ELEM_RE), 0)
    base = pages.select(
        F.col(url_col).alias("src_url"),
        *[F.col(c) for c in keep_cols],
        F.explode(elems).alias("_elem"),
    )
    # Each step below materializes named intermediates so downstream
    # expressions reference ATTRIBUTES, not copies of the producing
    # tree: composing resolve+canonicalize inline duplicates the
    # (large) sub-expressions once per reference and the plan blows
    # up combinatorially (multi-MB task binaries, OOM when this feeds
    # an iterative consumer). CollapseProject keeps multi-referenced
    # non-trivial aliases staged, so this stays one codegen stage with
    # a linear-size plan.
    dq = F.regexp_extract("_elem", _HREF_DQ_RE, 1)
    sq = F.regexp_extract("_elem", _HREF_SQ_RE, 1)
    step = base.select(
        "src_url",
        *keep_cols,
        clean_anchor_col(F.col("_elem")).alias("anchor"),
        F.col("_elem").rlike(_NOFOLLOW_RE).alias("nofollow"),
        F.when(dq != "", dq).otherwise(sq).alias("_href"),
    )
    # Drop non-document links HERE, on the cheap trimmed-href column —
    # exactly the NULL branches of `_with_resolved` (empty /
    # fragment-only / non-document scheme) plus relative hrefs on a
    # schemeless base (unresolvable). Filtering on the RESOLVED column
    # instead is a plan trap: predicate pushdown substitutes the
    # alias's full expression tree into the condition and pushes it
    # through every staged projection — the serialized plan grows
    # 4.6 KB → 689 KB (measured). After this filter the resolved URL
    # is non-null and absolute by construction, so no output filter is
    # needed at all.
    h = F.trim(F.col("_href"))
    h = F.regexp_replace(h, r"#.*$", "")
    step = step.where(
        (h != "")
        & ~h.rlike(_SKIP_SCHEME_RE)
        & (
            h.rlike(_ABS_RE)
            | (~h.rlike(_ANY_SCHEME_RE) & F.col("src_url").rlike(_ABS_RE))
        )
    )
    step = _with_resolved(step, "_href", "src_url", "_dst_raw")
    if canonicalize:
        step = with_canonical_url(step, "_dst_raw", "dst_url")
    else:
        step = step.withColumn("dst_url", F.col("_dst_raw"))
    return step.select(
        "src_url",
        *keep_cols,
        "dst_url",
        "anchor",
        "nofollow",
    )


def host_graph(
    links: DataFrame,
    src_url: str = "src_url",
    dst_url: str = "dst_url",
    drop_intra: bool = False,
    follow_only: bool = False,
) -> DataFrame:
    """Host-level edge list → (src_host, dst_host, n_links,
    n_src_pages). One map-side-combining groupBy; `n_src_pages` is an
    approx_count_distinct (exact distinct of page urls inside a
    host-pair group would re-shuffle the full edge payload — at crawl
    scale the ±2% HLL estimate is the right trade and is documented
    here; the exact variant is one `countDistinct` swap away).

    Feed this MATERIALIZED links (a parquet read or a checkpoint, as
    `build_link_graph` does), not the raw `extract_links` lineage: an
    aggregation composed directly over the extraction plan re-inlines
    the resolve/canonicalize expression trees once per column
    reference (measured: 4,012 regexp nodes in the physical plan and
    0.26 s → 7.9 s on the sf0.1 bench graph)."""
    e = links.select(
        host_of(F.col(src_url)).alias("src_host"),
        host_of(F.col(dst_url)).alias("dst_host"),
        F.col(src_url).alias("_src_page"),
        *([F.col("nofollow")] if follow_only else []),
    ).where((F.col("src_host") != "") & (F.col("dst_host") != ""))
    if follow_only:
        e = e.where(~F.col("nofollow")).drop("nofollow")
    if drop_intra:
        e = e.where(F.col("src_host") != F.col("dst_host"))
    return e.groupBy("src_host", "dst_host").agg(
        F.count("*").alias("n_links"),
        F.approx_count_distinct("_src_page").alias("n_src_pages"),
    )


def link_degrees(
    edges: DataFrame, src: str = "src_host", dst: str = "dst_host",
    weight: str | None = "n_links",
) -> DataFrame:
    """→ (node, out_deg, in_deg) over a (host- or page-level) edge
    list: two map-side-combining groupBys + one outer join on the
    node key. Missing side → 0."""
    w = F.col(weight) if weight else F.lit(1)
    out = edges.groupBy(F.col(src).alias("node")).agg(
        F.sum(w).alias("out_deg")
    )
    inn = edges.groupBy(F.col(dst).alias("node")).agg(
        F.sum(w).alias("in_deg")
    )
    return (
        out.join(inn, "node", "full_outer")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
    )


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src: str = "src_host",
    dst: str = "dst_host",
    weight: str | None = "n_links",
    checkpoint_every: int = 4,
) -> DataFrame:
    """Weighted PageRank over an edge list → (node, rank), Σrank = 1.

    Semantics (the textbook formulation, so the DuckDB gate oracle can
    replay it as chained CTEs):

    * nodes = distinct(src) ∪ distinct(dst); rank₀ = 1/N
    * share(s,d) = w(s,d) / Σ_d' w(s,d')
    * dangling mass (rank on nodes with no out-edges) is
      redistributed uniformly each step
    * rankᵢ₊₁(n) = (1−d)/N + d·(Σ_s rankᵢ(s)·share(s,n) + dangling/N)

    Execution shape for scale: the normalized edge list is computed
    ONCE (self-join edges↔out-weights on src), hash-partitioned by
    src and persisted — each iteration then shuffles only the rank
    vector (|hosts| rows, tiny next to the edges) into that layout,
    and one groupBy(dst) brings contributions back. The per-iteration
    dangling-mass aggregate runs on the rank vector, not the edges.
    `localCheckpoint` every few iterations truncates lineage so iters
    don't stack analysis cost."""
    w = F.col(weight) if weight else F.lit(1)
    # localCheckpoint (not just persist): the edge list often arrives
    # with a deep upstream plan (extract → canonicalize → groupBy);
    # iterative consumers re-reference it every step, so the lineage
    # must be CUT, not merely cached, or the per-iteration plan and
    # task binaries grow with the upstream expression tree.
    e = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("d"), w.alias("w")
    ).localCheckpoint(eager=True)
    out_w = e.groupBy("s").agg(F.sum("w").alias("ow"))
    nparts = e.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    norm = (
        e.join(out_w, "s")
        .select("s", "d", (F.col("w") / F.col("ow")).alias("share"))
        .repartition(int(nparts), "s")
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("s").alias("node"))
        .union(e.select(F.col("d").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    has_out = e.select(F.col("s").alias("node")).distinct()
    dangling_nodes = nodes.join(has_out, "node", "left_anti").localCheckpoint(
        eager=True
    )
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    d = float(damping)
    for i in range(iters):
        # dangling mass as a broadcast 1-row aggregate INSIDE the
        # plan — a driver-side collect here would launch one job per
        # iteration, each re-executing every iteration since the last
        # checkpoint (quadratic work per checkpoint window); folded
        # in, a whole window executes as ONE job at checkpoint time
        dm = (
            ranks.join(dangling_nodes, "node", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
        )
        contrib = (
            norm.join(ranks.withColumnRenamed("node", "s"), "s")
            .groupBy(F.col("d").alias("node"))
            .agg(F.sum(F.col("share") * F.col("rank")).alias("c"))
        )
        nxt = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dm))
            .select(
                "node",
                (
                    F.lit((1.0 - d) / n)
                    + (F.lit(d) * F.col("_dm")) / n
                    + F.lit(d) * F.coalesce("c", F.lit(0.0))
                ).alias("rank"),
            )
        )
        if (i + 1) % checkpoint_every == 0 or i == iters - 1:
            nxt = nxt.localCheckpoint(eager=True)
        ranks = nxt
    return ranks


def build_link_graph(
    spark,
    pages: DataFrame,
    out_dir: str,
    html_col: str = "html",
    url_col: str = "url",
    iters: int = 10,
    damping: float = 0.85,
    drop_intra: bool = False,
    follow_only: bool = False,
) -> dict:
    """Extract → aggregate → analyze → write the whole link-graph
    artifact set under ``out_dir`` (the single orchestration both the
    linkgraph CLI and the pipeline's --linkgraph stage call, so the
    two can never diverge):

    * ``links``     — (src_url, dst_url, anchor, nofollow)
    * ``hosts``     — (src_host, dst_host, n_links, n_src_pages)
    * ``degrees``   — (node, out_deg, in_deg)
    * ``pagerank``  — (node, rank), Σrank = 1
    * ``doc_priors``— per input page: host PageRank (NULL when the
      host is not in the graph) + page-level in-link counts (0 when
      nothing links to it)

    Each table is written then re-read so downstream stages consume
    the materialized parquet, not the extraction lineage. Returns
    counts: {links, host_edges, hosts}."""
    from textindex_spark.ops.urls import with_canonical_url

    links = extract_links(pages, html_col=html_col, url_col=url_col)
    links.write.mode("overwrite").parquet(f"{out_dir}/links")
    links = spark.read.parquet(f"{out_dir}/links")
    hosts = host_graph(links, drop_intra=drop_intra, follow_only=follow_only)
    hosts.write.mode("overwrite").parquet(f"{out_dir}/hosts")
    hosts = spark.read.parquet(f"{out_dir}/hosts")
    link_degrees(hosts).write.mode("overwrite").parquet(f"{out_dir}/degrees")
    pr = pagerank(hosts, iters=iters, damping=damping)
    pr.write.mode("overwrite").parquet(f"{out_dir}/pagerank")
    pr = spark.read.parquet(f"{out_dir}/pagerank")

    priors = host_rank_prior(pages.select(url_col), pr, url_col=url_col)
    priors = with_canonical_url(priors, url_col, "_curl")
    indeg = page_in_degree(links).withColumnRenamed("dst_url", "_curl")
    priors = (
        priors.join(indeg, "_curl", "left")
        .drop("_curl")
        .fillna(0, subset=["n_inlinks", "n_follow_inlinks"])
    )
    priors.write.mode("overwrite").parquet(f"{out_dir}/doc_priors")
    return {
        "links": links.count(),
        "host_edges": hosts.count(),
        "hosts": spark.read.parquet(f"{out_dir}/degrees").count(),
    }


def host_rank_prior(
    docs: DataFrame,
    ranks: DataFrame,
    url_col: str = "url",
    out_col: str = "host_rank",
) -> DataFrame:
    """Attach each document's host PageRank as a quality prior →
    ``docs`` + ``out_col`` (double; NULL for docs whose host is not in
    the graph — distinguishable from a genuinely low rank).

    The standard webtext curation composition: corpus-level quality
    scores (`ops.textstats.quality`) judge a page by its own text;
    the link prior judges it by who points at its host. Join shape:
    ranks has one row per HOST (orders of magnitude below the doc
    count), so this is a broadcast-eligible equality join on the
    extracted host — AQE picks broadcast below the threshold, and at
    10^7-host scale it is still the small side of a shuffle join."""
    h = host_of(F.col(url_col))
    r = ranks.select(F.col("node").alias("_hrp"), F.col("rank").alias(out_col))
    return (
        docs.withColumn("_hrp", h)
        .join(r, "_hrp", "left")
        .drop("_hrp")
    )


def page_in_degree(
    links: DataFrame, dst_url: str = "dst_url"
) -> DataFrame:
    """→ (dst_url, n_inlinks, n_follow_inlinks): page-level in-link
    counts (the second classic link prior besides host PageRank). One
    map-side-combining groupBy on the canonical destination."""
    return links.groupBy(F.col(dst_url).alias("dst_url")).agg(
        F.count("*").alias("n_inlinks"),
        F.sum((~F.col("nofollow")).cast("long")).alias("n_follow_inlinks"),
    )


def top_anchors(
    links: DataFrame,
    dst_url: str = "dst_url",
    anchor: str = "anchor",
    k: int = 8,
    min_count: int = 1,
    max_anchor_len: int = 200,
) -> DataFrame:
    """→ (dst_url, anchors: array<string>): the K most frequent
    distinct incoming anchor strings per destination — the bounded
    per-page anchor-text digest the anchor retrieval field indexes.

    Skew shape: a two-level aggregation. Level 1 groups by
    (dst, anchor) — a destination with 10⁷ in-links spreads across
    its distinct anchor strings, so no single reducer sees the raw
    in-link fan-in. Level 2 tops-K per dst over the (dst, anchor,
    cnt) rows with a sort+slice INSIDE the aggregated array (bounded
    by distinct anchors per page, itself cut by ``min_count`` at
    crawl scale), never a global window sort."""
    a = F.trim(F.substring(F.col(anchor), 1, max_anchor_len))
    counts = (
        links.select(F.col(dst_url).alias("dst_url"), a.alias("a"))
        .where(F.col("a") != "")
        .groupBy("dst_url", "a")
        .agg(F.count("*").alias("cnt"))
    )
    if min_count > 1:
        counts = counts.where(F.col("cnt") >= min_count)
    ranked = counts.groupBy("dst_url").agg(
        F.slice(
            F.array_sort(
                F.collect_list(F.struct((-F.col("cnt")).alias("neg"), F.col("a")))
            ),
            1,
            k,
        ).alias("_top")
    )
    return ranked.select(
        "dst_url", F.transform("_top", lambda s: s["a"]).alias("anchors")
    )
