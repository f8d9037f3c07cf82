#!/usr/bin/env python3
"""spark-submit entrypoint: web link-graph extraction + analysis.

Extract the hyperlink graph from a crawl corpus, aggregate it to host
level, and compute degree stats and PageRank:

    spark-submit --py-files textindex_spark.zip jobs/linkgraph.py \
        --input /data/documents --output /data/graph \
        [--iters 10] [--damping 0.85] [--drop-intra] [--follow-only] \
        [--top-anchors K]

``--input`` rows need (url, html) — html may be binary (raw crawl
bytes) or string; all other columns are ignored. Outputs:

* ``<output>/links``    — (src_url, dst_url, anchor, nofollow)
* ``<output>/hosts``    — (src_host, dst_host, n_links, n_src_pages)
* ``<output>/degrees``  — (node, out_deg, in_deg) over the host graph
* ``<output>/pagerank`` — (node, rank), Σrank = 1
* ``<output>/doc_priors`` — per input page: host PageRank + in-link
  counts (the two classic link quality priors, curation-ready)
* ``<output>/anchors``  — with --top-anchors: per-destination top-K
  incoming anchor strings (the anchor retrieval field's input)
"""
from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--html-col", default="html")
    ap.add_argument("--url-col", default="url")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument(
        "--drop-intra", action="store_true",
        help="exclude same-host edges from the host graph",
    )
    ap.add_argument(
        "--follow-only", action="store_true",
        help="exclude rel=nofollow links from the host graph",
    )
    ap.add_argument(
        "--top-anchors", type=int, default=0, metavar="K",
        help="also write the per-destination top-K anchor digest",
    )
    ap.add_argument(
        "--anchor-field", default=None, metavar="BODY_INDEX",
        help="also build the anchor-text retrieval field for this body "
        "index (written to <output>/anchor_index; query with "
        "jobs/search.py --anchor-index)",
    )
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from textindex_spark.ops import links as L
    from textindex_spark.session import get_spark

    spark = get_spark("textindex-linkgraph", cpus=args.cpus)
    pages = spark.read.parquet(args.input)

    counts = L.build_link_graph(
        spark, pages, args.output,
        html_col=args.html_col, url_col=args.url_col,
        iters=args.iters, damping=args.damping,
        drop_intra=args.drop_intra, follow_only=args.follow_only,
    )
    links = spark.read.parquet(f"{args.output}/links")

    stats = {
        "pages": pages.count(),
        **counts,
        "doc_priors": spark.read.parquet(
            f"{args.output}/doc_priors"
        ).count(),
        "pagerank_iters": args.iters,
    }
    if args.top_anchors > 0:
        L.top_anchors(links, k=args.top_anchors).write.mode(
            "overwrite"
        ).parquet(f"{args.output}/anchors")
        stats["anchor_digests"] = spark.read.parquet(
            f"{args.output}/anchors"
        ).count()
    if args.anchor_field:
        from textindex_spark.fields import build_anchor_index

        bstats = build_anchor_index(
            spark, args.anchor_field, f"{args.output}/anchor_index",
            links=links,
        )
        stats["anchor_index_docs"] = int(bstats["n_docs"])
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
