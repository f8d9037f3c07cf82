#!/usr/bin/env python3
"""Data-scale (rows → 4× rows) scaling evidence for the link-graph
family (round-5 extension).

Extraction is a narrow per-row pipeline, the host graph is one
map-side-combining groupBy, and PageRank's per-iteration cost is the
edge-⋈-rank join — all should grow ~linearly in corpus size. The host
universe scales WITH the corpus (n/64 hosts, 2 minted links per page)
so PageRank's node set grows too, not just the edge multiplicity.

    efficiency = 4 · t(n) / t(4n)      (1.0 = perfectly linear,
                                        ≥0.8 = the north-rule bar)

    python3 tools/bench_links_scaling.py [--small 125000] [--cpus 32]

Prints one JSON line and appends a measured section to
BENCH_SCALING.md.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def linked_pages(spark, n: int):
    """Deterministic minted crawl pages with 3 extractable anchors
    each (absolute + tracking params, relative ../ with unsorted
    query, protocol-relative nofollow) + 1 dropped mailto, over an
    n/64-host universe."""
    from pyspark.sql import functions as F

    n_hosts = max(n // 64, 16)
    df = spark.range(n).select(F.col("id").alias("doc_id"))
    d = F.col("doc_id")
    ds = d.cast("string")
    host = (d % n_hosts).cast("string")
    html = F.concat(
        F.lit('<p>x</p><a href="http://site'), ((d * 7 + 3) % n_hosts).cast("string"),
        F.lit(".example/p/"), ds, F.lit('?utm_s=1&q=2">first link</a>'),
        F.lit("<a href='../d"), (d % 5).cast("string"),
        F.lit("/p"), ((d * 7) % 1000).cast("string"),
        F.lit(".html'>relative <b>link</b></a>"),
        F.lit('<a rel="nofollow" href="//site'),
        ((d * 13 + 5) % n_hosts).cast("string"),
        F.lit('.example/x">proto</a>'),
        F.lit('<a href="mailto:a@b.c">m</a>'),
    )
    return df.select(
        F.concat(
            F.lit("http://site"), host, F.lit(".example/a/page"), ds,
            F.lit(".html"),
        ).alias("url"),
        html.alias("html"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=125_000)
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument(
        "--cpus", type=int,
        default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)),
    )
    args = ap.parse_args()

    from textindex_spark.ops import links as L
    from textindex_spark.session import get_spark, warm_workers

    spark = get_spark(
        "links-scaling", cpus=args.cpus, shuffle_partitions=args.cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    warm_workers(spark)

    sizes = [args.small, args.small * args.scale]
    results: dict[str, dict[int, float]] = {}
    counts: dict[str, dict[int, int]] = {}
    for n in sizes:
        # persist (not localCheckpoint): the small size's blocks must
        # be droppable before the big size is timed, or the 4n numbers
        # run under the previous size's block-manager pressure
        pages = linked_pages(spark, n).persist()
        pages.count()

        def timed(name, fn):
            fn()  # warm: JIT, adaptive stats
            t0 = time.time()
            c = fn()
            dt = time.time() - t0
            results.setdefault(name, {})[n] = round(dt, 3)
            counts.setdefault(name, {})[n] = int(c)
            print(f"  {name} @ {n}: {dt:.2f}s ({c} rows)", file=sys.stderr)

        # extraction timed BEFORE any cache of the same plan exists —
        # persisting links first would register the identical analyzed
        # plan in the CacheManager and the 'timed' extraction would
        # silently read the cache instead of re-running
        timed("link_extract", lambda: L.extract_links(pages).count())
        # materialized links for the aggregations, as build_link_graph
        # does (aggregating over the raw extraction lineage re-inlines
        # the expression trees per reference — host_graph docstring)
        links = L.extract_links(pages).persist()
        links.count()
        edges = L.host_graph(links).persist()
        edges.count()
        timed("link_host_graph", lambda: L.host_graph(links).count())
        timed("link_pagerank", lambda: L.pagerank(edges, iters=8).count())
        pages.unpersist(blocking=True)
        links.unpersist(blocking=True)
        edges.unpersist(blocking=True)

    small, big = sizes
    eff = {
        name: round(args.scale * results[name][small] / results[name][big], 3)
        for name in results
    }
    summary = {
        "sizes": sizes,
        "cpus": args.cpus,
        "sec": results,
        "rows": counts,
        "efficiency": eff,
    }
    print(json.dumps(summary))

    s = args.scale
    lines = [
        "",
        f"## Link-graph data-scale pair: {small:,} → {big:,} pages "
        f"(local[{args.cpus}], r5)",
        "",
        f"Same ops, same session, rows AND host universe scaled {s}×; "
        f"efficiency = {s}·t(n)/t({s}n), bar ≥ 0.8 (linear = 1.0). "
        "PageRank runs 8 iterations over the host graph (n/64 hosts).",
        "",
        f"| op | t(n) s | t({s}n) s | out rows ({s}n) | efficiency |",
        "|---|---|---|---|---|",
    ]
    for name in results:
        lines.append(
            f"| {name} | {results[name][small]} | {results[name][big]} "
            f"| {counts[name][big]} | **{eff[name]}** |"
        )
    with open(REPO / "BENCH_SCALING.md", "a") as f:
        f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
