#!/usr/bin/env python3
"""Data-scale (rows → 4× rows) scaling evidence for the dedup /
embedding family (VERDICT r4 task 7).

The hot-bucket caps (MAX_BAND_BUCKET, MAX_SHINGLE_DF), star
collapses (signature-identical docs, exact-dup vectors) and
pointer-jumping components exist precisely so these ops grow
~linearly in corpus size instead of quadratically in the largest
boilerplate cluster. This measures that directly: the same four ops
at n and 4n rows in one warm local[CPUS] session.

    efficiency = 4 · t(n) / t(4n)      (1.0 = perfectly linear,
                                        ≥0.8 = the north-rule bar,
                                        ≫1 would mean sub-linear work)

    python3 tools/bench_dedup_scaling.py [--small 125000] [--cpus 32]

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

EMB_DIM = 32
EMB_DUP_FRAC_GROUP = 20  # every 20th vector exactly duplicates its group head


def ensure_embeddings(spark, n: int, path: str):
    """Deterministic synthetic embeddings with a 5% exact-duplicate
    stripe (vec_id % 20 == 19 copies the group head) so the collapse
    path is part of what is measured."""
    if os.path.exists(f"{path}/_SUCCESS"):
        return spark.read.parquet(path)
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(42)
    X = rng.normal(size=(n, EMB_DIM)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    dup = ids % EMB_DUP_FRAC_GROUP == EMB_DUP_FRAC_GROUP - 1
    X[dup] = X[ids[dup] - (EMB_DUP_FRAC_GROUP - 1)]
    tbl = pa.table(
        {
            "vec_id": ids,
            "embedding": pa.array(list(X), type=pa.list_(pa.float32())),
        }
    )
    os.makedirs(path, exist_ok=True)
    pq.write_table(tbl, f"{path}/part-0.parquet")
    open(f"{path}/_SUCCESS", "w").close()
    return spark.read.parquet(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=125_000)
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", 32)))
    args = ap.parse_args()

    from textindex_spark.ops import dedup, similarity
    from textindex_spark.session import get_spark, warm_workers

    import bench  # repo-root bench.py: shared synthetic corpus

    spark = get_spark(
        "dedup-scaling", cpus=args.cpus, shuffle_partitions=args.cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    warm_workers(spark)

    sizes = [args.small, args.small * args.scale]
    results: dict[str, dict[int, float]] = {}
    counts: dict[str, dict[int, int]] = {}
    for n in sizes:
        docs = bench.ensure_bench_corpus(spark, n, f"/tmp/scale_docs_{n}")
        emb = ensure_embeddings(spark, n, f"/tmp/scale_emb_{n}")
        docs.count(), emb.count()

        ops = {
            "minhash": lambda: dedup.minhash_signatures(docs).count(),
            "lsh_pairs": lambda: dedup.lsh_candidate_pairs(
                dedup.minhash_signatures(docs)
            ).count(),
            "dedup_clusters": lambda: dedup.dedup_clusters(
                dedup.lsh_candidate_pairs(dedup.minhash_signatures(docs))
            ).count(),
            "emb_near_dup": lambda: similarity.embedding_near_pairs(emb).count(),
        }
        for name, fn in ops.items():
            fn()  # warm: JIT, parquet footers, adaptive stats
            t0 = time.time()
            c = fn()
            dt = time.time() - t0
            results.setdefault(name, {})[n] = round(dt, 3)
            counts.setdefault(name, {})[n] = int(c)
            print(f"  {name} @ {n}: {dt:.2f}s ({c} rows)", file=sys.stderr)

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

    lines = [
        "",
        f"## Dedup-family data-scale pair: {small:,} → {big:,} docs/vectors "
        f"(local[{args.cpus}], r5)",
        "",
        "Same ops, same session, rows scaled 4×; efficiency = "
        "4·t(n)/t(4n), bar ≥ 0.8 (linear = 1.0).",
        "",
        "| op | t(n) s | t(4n) s | out rows (4n) | efficiency |",
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
