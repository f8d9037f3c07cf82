#!/usr/bin/env python3
"""spark-submit entrypoint: training-data deduplication pipeline.

Batch mode — one corpus, full pipeline (exact groups → LSH candidate
pairs → connected-component clusters → canonical keep list):

    spark-submit --py-files textindex_spark.zip jobs/dedup_corpus.py \
        --input /data/documents --output /data/dedup \
        [--method lsh|ngram|simhash] [--threshold 0.2] [--keep-list]

Streaming mode — online dedup against the kept corpus (state +
verdicts accumulate under --state; exactly-once per micro-batch):

    spark-submit --py-files textindex_spark.zip jobs/dedup_corpus.py \
        --stream --input '/data/incoming/*' --state /data/dedup_state \
        --checkpoint /data/dedup_ckpt

Outputs (batch): ``<output>/pairs`` (doc_a, doc_b[, jaccard_micro]),
``<output>/clusters`` (doc_id, cluster_id) and, with ``--keep-list``,
``<output>/keep`` (the input minus non-canonical near-duplicates).
"""
from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", default=None, help="batch-mode output dir")
    ap.add_argument(
        "--method", choices=["lsh", "ngram", "simhash", "exact"], default="lsh",
        help="candidate generation (lsh = MinHash bands; simhash = "
        "Hamming-radius pigeonhole, width calibrated to the corpus; "
        "exact = full-content-hash star pairs)",
    )
    ap.add_argument(
        "--max-hamming", type=int, default=3,
        help="simhash method: Hamming radius (exact pigeonhole recall)",
    )
    ap.add_argument(
        "--threshold", type=float, default=0.2,
        help="ngram method: n-gram Jaccard threshold",
    )
    ap.add_argument("--keep-list", action="store_true")
    ap.add_argument("--stream", action="store_true")
    ap.add_argument("--state", default=None, help="streaming state dir")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from textindex_spark.session import get_spark

    spark = get_spark("textindex-dedup", cpus=args.cpus)

    if args.stream:
        if not (args.state and args.checkpoint):
            ap.error("--stream requires --state and --checkpoint")
        from textindex_spark.streaming.dedup import read_verdicts, stream_dedup

        stream_dedup(spark, args.input, args.state, args.checkpoint)
        v = read_verdicts(spark, args.state)
        stats = {
            "verdicts": v.count(),
            "exact": v.filter("kind = 'exact'").count(),
            "near": v.filter("kind = 'near'").count(),
        }
        print(json.dumps(stats))
        return

    if not args.output:
        ap.error("batch mode requires --output")
    from textindex_spark.ops import dedup as D
    from textindex_spark.pipeline import dedup_pairs

    docs = spark.read.parquet(args.input)
    pairs = dedup_pairs(
        docs, args.method, threshold=args.threshold, max_hamming=args.max_hamming
    )
    pairs.write.mode("overwrite").parquet(f"{args.output}/pairs")
    pairs = spark.read.parquet(f"{args.output}/pairs")

    clusters = D.dedup_clusters(pairs)
    clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
    clusters = spark.read.parquet(f"{args.output}/clusters")

    stats = {
        "docs": docs.count(),
        "pairs": pairs.count(),
        "clustered_docs": clusters.count(),
        "clusters": clusters.select("cluster_id").distinct().count(),
    }
    if args.keep_list:
        kept = D.dedup_keep_list(docs, clusters)
        kept.write.mode("overwrite").parquet(f"{args.output}/keep")
        stats["kept_docs"] = spark.read.parquet(f"{args.output}/keep").count()
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
