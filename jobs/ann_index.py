#!/usr/bin/env python3
"""spark-submit entrypoint: approximate-nearest-neighbor (IVF) index.

    # build (k / n_probe / fit_sample calibrated to the corpus size
    # via suggest_ivf_params unless given explicitly); --pq adds
    # residual product-quantized codes (m bytes/vector) so queries
    # can scan codes instead of vectors
    spark-submit --py-files textindex_spark.zip jobs/ann_index.py build \
        --input /data/embeddings --output /data/ivf \
        [--centroids K] [--fit-sample F] [--max-iter 8] \
        [--pq [--pq-m M] [--pq-nbits 8]]

    # incremental ingest (atomic; --append-id makes retries idempotent)
    spark-submit ... jobs/ann_index.py append \
        --input /data/new_embeddings --output /data/ivf \
        [--append-id batch42]

    # query: top-k by cosine over the n_probe query-nearest buckets;
    # --pq uses the two-stage ADC-shortlist + exact-rerank path over
    # the stored codes (the index must have been built with --pq)
    spark-submit ... jobs/ann_index.py query \
        --output /data/ivf --vec-id 17 --input /data/embeddings \
        [--k 10] [--probe P] [--pq [--rerank R]]

    # drift check + conditional re-fit (reads the k-row ledger only;
    # re-fits/re-buckets atomically when a bound is crossed —
    # --dry-run prints the drift report without refitting)
    spark-submit ... jobs/ann_index.py refit --output /data/ivf \
        [--dry-run] [--max-appended-frac 1.0] [--max-skew 4.0] \
        [--max-resid-drift 1.5] [--refit-id run7]

Input tables need (vec_id: long, embedding: array<float|double>).
"""
from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["build", "append", "query", "refit"])
    ap.add_argument("--input", default=None, help="embeddings parquet")
    ap.add_argument("--output", required=True, help="IVF index dir")
    ap.add_argument("--centroids", type=int, default=None)
    ap.add_argument("--probe", type=int, default=None)
    ap.add_argument("--fit-sample", type=float, default=None)
    ap.add_argument("--max-iter", type=int, default=8)
    ap.add_argument("--append-id", default=None)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument(
        "--where", default=None,
        help="filtered ANN: a SQL predicate over the stored vector "
        "columns (e.g. \"label = 3\"), applied inside the probed "
        "buckets; raise --probe for selective filters",
    )
    ap.add_argument("--vec-id", type=int, default=None,
                    help="query: use this row of --input as the query vector")
    ap.add_argument("--dry-run", action="store_true",
                    help="refit: print the drift report only")
    ap.add_argument("--max-appended-frac", type=float, default=1.0)
    ap.add_argument("--max-skew", type=float, default=4.0)
    ap.add_argument("--max-resid-drift", type=float, default=1.5)
    ap.add_argument("--refit-id", default=None,
                    help="refit: pins staging dirs so a crash-retry "
                    "overwrites its own staging")
    ap.add_argument(
        "--pq", action="store_true",
        help="build: also store product-quantized codes (m/nbits from "
        "suggest_pq_params unless --pq-m/--pq-nbits given); query "
        "then uses the two-stage ADC + exact-rerank path",
    )
    ap.add_argument("--pq-m", type=int, default=None)
    ap.add_argument("--pq-nbits", type=int, default=8)
    ap.add_argument("--rerank", type=int, default=None,
                    help="query: ADC shortlist size for the PQ path")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from textindex_spark.ops import similarity as S
    from textindex_spark.session import get_spark

    spark = get_spark("textindex-ann", cpus=args.cpus)

    if args.cmd == "build":
        if not args.input:
            ap.error("build requires --input")
        emb = spark.read.parquet(args.input)
        # size n_probe/fit_sample for the EFFECTIVE k: a sample sized
        # for the sqrt-N suggestion would starve a larger user-set
        # --centroids of training vectors (~62 instead of 256 per
        # centroid). Skip the count job when both knobs are explicit.
        if args.centroids and args.fit_sample is not None:
            p = {"n_centroids": args.centroids, "fit_sample": args.fit_sample}
        else:
            p = S.suggest_ivf_params(emb.count(), n_centroids=args.centroids)
        k = p["n_centroids"]
        fs = args.fit_sample if args.fit_sample is not None else (
            p["fit_sample"] if p["fit_sample"] < 1.0 else None
        )
        pq_m = 0
        if args.pq or args.pq_m:
            pq_m = args.pq_m or S.suggest_pq_params(
                len(emb.select("embedding").first()[0])
            )["pq_m"]
        cents = S.write_ivf(
            spark, emb, args.output, n_centroids=k,
            max_iter=args.max_iter, fit_sample=fs,
            pq_m=pq_m, pq_nbits=args.pq_nbits,
        )
        print(json.dumps({
            "built": args.output, "n_centroids": len(cents),
            "suggested": p, "pq_m": pq_m,
        }))
    elif args.cmd == "append":
        if not args.input:
            ap.error("append requires --input")
        n = S.ivf_append(
            spark, spark.read.parquet(args.input), args.output,
            append_id=args.append_id,
        )
        print(json.dumps({"appended": int(n)}))
    elif args.cmd == "refit":
        if args.dry_run:
            print(json.dumps(S.ivf_drift_report(spark, args.output)))
        else:
            out = S.maybe_refit(
                spark, args.output,
                max_appended_frac=args.max_appended_frac,
                max_skew=args.max_skew,
                max_resid_drift=args.max_resid_drift,
                n_centroids=args.centroids,
                max_iter=args.max_iter,
                refit_id=args.refit_id,
            )
            print(json.dumps(out))
    else:
        if not (args.input and args.vec_id is not None):
            ap.error("query requires --input and --vec-id")
        row = (
            spark.read.parquet(args.input)
            .filter(f"vec_id = {int(args.vec_id)}")
            .select("embedding").collect()
        )
        if not row:
            raise SystemExit(f"vec_id {args.vec_id} not found in {args.input}")
        q = [float(x) for x in row[0]["embedding"]]
        # n_probe defaults to k/8 inside the search paths (no extra job)
        from pyspark.sql import functions as F

        where = F.expr(args.where) if args.where else None
        if args.pq:
            hits = S.ivf_pq_search_stored(
                spark, args.output, q, k=args.k, n_probe=args.probe,
                rerank=args.rerank, where=where,
            )
        else:
            hits = S.ivf_search_stored(
                spark, args.output, q, k=args.k, n_probe=args.probe,
                where=where,
            )
        for r in hits.collect():
            print(json.dumps(r.asDict()))


if __name__ == "__main__":
    main()
