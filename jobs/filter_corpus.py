#!/usr/bin/env python3
"""spark-submit entrypoint: training-data document filter.

Compose language allowlist + quality floor + token-count bounds into
per-doc keep verdicts, and optionally write the filtered corpus:

    spark-submit --py-files textindex_spark.zip jobs/filter_corpus.py \
        --input /data/documents.parquet --output /data/filtered \
        [--langs en fr] [--min-quality-micro 500000] \
        [--min-tokens 20] [--max-tokens 100000] [--verdicts-only]

Outputs: ``<output>/verdicts`` (doc_id, pred_lang, quality_micro,
n_tokens, keep, reason) and, unless ``--verdicts-only``,
``<output>/kept`` (the input rows with keep=true). Prints one JSON
line with kept/dropped counts per reason.
"""
from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--langs", nargs="*", default=["en"])
    ap.add_argument("--min-quality-micro", type=int, default=500_000)
    ap.add_argument("--min-tokens", type=int, default=20)
    ap.add_argument("--max-tokens", type=int, default=100_000)
    ap.add_argument("--verdicts-only", action="store_true")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from textindex_spark.ops.textstats import filter_corpus, filter_verdicts
    from textindex_spark.refimpl.stop_words import STOP_WORD_SET
    from textindex_spark.session import get_spark

    spark = get_spark("textindex-filter", cpus=args.cpus)
    docs = spark.read.parquet(args.input)
    verdicts = filter_verdicts(
        docs,
        tuple(sorted(STOP_WORD_SET)),
        langs=tuple(args.langs),
        min_quality_micro=args.min_quality_micro,
        min_tokens=args.min_tokens,
        max_tokens=args.max_tokens,
    )
    verdicts.write.mode("overwrite").parquet(f"{args.output}/verdicts")
    verdicts = spark.read.parquet(f"{args.output}/verdicts")
    if not args.verdicts_only:
        filter_corpus(docs, verdicts).write.mode("overwrite").parquet(
            f"{args.output}/kept"
        )
    by_reason = {
        r["reason"] or "kept": r["n"]
        for r in verdicts.groupBy("reason").agg(F.count("*").alias("n")).collect()
    }
    print(json.dumps({"verdicts": f"{args.output}/verdicts", **by_reason}))


if __name__ == "__main__":
    main()
