#!/usr/bin/env python3
"""spark-submit entrypoint: build (or resume) the inverted index.

    spark-submit --py-files textindex_spark.zip jobs/build_index.py \
        --input /path/to/documents_parquet_or_iceberg_table \
        --output /path/to/index \
        [--resumable --parts 64] [--range-bits 13] [--cpus 32]
        [--stream --checkpoint DIR]   # Structured Streaming: --input
                                      # is a file glob; new files are
                                      # indexed incrementally
                                      # (exactly-once per micro-batch)

The input must have the BASELINE input_hint shape
(url, warc_ts, html, text, lang[, doc_id]) or the driver-testdata
shape (doc_id, text, lang, source, n_chars); ``normalize_input``
bridges both. Package the library with::

    cd /root/repo && zip -qr /tmp/textindex_spark.zip textindex_spark
"""
from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--range-bits", type=int, default=13)
    ap.add_argument("--resumable", action="store_true")
    ap.add_argument("--parts", type=int, default=64)
    ap.add_argument("--stream", action="store_true")
    ap.add_argument(
        "--upsert", action="store_true",
        help="with --stream: re-crawled urls replace their old "
        "version (tombstoned in the same atomic commit)",
    )
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument(
        "--title-index", default=None, metavar="DIR",
        help="also build a title retrieval field (the <title> text of "
        "each page as its own weighted index; query with jobs/search.py "
        "--title-index)",
    )
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from textindex_spark.build import build_index, build_index_resumable, read_stats
    from textindex_spark.session import get_spark

    spark = get_spark("textindex-build", cpus=args.cpus)
    if args.stream:
        if not args.checkpoint:
            ap.error("--stream requires --checkpoint")
        if args.title_index:
            ap.error("--title-index is batch-only (the title field is a "
                     "corpus-level derived index; rebuild it after the "
                     "stream with jobs/build_index.py or fields.py)")
        from textindex_spark.streaming.incremental import stream_index

        stream_index(
            spark, args.input, args.output, args.checkpoint,
            range_bits=args.range_bits, upsert=args.upsert,
        )
        json.dump(read_stats(spark, args.output), sys.stdout)
        print()
        return
    docs = spark.read.parquet(args.input)
    if args.title_index and not {"url", "html"} <= set(docs.columns):
        # fail BEFORE the (long) body build: titles need raw markup
        ap.error("--title-index needs url+html columns on --input "
                 "(titles live in the raw markup)")
    if args.resumable:
        stats = build_index_resumable(
            spark, docs, args.output, n_parts=args.parts, range_bits=args.range_bits
        )
    else:
        stats = build_index(spark, docs, args.output, range_bits=args.range_bits)
    if args.title_index:
        from textindex_spark.fields import build_title_index

        tstats = build_title_index(
            spark, args.output, args.title_index, docs,
            range_bits=args.range_bits,
        )
        stats["title_index_docs"] = tstats["n_docs"]
    json.dump(stats, sys.stdout)
    print()


if __name__ == "__main__":
    main()
