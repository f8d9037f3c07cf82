#!/usr/bin/env python3
"""spark-submit entrypoint: corpus-curation passes (decontamination,
PII redaction, stratified sampling, token-budget selection, n-gram
stats) — the `ops/curate.py` suite as one subcommand surface:

    spark-submit --py-files textindex_spark.zip jobs/curate.py \\
        decontam --input docs.parquet --bench bench.parquet \\
                 --output /data/clean [--ngram 5] [--max-hits 0]
        pii      --input docs.parquet --output /data/redacted
        sample   --input docs.parquet --output /data/sampled \\
                 --rate en=0.3 de=0.7 [--default-rate 0.1] [--strata lang]
        budget   --input docs.parquet --output /data/selected \\
                 --tokens 1000000 [--strata lang] [--buckets 256]
        ngrams   --input docs.parquet --output /data/ngrams \\
                 [--ngram 3] [--top 1000]
        nll      --input docs.parquet --output /data/nll
                 (per-doc mean unigram NLL — perplexity-style filter signal)

Each writes parquet under ``--output`` and prints one JSON summary
line.
"""
from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--input", required=True)
        p.add_argument("--output", required=True)
        p.add_argument("--cpus", type=int, default=None)

    p = sub.add_parser("decontam", help="drop benchmark-overlapping docs")
    common(p)
    p.add_argument("--bench", required=True, help="benchmark parquet (text column)")
    p.add_argument("--ngram", type=int, default=5)
    p.add_argument("--max-hits", type=int, default=0)

    p = sub.add_parser("pii", help="redact emails / IPv4 / phone numbers")
    common(p)

    p = sub.add_parser("sample", help="deterministic stratified sample")
    common(p)
    p.add_argument("--rate", nargs="+", default=[], metavar="STRATUM=FRAC")
    p.add_argument("--default-rate", type=float, default=0.0)
    p.add_argument("--strata", default="lang")

    p = sub.add_parser("budget", help="per-stratum token-budget selection")
    common(p)
    p.add_argument("--tokens", type=int, required=True)
    p.add_argument("--strata", default="lang")
    p.add_argument("--buckets", type=int, default=256)

    p = sub.add_parser("ngrams", help="top-k corpus n-grams")
    common(p)
    p.add_argument("--ngram", type=int, default=3)
    p.add_argument("--top", type=int, default=1000)

    p = sub.add_parser("nll", help="per-doc mean unigram NLL (perplexity-style)")
    common(p)

    p = sub.add_parser(
        "gopher", help="Gopher repetition filters (dup lines / top n-grams)"
    )
    common(p)

    p = sub.add_parser(
        "profile", help="one-call corpus profile (volumes / percentiles)"
    )
    common(p)
    p.add_argument("--strata", default="lang")

    p = sub.add_parser(
        "chunk", help="fixed-token-window document chunking"
    )
    common(p)
    p.add_argument("--tokens", type=int, default=512)
    p.add_argument("--stride", type=int, default=None)

    p = sub.add_parser(
        "pack", help="deterministic sequence packing (hash groups)"
    )
    common(p)
    p.add_argument("--seq-len", type=int, default=2048)
    p.add_argument("--groups", type=int, default=1024)

    p = sub.add_parser(
        "lines", help="corpus-level boilerplate line removal"
    )
    common(p)
    p.add_argument("--max-line-df", type=int, default=10)

    p = sub.add_parser(
        "dupspans",
        help="exact-substring duplication: per-doc stats + span removal",
    )
    common(p)
    p.add_argument("--window", type=int, default=20, help="window width (tokens)")
    p.add_argument(
        "--strip", action="store_true", help="also write span-stripped text"
    )

    args = ap.parse_args()

    from textindex_spark.ops import curate
    from textindex_spark.session import get_spark

    spark = get_spark("textindex-curate", cpus=args.cpus)
    docs = spark.read.parquet(args.input)
    out: dict = {"cmd": args.cmd, "output": args.output}

    if args.cmd == "decontam":
        bench = spark.read.parquet(args.bench)
        hits = curate.contamination_hits(docs, bench, n=args.ngram)
        hits.write.mode("overwrite").parquet(f"{args.output}/hits")
        hits = spark.read.parquet(f"{args.output}/hits")
        drop = hits.filter(hits.n_hits > args.max_hits).select("doc_id")
        docs.join(drop, "doc_id", "left_anti").write.mode("overwrite").parquet(
            f"{args.output}/clean"
        )
        out["dropped"] = drop.count()
        out["kept"] = spark.read.parquet(f"{args.output}/clean").count()
    elif args.cmd == "pii":
        red = curate.redact_pii(docs)
        red.write.mode("overwrite").parquet(f"{args.output}/redacted")
        red = spark.read.parquet(f"{args.output}/redacted")
        agg = red.groupBy().sum("n_emails", "n_ipv4", "n_phones").collect()[0]
        out["n_emails"], out["n_ipv4"], out["n_phones"] = [int(x or 0) for x in agg]
    elif args.cmd == "sample":
        rates = {}
        for spec in args.rate:
            stratum, _, frac = spec.partition("=")
            rates[stratum] = int(round(float(frac) * 1e6))
        sampled = curate.sample_stratified(
            docs,
            rates,
            default_micro=int(round(args.default_rate * 1e6)),
            strata_col=args.strata,
        )
        sampled.write.mode("overwrite").parquet(f"{args.output}/sampled")
        out["sampled"] = spark.read.parquet(f"{args.output}/sampled").count()
    elif args.cmd == "budget":
        from textindex_spark.refimpl.stop_words import STOP_WORD_SET

        sel = curate.budget_select(
            docs,
            tuple(sorted(STOP_WORD_SET)),
            args.tokens,
            strata_col=args.strata,
            n_buckets=args.buckets,
        )
        sel.write.mode("overwrite").parquet(f"{args.output}/selected")
        sel = spark.read.parquet(f"{args.output}/selected")
        out["selected"] = sel.count()
        out["tokens"] = int(
            sel.groupBy().sum("n_tokens").collect()[0][0] or 0
        )
    elif args.cmd == "ngrams":
        curate.top_ngrams(docs, n=args.ngram, k=args.top).write.mode(
            "overwrite"
        ).parquet(f"{args.output}/ngrams")
        out["rows"] = spark.read.parquet(f"{args.output}/ngrams").count()
    elif args.cmd == "nll":
        curate.unigram_logprob(docs).write.mode("overwrite").parquet(
            f"{args.output}/nll"
        )
        nll = spark.read.parquet(f"{args.output}/nll")
        agg = nll.groupBy().avg("avg_nll_micro").collect()[0][0]
        out["rows"] = nll.count()
        out["mean_avg_nll_micro"] = int(agg or 0)
    elif args.cmd == "profile":
        from textindex_spark.ops import textstats

        prof = textstats.corpus_profile(docs, strata_col=args.strata)
        prof.write.mode("overwrite").parquet(f"{args.output}/profile")
        for r in sorted(
            spark.read.parquet(f"{args.output}/profile").collect(),
            key=lambda r: (r["metric"], r["stratum"]),
        ):
            out[f"{r['metric']}/{r['stratum']}"] = r["value"]
    elif args.cmd == "gopher":
        from textindex_spark.ops import textstats

        sig = textstats.repetition_signals(docs)
        sig.write.mode("overwrite").parquet(f"{args.output}/repetition")
        sig = spark.read.parquet(f"{args.output}/repetition")
        docs.join(
            sig.filter(~sig.keep).select("doc_id"), "doc_id", "left_anti"
        ).write.mode("overwrite").parquet(f"{args.output}/clean")
        out["dropped"] = sig.filter(~sig.keep).count()
        out["kept"] = spark.read.parquet(f"{args.output}/clean").count()
    elif args.cmd == "chunk":
        chunks = curate.chunk_documents(
            docs, chunk_tokens=args.tokens, stride=args.stride
        )
        chunks.write.mode("overwrite").parquet(f"{args.output}/chunks")
        out["chunks"] = spark.read.parquet(f"{args.output}/chunks").count()
    elif args.cmd == "pack":
        packed = curate.pack_sequences(
            docs, seq_len=args.seq_len, n_groups=args.groups
        )
        packed.write.mode("overwrite").parquet(f"{args.output}/packed")
        packed = spark.read.parquet(f"{args.output}/packed")
        out["docs"] = packed.count()
        out["bins"] = packed.select("pack_group", "bin_id").distinct().count()
    elif args.cmd == "lines":
        from textindex_spark.ops import dedup as D

        cleaned = D.strip_boilerplate_lines(docs, max_line_df=args.max_line_df)
        cleaned.write.mode("overwrite").parquet(f"{args.output}/lines")
        cleaned = spark.read.parquet(f"{args.output}/lines")
        agg = cleaned.groupBy().sum("n_lines", "n_dropped_lines").collect()[0]
        out["n_lines"] = int(agg[0] or 0)
        out["n_dropped_lines"] = int(agg[1] or 0)
    elif args.cmd == "dupspans":
        from pyspark.sql import functions as F

        from textindex_spark.ops import dedup as D

        stats = D.dup_window_stats(docs, k=args.window)
        stats.write.mode("overwrite").parquet(f"{args.output}/stats")
        stats = spark.read.parquet(f"{args.output}/stats")
        agg = stats.groupBy().agg(
            F.sum("n_windows").alias("w"), F.sum("n_dup_windows").alias("d")
        ).collect()[0]
        out["n_windows"] = int(agg["w"] or 0)
        out["n_dup_windows"] = int(agg["d"] or 0)
        if args.strip:
            D.strip_dup_spans(docs, k=args.window).write.mode(
                "overwrite"
            ).parquet(f"{args.output}/stripped")
            out["stripped_rows"] = spark.read.parquet(
                f"{args.output}/stripped"
            ).count()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
