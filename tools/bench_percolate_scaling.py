#!/usr/bin/env python3
"""N→4N scaling-efficiency pair for the percolator (round-5 op):
the same standing-query set evaluated over the same on-disk corpus at
local[N] and local[4N] in separate JVMs (the bench_scaling.py proxy
for the north-rule two-cluster-size criterion). The percolator is one
tokenize pass + a doc-keyed bit_or shuffle, so it should track the
build's scaling.

    python3 tools/bench_percolate_scaling.py [--n 8] [--docs 200000]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from textindex_spark.session import get_spark, warm_workers
from textindex_spark import percolate as P

cpus = {cpus}
spark = get_spark("perc-scaling", cpus=cpus, shuffle_partitions=cpus * 2,
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet({corpus!r})
docs.count()
warm_workers(spark)
QS = [
    ("p_and", "spark AND merge"),
    ("p_or", "vector OR quarry OR archive"),
    ("p_not", "table AND NOT spark"),
    ("p_wild", "qu* AND merge"),
    ("p_mix", "spark AND (vector OR qu*) AND NOT quarry"),
]
n = P.percolate(spark, QS, docs).count()  # untimed warm pass
runs = []
for _ in range({n_runs}):
    t0 = time.time()
    n = P.percolate(spark, QS, docs).count()
    runs.append(time.time() - t0)
print("RESULT " + json.dumps({{"cpus": cpus, "runs": runs,
    "best_sec": min(runs), "matches": n}}))
"""


def run_level(cpus: int, corpus: str, n_runs: int = 3) -> dict:
    code = CHILD.format(repo=str(REPO), cpus=cpus, corpus=corpus,
                        n_runs=n_runs)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=3000,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise SystemExit(f"child local[{cpus}] failed:\n{out.stderr[-3000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--scale", type=int, default=4)
    args = ap.parse_args()
    corpus = f"/tmp/textindex_bench/scaling_corpus_v2_{args.docs}_{args.scale}"
    if not os.path.exists(f"{corpus}/_SUCCESS"):
        # same corpus recipe (and path) as tools/bench_scaling.py so
        # the two tools share one synthesized input
        sys.path.insert(0, str(REPO))
        from textindex_spark.corpus import synth_corpus_spark
        from textindex_spark.session import get_spark, warm_workers

        spark = get_spark(
            "gen", cpus=32,
            extra_conf={"spark.ui.showConsoleProgress": "false"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        warm_workers(spark)
        synth_corpus_spark(spark, args.docs, scale=args.scale).write.mode(
            "overwrite"
        ).parquet(corpus)
        spark.stop()
    small = run_level(args.n, corpus)
    large = run_level(args.n * args.scale, corpus)
    speedup = small["best_sec"] / large["best_sec"]
    eff = speedup / args.scale
    print(json.dumps({
        "op": "percolate(5 standing queries)",
        "docs": args.docs,
        f"local[{args.n}]": small,
        f"local[{args.n * args.scale}]": large,
        "speedup": round(speedup, 2),
        "efficiency": round(eff, 2),
    }, indent=1))


if __name__ == "__main__":
    main()
