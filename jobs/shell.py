#!/usr/bin/env python3
"""Interactive index shell (the reference's rustyline REPL,
``/root/reference/src/cmds.rs`` surface).

Interactive (readline + tab completion; run with python so stdin is a
tty — spark-submit does not forward stdin to the Python driver):

    PYTHONPATH=. python3 jobs/shell.py --index /path/to/index \
        [--docs /path/to/documents.parquet]

Scripted / cluster (spark-submit):

    spark-submit --py-files textindex_spark.zip jobs/shell.py \
        --index /path/to/index --script commands.txt

Commands: index / stats / find / files / first / next / summary /
delete / store / help — type ``help`` inside. Tab completes command
names and (after find/stats) index terms.
"""
from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--docs", default=None,
                    help="raw documents parquet for matched-line display")
    ap.add_argument("--anchor-index", default=None,
                    help="anchor-field index for the `anchor` command")
    ap.add_argument("--script", default=None,
                    help="run commands from this file instead of stdin")
    ap.add_argument("--cpus", type=int, default=None)
    args = ap.parse_args()

    from textindex_spark.session import get_spark
    from textindex_spark.shell import Shell, run_loop

    spark = get_spark("textindex-shell", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    lines = None
    if args.script is not None:
        with open(args.script, encoding="utf-8") as f:
            lines = f.read().splitlines()
    run_loop(
        Shell(spark, args.index, args.docs, anchor_dir=args.anchor_index),
        input_lines=lines,
    )


if __name__ == "__main__":
    main()
