#!/usr/bin/env python3
"""Task-time breakdown of one full index build at a given parallelism
(VERDICT r1 #5: name the 8→32 scaling residual instead of waving at
the hypervisor).

Runs the steady-state build in a child JVM at local[N], then pulls
per-stage task metrics from the Spark UI REST API and prints one JSON
line with the aggregate breakdown:

  wall            — timed build wall-clock
  task_time       — Σ executorRunTime over all tasks (ms)
  cpu_time        — Σ executorCpuTime (ns→ms)
  gc_time         — Σ jvmGcTime
  deser/ser       — task (de)serialization
  shuffle_w/r     — shuffle write time / fetch wait time
  sched_delay     — Σ (task duration − runTime − deser − ser)
  utilization     — task_time / (wall × cores): <1 means cores idle
                    (scheduling gaps, stage barriers, driver work)
  cpu_frac        — cpu_time / task_time: <1 means tasks off-CPU
                    (page faults, I/O, Python wait, GC stalls)

Usage: python3 tools/profile_build.py [--cpus 32] [--docs 250000]
"""
from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = r"""
import json, shutil, sys, time, urllib.request
sys.path.insert(0, {repo!r})
from textindex_spark.session import get_spark, warm_workers
from textindex_spark.build import build_index

cpus = {cpus}
spark = get_spark("profile", cpus=cpus, shuffle_partitions=cpus * 2,
                  extra_conf={{"spark.ui.showConsoleProgress": "false",
                              "spark.ui.enabled": "true",
                              "spark.eventLog.enabled": "false"}})
spark.sparkContext.setLogLevel("ERROR")
corpus = spark.read.parquet({corpus!r})
corpus.count()
warm_workers(spark)
out = "/tmp/profile_idx_{cpus}"
shutil.rmtree(out, ignore_errors=True)
build_index(spark, corpus, out, range_bits=12)   # untimed warm build

ui = spark.sparkContext.uiWebUrl
app = spark.sparkContext.applicationId
def stages():
    with urllib.request.urlopen(f"{{ui}}/api/v1/applications/{{app}}/stages?status=complete") as r:
        return json.load(r)
seen = {{(s["stageId"], s["attemptId"]) for s in stages()}}

shutil.rmtree(out, ignore_errors=True)
t0 = time.time()
build_index(spark, corpus, out, range_bits=12)
wall = time.time() - t0

agg = dict(task_time=0, cpu_time=0, gc_time=0, deser=0, ser=0,
           shuffle_w=0, shuffle_r_wait=0, n_tasks=0, input_bytes=0,
           shuffle_write_bytes=0, duration=0)
per_stage = []
for s in stages():
    if (s["stageId"], s["attemptId"]) in seen:
        continue
    agg["task_time"] += s["executorRunTime"]
    agg["cpu_time"] += s["executorCpuTime"] // 1_000_000
    agg["gc_time"] += s["jvmGcTime"]
    agg["deser"] += s["executorDeserializeTime"]
    agg["ser"] += s["resultSerializationTime"]
    agg["shuffle_w"] += s["shuffleWriteTime"] // 1_000_000
    agg["shuffle_r_wait"] += s.get("shuffleFetchWaitTime", 0)
    agg["n_tasks"] += s["numCompleteTasks"]
    agg["input_bytes"] += s["inputBytes"]
    agg["shuffle_write_bytes"] += s["shuffleWriteBytes"]
    per_stage.append(dict(
        id=s["stageId"], name=s["name"].split("\n")[0][:60],
        tasks=s["numCompleteTasks"], run_ms=s["executorRunTime"],
        cpu_ms=s["executorCpuTime"] // 1_000_000, gc_ms=s["jvmGcTime"],
    ))

agg["wall"] = round(wall, 2)
agg["cpus"] = cpus
agg["utilization"] = round(agg["task_time"] / (wall * 1000 * cpus), 3)
agg["cpu_frac"] = round(agg["cpu_time"] / max(agg["task_time"], 1), 3)
agg["gc_frac"] = round(agg["gc_time"] / max(agg["task_time"], 1), 4)
per_stage.sort(key=lambda x: -x["run_ms"])
print("RESULT " + json.dumps({{"agg": agg, "stages": per_stage[:8]}}))
spark.stop()
"""


def run_level(cpus: int, corpus: str) -> dict:
    code = CHILD.format(repo=str(REPO), cpus=cpus, corpus=corpus)
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[7:])
    raise RuntimeError(f"no RESULT from child: {p.stdout[-2000:]} {p.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, nargs="+", default=[8, 32])
    ap.add_argument("--docs", type=int, default=250000)
    args = ap.parse_args()

    corpus = f"/tmp/textindex_bench/corpus_profile_{args.docs}"
    if not Path(corpus, "_SUCCESS").exists():
        code = f"""
import sys; sys.path.insert(0, {str(REPO)!r})
from textindex_spark.session import get_spark
from textindex_spark.corpus import synth_corpus
from tests.spark_fixtures import corpus_df
spark = get_spark("mkcorpus", cpus=16, shuffle_partitions=32,
                  extra_conf={{"spark.ui.showConsoleProgress": "false"}})
spark.sparkContext.setLogLevel("ERROR")
corpus_df(spark, synth_corpus({args.docs})).repartition(64)\\
    .write.mode("overwrite").parquet({corpus!r})
spark.stop()
"""
        subprocess.run([sys.executable, "-c", code], check=True, timeout=1800)

    results = {}
    for c in args.cpus:
        results[str(c)] = run_level(c, corpus)
        print(json.dumps({c: results[str(c)]["agg"]}))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
