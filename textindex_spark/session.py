"""SparkSession factory with the engine's standard configuration.

Tuned for correctness tests on ``local[N]`` but with the settings that
matter at cluster scale spelled out: AQE (runtime re-planning, skew
splitting, partition coalescing), Arrow for every pandas UDF exchange,
and an explicit shuffle-partition default the jobs override per input
size.
"""
from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "textindex_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or None
    master = f"local[{cpus}]" if cpus else "local[*]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # runtime re-planning: coalesce small shuffle partitions,
        # split skewed ones (SURVEY.md §4 — replaces the reference's
        # 256 frequency bags as the adaptive half of skew handling)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # all pandas-UDF traffic over Arrow
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or (cpus or 32)))
        # ICU collation class-init stalls every executor thread for
        # 60-100s on first use of lower()/upper() in this environment
        # (verified via jstack: CollationAwareUTF8String <clinit>).
        # JVM case mapping is sufficient: the engine only lowercases
        # ASCII urls JVM-side; term lowercasing happens in the Python
        # kernels with reference semantics.
        .config("spark.sql.icu.caseMappings.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("TEXTINDEX_DRIVER_MEM", "8g"))
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
