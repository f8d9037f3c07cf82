"""Structured-Streaming wrapper around incremental indexing.

The reference has no streaming operators (SURVEY.md §2.8) — its
incremental story is re-run-and-skip (S7/S8). This module is the
Spark-native upgrade: a ``readStream`` file source feeding
``append_batch`` through ``foreachBatch``, giving exactly-once
index appends per micro-batch (checkpointed source offsets +
idempotent append keyed by doc_id watermark).

Batch mode (`trigger(availableNow=True)`) doubles as a one-shot
catch-up job, which is how the test drives it.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from textindex_spark.build import append_batch, build_index

DOC_SCHEMA = (
    "doc_id long, url string, warc_ts timestamp, html binary, "
    "text string, lang string"
)


def stream_index(
    spark: SparkSession,
    source_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    range_bits: int = 13,
):
    """Continuously index parquet files arriving under ``source_dir``.
    The first micro-batch bootstraps the index; later ones append."""
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )

    state = {"bootstrapped": _index_exists(spark, index_dir)}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if not state["bootstrapped"]:
            build_index(batch_df.sparkSession, batch_df, index_dir, range_bits=range_bits)
            state["bootstrapped"] = True
        else:
            append_batch(batch_df.sparkSession, batch_df, index_dir)

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def _index_exists(spark: SparkSession, index_dir: str) -> bool:
    try:
        spark.read.parquet(f"{index_dir}/stats").collect()
        return True
    except Exception:
        return False
