"""Structured-Streaming wrapper around incremental indexing.

The reference has no streaming operators (SURVEY.md §2.8) — its
incremental story is re-run-and-skip (S7/S8). This module is the
Spark-native upgrade: a ``readStream`` file source feeding
``append_batch`` through ``foreachBatch``.

Exactly-once: ``append_batch`` stages every output directory and
publishes them with ONE atomic manifest commit that also records the
micro-batch id (``stream_batch_id`` prop). When Structured Streaming
retries a micro-batch after a failure, the sink compares the incoming
``batch_id`` against the last COMMITTED one and skips already-applied
batches — the commit is the idempotence marker, so a crash before it
re-runs the append (same staged dirs, overwritten) and a crash after
it becomes a no-op replay. Batch ids are scoped to ONE stream
identity (the checkpoint location, recorded as ``stream_run_id``): a
restart with a different checkpoint against the same index raises
instead of silently replay-skipping renumbered batches (ADVICE r3);
adopt explicitly with ``manifest.rebind_stream``.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from textindex_spark import manifest
from textindex_spark.build import append_batch, build_index, maybe_compact

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
    upsert: bool = False,
):
    """Continuously index parquet files arriving under ``source_dir``.
    The first micro-batch bootstraps the index; later ones append.

    ``upsert=True`` gives the stream re-crawl semantics: a batch row
    whose url is already live REPLACES the old version (tombstoned in
    the same atomic commit — `append_batch(replace_by_url=True)`), so
    the index always serves the latest fetch of every page. Replays
    stay exactly-once: the batch-id guard skips committed batches
    before any replacement happens."""
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )

    state = {"bootstrapped": _index_exists(spark, index_dir)}
    run_id = manifest.canon_path(checkpoint_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if upsert:
            # two fetches of the same url can land in ONE micro-batch
            # (maxFilesPerTrigger merges source files); append_batch
            # only tombstones PRE-EXISTING versions, so the batch must
            # be reduced to its latest fetch per url here or both
            # versions go live
            batch_df = latest_batch_fetch(batch_df)
        s = batch_df.sparkSession
        if not state["bootstrapped"]:
            # the batch-id guard rides the build's own snapshot commit:
            # no window where the index exists without the guard (a
            # crash there would replay batch 0 as a duplicating append)
            build_index(
                s, batch_df, index_dir, range_bits=range_bits,
                extra_props={
                    "stream_batch_id": int(batch_id),
                    "stream_run_id": run_id,
                },
            )
            state["bootstrapped"] = True
            return
        manifest.check_stream_identity(s, index_dir, run_id, "stream_run_id")
        committed = manifest.get_prop(s, index_dir, "stream_batch_id", -1)
        if int(batch_id) <= int(committed):
            return  # replay of an already-committed micro-batch
        # batch id rides in the SAME atomic commit as the appended data
        append_batch(
            s, batch_df, index_dir,
            extra_props={"stream_batch_id": int(batch_id), "stream_run_id": run_id},
            replace_by_url=upsert,
        )
        # bounded read amplification: fold accumulated append dirs
        # back into one postings table once enough pile up (manifest-
        # only check — free when below the threshold)
        maybe_compact(s, index_dir)

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def latest_batch_fetch(batch_df: DataFrame) -> DataFrame:
    """One row per url — the max ``(warc_ts, doc_id)`` fetch. The
    intra-batch half of upsert's "the index always serves the latest
    fetch" contract: ``append_batch(replace_by_url=True)`` tombstones
    only PRE-EXISTING versions and documents that multi-snapshot
    batches must be reduced upstream (build.py ``append_batch``);
    raw-url grouping deliberately matches its raw-url replacement."""
    keep = (
        batch_df.groupBy("url")
        .agg(
            F.max(
                F.struct(
                    F.col("warc_ts").alias("ts"), F.col("doc_id").alias("id")
                )
            ).alias("_k")
        )
        .select(F.col("_k.id").alias("doc_id"))
    )
    return batch_df.join(keep, "doc_id", "left_semi")


def _index_exists(spark: SparkSession, index_dir: str) -> bool:
    """True iff a committed index snapshot is present at
    ``index_dir``. Distinguishes ABSENT (no manifest, no stats dir —
    bootstrap is the right move) from a read FAILURE, which must
    PROPAGATE: a transient FS error swallowed here would flip
    ``bootstrapped`` to False on restart, and the next micro-batch's
    ``build_index`` bootstrap overwrites the default table dirs in
    place — silently discarding every previously committed batch."""
    if manifest.current_manifest(spark, index_dir) is not None:
        return True
    # legacy / manifest-less layout: the stats dir is the marker
    fs, jpath, _ = manifest._fs(spark, f"{index_dir}/stats")
    return bool(fs.exists(jpath))
