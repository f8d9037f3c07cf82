"""Composed streaming ingest: filter → online dedup → incremental
index.

The online counterpart of ``textindex_spark.pipeline.run_pipeline``:
each micro-batch is filtered (lang / quality / length verdicts),
deduplicated against the kept-corpus state (exact + LSH-estimated
near, `streaming.dedup.dedup_batch`), and its survivors appended to a
live BM25 index (`build.append_batch` under the stream-identity
protocol of `streaming.incremental`).

Exactly-once across TWO state stores. The dedup state and the index
each publish with their own atomic manifest commit carrying a
(run_id, batch_id) idempotence marker. The composition is replay-safe
because each phase is independently idempotent and the index phase's
input is a pure function of the dedup phase's COMMITTED state:

* crash before the dedup commit → the whole batch re-runs;
* crash between the two commits → the dedup replay is a no-op and the
  survivor set is recomputed from the already-committed verdicts —
  the same rows — then the index append commits;
* crash after both commits → both replays are no-ops.

Survivors = batch keepers ∖ verdict doc_ids ∖ already-indexed
doc_ids: the last anti-join makes a re-ingested already-kept doc_id
(which ``dedup_batch`` tolerates as a no-op) idempotent for the index
too.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from textindex_spark import manifest
from textindex_spark.build import append_batch, build_index, maybe_compact
from textindex_spark.ops.textstats import filter_corpus, filter_verdicts
from textindex_spark.pipeline import _with_analysis_text
from textindex_spark.refimpl.stop_words import STOP_WORD_SET
from textindex_spark.streaming.dedup import (
    EST_THRESHOLD_DEFAULT,
    dedup_batch,
    read_verdicts,
)
from textindex_spark.streaming.incremental import DOC_SCHEMA, _index_exists


def stream_pipeline(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    langs: tuple[str, ...] = ("en",),
    min_quality_micro: int = 500_000,
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    est_threshold: float = EST_THRESHOLD_DEFAULT,
    extract_html: bool = False,
    available_now: bool = True,
    range_bits: int = 13,
    max_files_per_trigger: int = 8,
    bench_path: str | None = None,
    decontam_ngram: int = 5,
    decontam_max_hits: int = 0,
    redact: bool = False,
    gopher: bool = False,
    upsert: bool = False,
    alerts: list[tuple[str, str]] | None = None,
):
    """Continuously ingest parquet files arriving under ``source_dir``
    into ``<out_dir>/index``, with filtering and online dedup
    (state under ``<out_dir>/dedup_state``) applied per micro-batch.

    ``bench_path`` (optional): parquet of an evaluation benchmark;
    each batch is decontaminated against its (persisted, broadcast)
    shingle-hash set before dedup. The verdict is a pure per-doc
    function of (doc text, benchmark), so replays decide identically —
    no extra state store needed."""
    if alerts:
        from textindex_spark.percolate import compile_queries

        compile_queries(alerts)  # fail fast before the stream starts
    state_dir = f"{out_dir}/dedup_state"
    index_dir = f"{out_dir}/index"
    run_id = manifest.canon_path(checkpoint_dir)
    stop = tuple(sorted(STOP_WORD_SET))
    state = {"bootstrapped": _index_exists(spark, index_dir)}
    bench_hashes = None
    if bench_path is not None:
        from textindex_spark.ops.curate import bench_shingle_hashes

        # small (eval-suite-sized) hash set, computed once and kept
        # resident across micro-batches
        bench_hashes = bench_shingle_hashes(
            spark.read.parquet(bench_path), n=decontam_ngram
        ).persist()
        bench_hashes.count()

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if upsert:
            # same-url fetches merged into one micro-batch: keep the
            # latest per url BEFORE any content work (see
            # incremental.latest_batch_fetch — append_batch only
            # tombstones pre-existing versions)
            from textindex_spark.streaming.incremental import (
                latest_batch_fetch,
            )

            batch_df = latest_batch_fetch(batch_df)
        s = batch_df.sparkSession
        batch = _with_analysis_text(batch_df, extract_html)
        verdicts = filter_verdicts(
            batch,
            stop,
            langs=tuple(langs),
            min_quality_micro=min_quality_micro,
            min_tokens=min_tokens,
            max_tokens=max_tokens,
        )
        kept = filter_corpus(batch, verdicts)
        if gopher:
            # stateless per-doc repetition verdict (within-document
            # signals only — no corpus state), so replays decide
            # identically; runs on raw text before redaction
            from pyspark.sql import functions as F

            from textindex_spark.ops.textstats import repetition_signals

            rep_drop = (
                repetition_signals(kept).filter(~F.col("keep")).select("doc_id")
            )
            kept = kept.join(rep_drop, "doc_id", "left_anti")
        if redact:
            # stateless per-doc scrub (same regexes every batch), so
            # replays redact identically; runs BEFORE dedup so state
            # signatures are taken over the scrubbed text
            from pyspark.sql import functions as F

            from textindex_spark.ops.curate import redact_pii

            red = redact_pii(kept).select(
                "doc_id", F.col("clean_text").alias("text")
            )
            kept = kept.drop("text").join(red, "doc_id").select(*kept.columns)
        if bench_hashes is not None:
            from pyspark.sql import functions as F

            from textindex_spark.ops.curate import contamination_hits

            contaminated = contamination_hits(
                kept, bench_hashes, n=decontam_ngram, pre_hashed=True
            ).filter(F.col("n_hits") > decontam_max_hits).select("doc_id")
            kept = kept.join(contaminated, "doc_id", "left_anti")
        kept = kept.persist()
        try:
            # phase 1: dedup vs the kept-corpus state (atomic commit,
            # idempotent per (run_id, batch_id))
            dedup_batch(
                s, kept, state_dir, batch_id,
                est_threshold=est_threshold, run_id=run_id,
            )
            from textindex_spark.streaming.dedup import maybe_compact_state

            maybe_compact_state(s, state_dir)
            # phase 2: survivors → the index. Recomputed from the
            # committed verdicts so a replay lands on the same rows.
            dup_ids = read_verdicts(s, state_dir).select("doc_id")
            survivors = kept.join(dup_ids, "doc_id", "left_anti")
            if alerts:
                # standing-query alerts on this batch's dedup
                # survivors (the docs entering the corpus) — the
                # verdict set is committed, so a replay recomputes
                # the identical matches into the same idempotent dir
                from textindex_spark.percolate import percolate as _perc

                _perc(
                    s, alerts, survivors, with_urls=True
                ).write.mode("overwrite").parquet(
                    f"{out_dir}/alerts/batch_{batch_id}"
                )
            if not state["bootstrapped"]:
                if survivors.isEmpty():
                    return  # nothing survived yet; bootstrap later
                build_index(
                    s, survivors, index_dir, range_bits=range_bits,
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
                return  # index replay of an already-committed batch
            indexed = manifest.read_table(s, index_dir, "docs").select("doc_id")
            survivors = survivors.join(indexed, "doc_id", "left_anti")
            if survivors.isEmpty():
                return
            # upsert: a re-crawl whose text changed enough to clear
            # the online dedup replaces its old version atomically
            # (unchanged/near-identical re-fetches are dropped by the
            # dedup verdicts and never reach this point)
            append_batch(
                s, survivors, index_dir,
                extra_props={
                    "stream_batch_id": int(batch_id),
                    "stream_run_id": run_id,
                },
                replace_by_url=upsert,
            )
            maybe_compact(s, index_dir)
        finally:
            kept.unpersist()

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
