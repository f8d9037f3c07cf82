"""Streaming/incremental deduplication against the kept corpus.

The batch dedup ops (``textindex_spark.ops.dedup``) answer "which
pairs in THIS table are duplicates". A training-data ingest pipeline
needs the online form: documents arrive in batches and each new doc
must be checked against EVERYTHING kept so far — without rescanning
the history. This module keeps a compact dedup STATE (per kept doc:
one md5 row + N_MINHASHES signature rows + n_bands band-key rows —
a few hundred bytes/doc, independent of document size) and processes
each micro-batch with joins against that state:

* exact:  md5(text) equality against kept hashes AND within the batch
  (canonical = smallest doc_id).
* near:   MinHash-LSH band-key equality (``ops.dedup.lsh_band_keys``)
  proposes candidates — never an all-pairs join — and the estimated
  Jaccard (fraction of agreeing minhash positions, the standard
  unbiased estimator) confirms pairs at ``est_threshold``.

Kept-corpus semantics: docs flagged duplicate are NOT added to the
state, so future arrivals compare against survivors only — state
growth is bounded by the unique corpus, and verdicts always point at
a kept canonical doc.

Exactly-once: the same committed-batch-id protocol as
``stream_index`` — every output is staged under batch-tagged dirs and
published with ONE atomic manifest commit carrying
``dedup_batch_id``; replays of committed batches are skipped, crashes
before the commit re-stage the same dirs.

At 10^12 docs the state tables are the only join-side that grows:
band-key joins hash-partition on (band, band_key) (uniform — keys are
minhash tuples), signature verification joins on candidate doc_ids.
Store the state bucketed by those keys (Iceberg bucket transform) to
make the per-batch joins shuffle-light.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from textindex_spark import manifest
from textindex_spark.ops import dedup as D

# batch-vs-state verdict confirmation threshold: estimated Jaccard =
# |{j : mh_a[j] == mh_b[j]}| / N_MINHASHES
EST_THRESHOLD_DEFAULT = 0.5

STATE_SCHEMAS = {
    "dedup_exact": "doc_id long, text_md5 string",
    "dedup_sigs": "doc_id long, j int, mh long",
    "dedup_bands": "doc_id long, band int, band_key string",
    "dedup_verdicts": (
        "doc_id long, dup_of long, kind string, est_jaccard_micro long, "
        "batch_id long"
    ),
}
manifest.TABLE_SCHEMAS.update(STATE_SCHEMAS)


def _state(spark: SparkSession, state_dir: str, name: str) -> DataFrame:
    if manifest.table_exists(spark, state_dir, name):
        return manifest.read_table(spark, state_dir, name)
    from textindex_spark.session import local_df

    return local_df(spark, [], STATE_SCHEMAS[name])


def dedup_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    state_dir: str,
    batch_id: int,
    est_threshold: float = EST_THRESHOLD_DEFAULT,
    text_col: str = "text",
    max_band_bucket: int = D.MAX_BAND_BUCKET,
) -> None:
    """Process one batch: emit verdicts for duplicates (exact first,
    then LSH-confirmed near), add survivors to the state, commit
    atomically. Idempotent per batch_id."""
    committed = manifest.get_prop(spark, state_dir, "dedup_batch_id", -1)
    if int(batch_id) <= int(committed):
        return  # replay of an already-committed batch

    batch = batch_df.select("doc_id", F.col(text_col).alias("text"))
    # re-ingest of an already-KEPT doc_id is a no-op (same document,
    # not a duplicate) — without this, a replayed file under a new
    # batch id would double the doc's state rows
    batch = batch.join(
        _state(spark, state_dir, "dedup_exact").select("doc_id"),
        "doc_id",
        "left_anti",
    ).persist()

    # ---- exact, first-seen-wins: a batch doc whose hash exists in
    # the STATE dups to the state's canonical (whatever its id — ids
    # need not be monotonic across batches); otherwise the batch's
    # min doc_id per hash is the canonical for the rest of the batch
    ex_new = batch.select("doc_id", F.md5("text").alias("text_md5"))
    state_canon = (
        _state(spark, state_dir, "dedup_exact")
        .groupBy("text_md5")
        .agg(F.min("doc_id").alias("_state_of"))
    )
    batch_canon = ex_new.groupBy("text_md5").agg(F.min("doc_id").alias("_batch_of"))
    exact_v = (
        ex_new.join(state_canon, "text_md5", "left")
        .join(batch_canon, "text_md5")
        .withColumn(
            "dup_of",
            F.coalesce(
                "_state_of",
                F.when(F.col("doc_id") != F.col("_batch_of"), F.col("_batch_of")),
            ),
        )
        .filter(F.col("dup_of").isNotNull() & (F.col("dup_of") != F.col("doc_id")))
        .select(
            "doc_id",
            "dup_of",
            F.lit("exact").alias("kind"),
            F.lit(1_000_000).cast("long").alias("est_jaccard_micro"),
            F.lit(int(batch_id)).alias("batch_id"),
        )
    )

    # ---- near: candidates by band-key equality — batch vs STATE with
    # no id ordering (the kept doc is canonical regardless of id),
    # plus batch vs batch ordered by id; exact dups excluded
    # persist the per-batch derived frames: each feeds 2-3 downstream
    # actions (est agg, staging writes) and would otherwise re-run the
    # tokenize+MinHash lineage per action (round-3 review)
    sig_new = (
        D.minhash_signatures(batch)
        .withColumn("j", F.col("j").cast("int"))
        .persist()
    )
    bands_new = D.lsh_band_keys(sig_new).persist()
    bands_state = _state(spark, state_dir, "dedup_bands").select(
        "doc_id", "band", "band_key"
    )
    # exact-dropped batch docs are neither near-candidates nor valid
    # dup_of targets (their canonical is already in state / this
    # batch); within-batch NEAR chains (C≈B≈A with B dropped by the
    # same pass) can still point at a dropped doc — resolve chains
    # offline with ops.dedup.dedup_clusters if cluster-canonical
    # assignment matters downstream
    ex_ids = exact_v.select("doc_id")
    bands_live = bands_new.join(ex_ids, "doc_id", "left_anti")
    # hot-bucket guard (VERDICT r3, same cap as the batch path): a
    # band bucket holding > max_band_bucket docs across state + live
    # batch — the boilerplate-cluster shape exact collapse can't
    # catch (near-identical but distinct texts) — is excluded from
    # BOTH candidate joins, bounding every join group. Recall cost is
    # limited to pairs whose similarity rests on the saturated band;
    # the other bands still propose them.
    hot = (
        bands_state.select("band", "band_key")
        .unionByName(bands_live.select("band", "band_key"))
        .groupBy("band", "band_key")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > max_band_bucket)
        .select("band", "band_key")
    )
    state_cold = bands_state.join(hot, ["band", "band_key"], "left_anti")
    live_cold = bands_live.join(hot, ["band", "band_key"], "left_anti")
    cand_state = (
        live_cold.alias("n")
        .join(state_cold.alias("o"), ["band", "band_key"])
        .select(
            F.col("n.doc_id").alias("doc_id"),
            F.col("o.doc_id").alias("dup_of"),
        )
    )
    cand_batch = (
        live_cold.alias("n")
        .join(live_cold.alias("o"), ["band", "band_key"])
        .filter(F.col("o.doc_id") < F.col("n.doc_id"))
        .select(
            F.col("n.doc_id").alias("doc_id"),
            F.col("o.doc_id").alias("dup_of"),
        )
    )
    cand = cand_state.unionByName(cand_batch).distinct()
    sigs_all = _state(spark, state_dir, "dedup_sigs").unionByName(sig_new)
    est = (
        cand.join(sig_new.select(F.col("doc_id"), "j", F.col("mh").alias("_ma")), "doc_id")
        .join(
            sigs_all.select(
                F.col("doc_id").alias("dup_of"), "j", F.col("mh").alias("_mb")
            ),
            ["dup_of", "j"],
        )
        .groupBy("doc_id", "dup_of")
        .agg(
            (F.sum((F.col("_ma") == F.col("_mb")).cast("int")) / F.count("*"))
            .alias("_est")
        )
        .filter(F.col("_est") >= est_threshold)
    )
    near_v = est.select(
        "doc_id",
        "dup_of",
        F.lit("near").alias("kind"),
        F.floor(F.col("_est") * 1e6 + F.lit(0.5)).cast("long").alias("est_jaccard_micro"),
        F.lit(int(batch_id)).alias("batch_id"),
    )
    verdicts = exact_v.unionByName(near_v).persist()

    # ---- survivors enter the state (kept-corpus semantics)
    dropped = verdicts.select("doc_id").distinct()
    staged: dict[str, list[str]] = {}

    def _stage(name: str, df: DataFrame) -> None:
        path = f"{state_dir}/{name}_b{int(batch_id)}"
        df.write.mode("overwrite").parquet(path)
        staged[name] = [manifest.rel(state_dir, path)]

    _stage("dedup_exact", ex_new.join(dropped, "doc_id", "left_anti"))
    _stage("dedup_sigs", sig_new.join(dropped, "doc_id", "left_anti"))
    _stage("dedup_bands", bands_new.join(dropped, "doc_id", "left_anti"))
    _stage("dedup_verdicts", verdicts)
    for df in (verdicts, bands_new, sig_new, batch):
        df.unpersist()
    manifest.commit(
        spark,
        state_dir,
        add_to_tables=staged,
        props={"dedup_batch_id": int(batch_id)},
    )


def read_verdicts(spark: SparkSession, state_dir: str) -> DataFrame:
    """All duplicate verdicts so far → (doc_id, dup_of, kind,
    est_jaccard_micro, batch_id)."""
    return _state(spark, state_dir, "dedup_verdicts")


def stream_dedup(
    spark: SparkSession,
    source_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    est_threshold: float = EST_THRESHOLD_DEFAULT,
    max_band_bucket: int = D.MAX_BAND_BUCKET,
):
    """Continuously dedup parquet document batches arriving under
    ``source_dir`` (input_hint schema). Verdicts accumulate in the
    state's ``dedup_verdicts`` table; survivors define the kept
    corpus."""
    from textindex_spark.streaming.incremental import DOC_SCHEMA

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(source_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        dedup_batch(
            batch_df.sparkSession, batch_df, state_dir, batch_id, est_threshold,
            max_band_bucket=max_band_bucket,
        )

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
