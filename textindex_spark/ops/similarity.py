"""Similarity search over embedding columns (array<float>).

* ``cosine_topk`` — exact brute-force scan: JVM higher-order
  ``zip_with``/``aggregate`` dot products (no Python), top-k via
  TakeOrderedAndProject. The correctness baseline; at 10^12 rows this
  is one narrow scan + a k-row driver merge, embarrassingly parallel.
* ``ivf_cosine_topk`` — the scale path: k-means-free IVF with
  deterministic hash-assigned centroids built from sampled rows;
  queries probe the ``n_probe`` nearest centroids only, reading a
  partition-pruned fraction of the table (write the table partitioned
  by ``bucket`` to make the pruning physical).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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


def build_ivf(
    emb: DataFrame, n_centroids: int = 16, id_col: str = "vec_id", vec_col: str = "embedding"
) -> tuple[DataFrame, list[list[float]]]:
    """Assign every vector to its nearest of ``n_centroids`` centroids
    (centroids = deterministic sample: the vectors whose id hashes to
    the smallest values — a k-means++-free seeding that needs one scan).
    Returns (assigned_df with 'bucket', centroids)."""
    seeds = (
        emb.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(n_centroids)
        .collect()
    )
    centroids = [list(map(float, r[vec_col])) for r in seeds]
    assigned = emb
    best_b, best_s = F.lit(0), F.lit(float("-inf"))
    for b, c in enumerate(centroids):
        s = _dot(F.col(vec_col), F.array(*[F.lit(x) for x in c]))
        best_b = F.when(s > best_s, F.lit(b)).otherwise(best_b)
        best_s = F.greatest(best_s, s)
    return assigned.withColumn("bucket", best_b), centroids


def ivf_cosine_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only the n_probe buckets whose
    centroids are most query-similar (partition pruning at scale)."""
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    sims = [
        float(np.dot(q, np.asarray(c)) / ((np.linalg.norm(q) or 1) * (np.linalg.norm(c) or 1)))
        for c in centroids
    ]
    probe = sorted(range(len(centroids)), key=lambda b: -sims[b])[:n_probe]
    pruned = assigned.filter(F.col("bucket").isin(probe))
    return cosine_topk(pruned, query_vec, k, id_col, vec_col)
