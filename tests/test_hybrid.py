"""Hybrid lexical+vector retrieval (`textindex_spark/hybrid.py`):
RRF fusion pinned against an independent python recomputation
(OracleIndex BM25 + numpy cosine + hand-rolled 1/(K+rank) fusion),
one-sided membership, the precomputed-vec_hits (IVF) branch, and the
url join."""
from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.spark_fixtures import corpus_df, spark  # noqa: F401
from textindex_spark import hybrid
from textindex_spark.build import build_index
from textindex_spark.ops import similarity
from textindex_spark.refimpl.oracle import OracleIndex

N_DOCS = 30
N_EMB = 20  # doc_ids 0..19 have embeddings; 20..29 are lex-only
DIM = 8
VEC_ONLY_ID = 100  # embedded but not in the corpus (vec-only branch)
WORDS = ["spark", "vector", "merge", "archive", "table", "quarry"]
TERMS = ["spark", "vector"]
K, DEPTH = 10, 15


def _rows():
    rows = []
    for i in range(N_DOCS):
        text = " ".join(WORDS[(i + j) % len(WORDS)] for j in range(3 + i % 4))
        rows.append(
            {
                "doc_id": i,
                "url": f"http://s{i % 5}.example/p{i}.html",
                "warc_ts": None,
                "html": None,
                "text": text,
                "lang": "de" if i % 2 else "en",
            }
        )
    return rows


def _vec(i: int) -> list[float]:
    # integer components → dot products / norms² are exact integers,
    # so Spark's fold and numpy's sum produce bit-identical doubles
    return [float(((i * 7 + j * 13) % 31) - 15) for j in range(DIM)]


QVEC = [float(((j * 11 + 3) % 31) - 15) for j in range(DIM)]


def _emb_df(spark):
    ids = list(range(N_EMB)) + [VEC_ONLY_ID]
    return spark.createDataFrame(
        [(i, _vec(i)) for i in ids], "vec_id long, embedding array<double>"
    )


def _python_hybrid(k=K, depth=DEPTH, rrf_k=hybrid.RRF_K):
    """Fully independent recomputation: OracleIndex BM25 (python
    floats) + numpy cosine, micro-ranked, fused in the engine's
    branch order (lex + vec)."""
    oracle = OracleIndex.build(_rows())
    lex = oracle.search(TERMS, k=depth, mode="or")
    lex_m = [(d, math.floor(s * 1e6 + 0.5)) for d, s in lex]
    lr = {
        d: r + 1
        for r, (d, _) in enumerate(sorted(lex_m, key=lambda t: (-t[1], t[0])))
    }
    q = np.array(QVEC)
    qn = sum(x * x for x in QVEC) ** 0.5 or 1.0
    cos = []
    for vid in list(range(N_EMB)) + [VEC_ONLY_ID]:
        v = np.array(_vec(vid))
        c = float(v @ q) / (max(float(np.sqrt(v @ v)), 1e-12) * qn)
        cos.append((vid, math.floor(c * 1e6 + 0.5), c))
    cos.sort(key=lambda t: (-t[2], t[0]))
    vtop = cos[:depth]
    vr = {
        vid: r + 1
        for r, (vid, _, _) in enumerate(
            sorted(vtop, key=lambda t: (-t[1], t[0]))
        )
    }
    fused = {}
    for d in set(lr) | set(vr):
        s = 0.0
        if d in lr:
            s += 1.0 / (rrf_k + lr[d])
        if d in vr:
            s += 1.0 / (rrf_k + vr[d])
        fused[d] = s
    top = sorted(fused.items(), key=lambda t: (-t[1], t[0]))[:k]
    return [(d, math.floor(s * 1e6 + 0.5)) for d, s in top], lr, vr


@pytest.fixture(scope="module")
def idx_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hybrid") / "idx")
    build_index(spark, corpus_df(spark, _rows()), d, range_bits=6)
    return d


def test_hybrid_matches_python_oracle(spark, idx_dir):
    got = hybrid.search_hybrid(
        spark, idx_dir, TERMS, _emb_df(spark), QVEC, k=K, depth=DEPTH
    ).collect()
    want, _, _ = _python_hybrid()
    assert [(r["doc_id"], r["rrf_micro"]) for r in got] == want


def test_hybrid_one_sided_membership(spark, idx_dir):
    got = hybrid.search_hybrid(
        spark, idx_dir, TERMS, _emb_df(spark), QVEC, k=N_DOCS + 5, depth=DEPTH
    ).collect()
    ids = {r["doc_id"]: r["rrf_micro"] for r in got}
    _, lr, vr = _python_hybrid(k=N_DOCS + 5)
    # the corpus-less embedded id rides the vector branch alone
    if VEC_ONLY_ID in vr:
        exp = math.floor(1e6 / (hybrid.RRF_K + vr[VEC_ONLY_ID]) + 0.5)
        assert ids[VEC_ONLY_ID] == exp
    # lex-only docs (20..29, no embedding) appear iff they ranked
    # in the lexical top-DEPTH, with a single-branch score
    for d in range(N_EMB, N_DOCS):
        if d in lr:
            assert ids[d] == math.floor(
                1e6 / (hybrid.RRF_K + lr[d]) + 0.5
            )
        else:
            assert d not in ids


def test_hybrid_ivf_branch_all_probe_matches_exact(spark, idx_dir):
    emb = _emb_df(spark)
    n_cent = 4
    seeds = similarity.seed_centroids(emb, n_cent)
    assigned = similarity.assign_buckets(emb, seeds)
    ivf_hits = similarity.ivf_cosine_topk(
        assigned, [list(c) for c in seeds], QVEC, k=DEPTH, n_probe=n_cent
    )
    got = hybrid.search_hybrid(
        spark, idx_dir, TERMS, None, None, k=K, depth=DEPTH,
        vec_hits=ivf_hits,
    ).collect()
    want, _, _ = _python_hybrid()
    assert [(r["doc_id"], r["rrf_micro"]) for r in got] == want


def test_hybrid_with_urls(spark, idx_dir):
    got = hybrid.search_hybrid(
        spark, idx_dir, TERMS, _emb_df(spark), QVEC, k=5, depth=DEPTH,
        with_urls=True,
    ).collect()
    assert len(got) == 5
    # both output surfaces order identically (quantized score + id)
    bare = hybrid.search_hybrid(
        spark, idx_dir, TERMS, _emb_df(spark), QVEC, k=5, depth=DEPTH,
    ).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in bare]
    for r in got:
        if r["doc_id"] < N_DOCS:
            assert r["url"] == (
                f"http://s{r['doc_id'] % 5}.example/p{r['doc_id']}.html"
            )
        else:  # vec-only id has no docs row
            assert r["url"] is None


def test_hybrid_scope_filters_both_branches(spark, idx_dir):
    """A scope applies to the vector branch too: only in-scope docs
    (and never corpus-less embedded ids) reach the fused result, with
    vector ranks assigned WITHIN the scope — equal to manually fusing
    the two prefiltered branches."""
    from pyspark.sql import functions as F

    from textindex_spark import query as Q

    got = hybrid.search_hybrid(
        spark, idx_dir, TERMS, _emb_df(spark), QVEC, k=10, depth=DEPTH,
        scope="lang:de",
    ).collect()
    assert got
    for r in got:
        assert r["doc_id"] % 2 == 1 and r["doc_id"] < N_DOCS
    # manual recomposition: scope each branch, then fuse
    lex = Q.search(
        spark, idx_dir, TERMS, k=DEPTH, mode="or", with_urls=False,
        scope="lang:de",
    ).select(
        "doc_id",
        F.floor(F.col("score") * 1e6 + F.lit(0.5)).cast("long").alias(
            "score_micro"
        ),
    )
    vec = (
        similarity.cosine_topk(_emb_df(spark), QVEC, k=DEPTH)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.col("cos_micro").alias("score_micro"),
        )
        .filter((F.col("doc_id") % 2 == 1) & (F.col("doc_id") < N_DOCS))
    )
    want = hybrid.rrf_fuse([lex, vec], k=10).collect()
    assert [(r["doc_id"], r["rrf_micro"]) for r in got] == [
        (r["doc_id"], r["rrf_micro"]) for r in want
    ]


def test_hybrid_input_validation(spark, idx_dir):
    with pytest.raises(ValueError):
        hybrid.rrf_fuse([])
    with pytest.raises(ValueError):
        hybrid.search_hybrid(spark, idx_dir, TERMS, None, None)
