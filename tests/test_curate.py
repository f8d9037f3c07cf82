"""Curation ops (ops/curate.py) vs tiny Python oracles:
decontamination, PII redaction, stratified sampling, token-budget
selection, top n-grams."""
import hashlib

import pytest

from textindex_spark.ops import curate
from textindex_spark.refimpl.stop_words import STOP_WORD_SET

from tests.spark_fixtures import spark  # noqa: F401


def py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def py_shingles(text: str, n):
    toks = [t for t in text.split(" ") if t]
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


DOCS = [
    (0, "alpha beta gamma delta epsilon zeta eta theta", "en"),
    (1, "alpha beta gamma delta epsilon completely different tail", "en"),
    (2, "nothing in common with the benchmark at all here", "en"),
    (3, "short text", "en"),
    (4, "der schnelle braune fuchs springt faul darüber hinweg", "de"),
    (5, "alpha beta gamma delta epsilon zeta eta theta", "de"),  # dup of 0
]
BENCH = [(100, "alpha beta gamma delta epsilon zeta questions")]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, lang string")


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(BENCH, "doc_id long, text string")


def test_contamination_hits(spark, docs, bench):
    got = {r["doc_id"]: r for r in curate.contamination_hits(docs, bench, n=5).collect()}
    bench_sh = py_shingles(BENCH[0][1], 5)
    for doc_id, text, _ in DOCS:
        sh = py_shingles(text, 5)
        hits = len(sh & bench_sh)
        r = got[doc_id]
        assert r["n_shingles"] == len(sh)
        assert r["n_hits"] == hits, doc_id
        exp = int(hits / max(len(sh), 1) * 1e6 + 0.5)
        assert r["contam_micro"] == exp
    # doc 3 has < 5 tokens: zero shingles, zero hits
    assert got[3]["n_shingles"] == 0 and got[3]["contam_micro"] == 0


def test_contamination_crosses_newlines(spark, bench):
    """A benchmark item wrapped across lines in the document still
    counts as overlap: shingling tokenizes newlines as separators
    (space-only splitting would merge 'epsilon\\nzeta' into one token
    and miss every shingle that spans the line break)."""
    wrapped = spark.createDataFrame(
        [(7, "alpha beta gamma\ndelta epsilon zeta\neta theta")],
        "doc_id long, text string",
    )
    r = curate.contamination_hits(wrapped, bench, n=5).collect()[0]
    assert r["n_hits"] > 0, "cross-line benchmark overlap missed"


def test_decontaminate(spark, docs, bench):
    kept = {r["doc_id"] for r in curate.decontaminate(docs, bench, n=5).select("doc_id").collect()}
    bench_sh = py_shingles(BENCH[0][1], 5)
    exp = {d for d, t, _ in DOCS if not (py_shingles(t, 5) & bench_sh)}
    assert kept == exp
    assert 2 in kept and 3 in kept and 0 not in kept and 5 not in kept


PII_ROWS = [
    (0, "mail me at jane.doe+spam@example.co.uk or bob@x.io today"),
    (1, "server 10.2.3.4 talked to 192.168.0.255 but not 1.2.3.4567"),
    (2, "call 555-123-0199 or 555-000-1234 re 12-34-56"),
    (3, "mixed bob@x.io on 10.0.0.1 at 555-123-0199"),
    (4, "clean text with no sensitive values at all"),
]


def test_redact_pii(spark):
    df = spark.createDataFrame(PII_ROWS, "doc_id long, text string")
    got = {r["doc_id"]: r for r in curate.redact_pii(df).collect()}
    assert got[0]["n_emails"] == 2 and got[0]["n_ipv4"] == 0
    assert "<EMAIL>" in got[0]["clean_text"] and "@" not in got[0]["clean_text"]
    assert got[1]["n_ipv4"] == 2  # the 4-digit final octet fails \b
    assert "1.2.3.4567" in got[1]["clean_text"]
    assert got[2]["n_phones"] == 2 and "12-34-56" in got[2]["clean_text"]
    assert got[3]["n_emails"] == 1 and got[3]["n_ipv4"] == 1 and got[3]["n_phones"] == 1
    assert got[3]["clean_text"] == "mixed <EMAIL> on <IP> at <PHONE>"
    assert got[4]["clean_text"] == PII_ROWS[4][1]
    # the email's host is not also counted/redacted as an IP-ish hit
    assert got[0]["n_ipv4"] == 0 and got[0]["n_phones"] == 0


def test_sample_stratified_deterministic(spark, docs):
    rates = {"en": 1_000_000, "de": 0}
    got = {r["doc_id"] for r in curate.sample_stratified(docs, rates).collect()}
    assert got == {d for d, _, lg in DOCS if lg == "en"}
    # exact hash-threshold semantics, mirrored in python
    rates = {"en": 500_000, "de": 500_000}
    got = {r["doc_id"] for r in curate.sample_stratified(docs, rates).collect()}
    exp = {
        d
        for d, _, _ in DOCS
        if py_hash60(f"strat:{d}") % 1_000_000 < 500_000
    }
    assert got == exp
    # unlisted strata take the default rate (0 → dropped)
    got2 = {r["doc_id"] for r in curate.sample_stratified(docs, {"en": 1_000_000}).collect()}
    assert got2 == {d for d, _, lg in DOCS if lg == "en"}


def _naive_budget(spark, docs, budget):
    """The one-window oracle formulation."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from textindex_spark.ops.textstats import quality_score

    q = quality_score(docs, tuple(sorted(STOP_WORD_SET))).join(
        docs.select("doc_id", F.col("lang").alias("stratum")), "doc_id"
    )
    w = (
        Window.partitionBy("stratum")
        .orderBy(F.col("quality_micro").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        q.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= budget)
        .select("doc_id", "stratum", "n_tokens", "cum_tokens")
    )


@pytest.mark.parametrize("budget", [1, 12, 25, 10_000])
def test_budget_select_matches_naive_window(spark, docs, budget):
    stop = tuple(sorted(STOP_WORD_SET))
    got = sorted(
        map(tuple, curate.budget_select(docs, stop, budget).collect())
    )
    exp = sorted(map(tuple, _naive_budget(spark, docs, budget).collect()))
    assert got == exp


def test_budget_select_bucket_boundaries(spark):
    """Many docs with distinct quality levels so full-kept buckets,
    a boundary bucket, and dropped buckets all occur (n_buckets=4
    forces multiple docs per bucket)."""
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(4 + (i % 7))) + " the and of to in is", "en")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    stop = tuple(sorted(STOP_WORD_SET))
    for budget in (5, 37, 120, 10_000):
        got = sorted(
            map(tuple, curate.budget_select(docs, stop, budget, n_buckets=4).collect())
        )
        exp = sorted(map(tuple, _naive_budget(spark, docs, budget).collect()))
        assert got == exp, budget


def test_top_ngrams(spark, docs):
    got = [(r["ngram"], r["freq"]) for r in curate.top_ngrams(docs, n=5, k=3).collect()]
    from collections import Counter

    c = Counter()
    for _, text, _ in DOCS:
        toks = [t for t in text.split(" ") if t]
        for i in range(len(toks) - 4):
            c[" ".join(toks[i : i + 5])] += 1
    exp = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert got == exp


def test_unigram_logprob(spark, docs):
    """Exact match against a Python mirror (add-one-smoothed unigram
    NLL with per-term micro quantization, integer per-doc sums)."""
    import math
    from collections import Counter

    got = {r["doc_id"]: r for r in curate.unigram_logprob(docs).collect()}
    counts = Counter()
    for _, text, _ in DOCS:
        counts.update(t for t in text.split(" ") if t)
    T, V = sum(counts.values()), len(counts)
    nll = {
        t: math.floor(-math.log2((c + 1) / (T + V)) * 1e6 + 0.5)
        for t, c in counts.items()
    }
    for doc_id, text, _ in DOCS:
        toks = [t for t in text.split(" ") if t]
        s = sum(nll[t] for t in toks)
        r = got[doc_id]
        assert r["n_tokens"] == len(toks)
        assert r["sum_nll_micro"] == s
        assert r["avg_nll_micro"] == (math.floor(s / len(toks)) if toks else 0)
    # rare tokens carry more information than corpus-common ones
    per_tok = {t: nll[t] for t in counts}
    assert per_tok["alpha"] < per_tok["springt"]  # df 3 vs df 1


def test_curate_plan_shapes(spark, docs, bench):
    """Pin the PLANS.md §15 claims: stratified sampling is a pure
    scan filter (zero exchanges); the decontamination hit join is a
    broadcast on the shingle hash (never a shuffle keyed on the
    shingle)."""
    samp = curate.sample_stratified(docs, {"en": 300_000}, 100_000)
    plan = samp._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    hits = curate.contamination_hits(docs, bench, n=5)
    plan2 = hits._jdf.queryExecution().executedPlan().toString()
    # the corpus-side hit join is broadcast on the shingle hash; the
    # only SortMergeJoin keys on doc_id (the benchmark's own tiny
    # distinct may legitimately exchange on h — that's the small side)
    assert "BroadcastHashJoin [h" in plan2
    assert "SortMergeJoin [h" not in plan2


def test_chunk_documents_hand_computed(spark):
    from textindex_spark.ops import curate

    docs = spark.createDataFrame(
        [(0, "a b c d e f g"), (1, "x y"), (2, "")],
        "doc_id long, text string",
    )
    got = [
        tuple(r)
        for r in curate.chunk_documents(docs, chunk_tokens=3, stride=2)
        .orderBy("doc_id", "chunk_id")
        .collect()
    ]
    assert got == [
        (0, 0, 3, "a b c"),
        (0, 1, 3, "c d e"),
        (0, 2, 3, "e f g"),
        # no (0, 3, "g"): a start at 7 would chunk a strict suffix of
        # "e f g" — contained trailing chunks are not emitted
        (1, 0, 2, "x y"),    # empty doc 2: no chunks
    ]
    # stride < chunk with a truncated tail: the last emitted chunk
    # reaches the end once, never twice
    long = spark.createDataFrame(
        [(9, " ".join(f"t{i}" for i in range(10)))], "doc_id long, text string"
    )
    tail = [
        tuple(r)
        for r in curate.chunk_documents(long, chunk_tokens=8, stride=4)
        .orderBy("chunk_id")
        .collect()
    ]
    # starts 1, 5 — a start at 9 would emit [9..10] ⊂ [5..10]
    assert [(r[1], r[2]) for r in tail] == [(0, 8), (1, 6)]
    # non-overlapping default covers every token exactly once
    flat = (
        curate.chunk_documents(docs, chunk_tokens=3)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )
    per_doc = {}
    for r in flat:
        per_doc.setdefault(r["doc_id"], []).append(r["chunk_text"])
    assert " ".join(per_doc[0]) == "a b c d e f g"


def test_pack_sequences_fill_invariants(spark):
    from textindex_spark.ops import curate

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (5 + i % 7))) for i in range(200)],
        "doc_id long, text string",
    )
    rows = curate.pack_sequences(docs, seq_len=20, n_groups=4).collect()
    assert len(rows) == 200
    by_group = {}
    for r in sorted(rows, key=lambda r: (r["pack_group"], r["doc_id"])):
        by_group.setdefault(r["pack_group"], []).append(r)
    assert set(by_group) == {0, 1, 2, 3}
    for g, rs in by_group.items():
        cum = 0
        for r in rs:  # bin = floor(tokens before doc / seq_len)
            assert r["bin_id"] == cum // 20, (g, r)
            cum += r["n_tokens"]
        # bins are contiguous, starting at 0
        bins = [r["bin_id"] for r in rs]
        assert bins[0] == 0 and bins == sorted(bins)
