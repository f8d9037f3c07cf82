"""Corpus-curation operators for training-data pipelines:
benchmark decontamination, PII redaction, deterministic stratified
sampling, per-stratum token-budget selection, corpus n-gram stats.

These extend the filter/dedup suite (`ops.textstats`, `ops.dedup`)
with the remaining passes a pre-training data pipeline runs between
"crawl" and "tokenizer":

* **Decontamination** — drop documents sharing n-gram overlap with an
  evaluation benchmark, so the training set cannot memorize test
  items. Shape: the benchmark's distinct shingle hashes are a SMALL
  set (eval suites are 10^4-10^6 items) → broadcast semi-join against
  the corpus shingles; the 100 TB side is never shuffled.
* **PII redaction** — regex scrubbing (emails, IPv4, phone numbers)
  as pure Catalyst `regexp_replace`/`regexp_count` expressions:
  whole-stage-codegen'd, no Python in the hot path. Patterns are
  RE2-compatible (no lookaround) so the DuckDB oracle runs the SAME
  patterns.
* **Stratified sampling** — deterministic hash-threshold sampling
  (`pmod(h60(salt||doc_id), 1e6) < rate_micro[stratum]`): per-row
  expression, no shuffle, reproducible across runs/engines — the
  property `df.sample()` does NOT give (partition-layout dependent).
* **Token-budget selection** — "take the highest-quality documents
  per stratum until the token budget": NOT one global sort. A
  histogram pass (one groupBy on (stratum, quality-bucket)) finds
  each stratum's boundary bucket driver-side (≤ strata×n_buckets
  rows), full buckets above it are kept with a filter, and only
  per-(stratum, bucket) windows — n_buckets× finer partitions than a
  per-stratum sort — assign exact running totals. Result is
  bit-identical to the naive global window (the oracle runs that
  formulation) at a fraction of the sort.

All float outputs are `*_micro` integers (floor(x*1e6+0.5)) so value
hashes can't drift on formatting, matching the rest of the gate.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from textindex_spark.ops.dedup import (
    portable_hash60,
    shingles_col,
    ws_tokens_col,
)
from textindex_spark.ops.textstats import quality_score
from textindex_spark.session import local_df

# RE2-compatible (and java.util.regex-compatible) PII patterns, applied
# in this order — email first so an address's dotted-digit tail can't
# be half-eaten by the IPv4 pass.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"

DECONTAM_NGRAM = 5


def bench_shingle_hashes(
    bench: DataFrame, n: int = DECONTAM_NGRAM, text_col: str = "text"
) -> DataFrame:
    """→ (h): distinct 60-bit hashes of the benchmark's n-word
    shingles — the broadcast side of decontamination. Hashes (not
    strings) keep the broadcast ~8 bytes/shingle."""
    return (
        bench.select(ws_tokens_col(F.col(text_col)).alias("_t"))
        .select(F.explode(shingles_col(F.col("_t"), n)).alias("shingle"))
        .select(portable_hash60(F.col("shingle")).alias("h"))
        .distinct()
    )


def contamination_hits(
    docs: DataFrame,
    bench: DataFrame,
    n: int = DECONTAM_NGRAM,
    text_col: str = "text",
    pre_hashed: bool = False,
) -> DataFrame:
    """→ (doc_id, n_shingles, n_hits, contam_micro): per-document
    benchmark n-gram overlap. ``n_hits`` counts the document's
    DISTINCT shingle hashes that appear anywhere in the benchmark;
    ``contam_micro`` = floor(n_hits/max(n_shingles,1)*1e6+0.5).
    Documents with fewer than ``n`` tokens have 0 shingles and 0 hits.
    ``pre_hashed=True`` takes ``bench`` as an already-computed
    ``bench_shingle_hashes`` frame (column ``h``) — the streaming
    pipeline persists it once across micro-batches.

    Scale shape: corpus shingles are hashed per-row (narrow), flagged
    by a BROADCAST left join against the benchmark's distinct
    shingle-hash set, then ONE aggregation keyed doc_id (distinct
    counts — partial aggregation applies, and the key is uniform:
    no hot-shingle skew is possible because nothing ever shuffles on
    the shingle itself). The final left join re-attaches 0-shingle
    docs."""
    sh = (
        docs.select("doc_id", ws_tokens_col(F.col(text_col)).alias("_t"))
        .select(
            "doc_id", F.explode(shingles_col(F.col("_t"), n)).alias("shingle")
        )
        .select("doc_id", portable_hash60(F.col("shingle")).alias("h"))
    )
    bench_h = bench if pre_hashed else bench_shingle_hashes(bench, n, text_col)
    per_doc = (
        sh.join(F.broadcast(bench_h.withColumn("_hit", F.lit(1))), "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("h").alias("n_shingles"),
            F.count_distinct(
                F.when(F.col("_hit") == 1, F.col("h"))
            ).alias("n_hits"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            F.floor(
                F.coalesce("n_hits", F.lit(0))
                / F.greatest(F.coalesce("n_shingles", F.lit(0)), F.lit(1))
                * 1e6
                + F.lit(0.5)
            )
            .cast("long")
            .alias("contam_micro"),
        )
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = DECONTAM_NGRAM,
    max_hits: int = 0,
    text_col: str = "text",
) -> DataFrame:
    """→ docs minus benchmark-contaminated documents (more than
    ``max_hits`` overlapping n-gram hashes). The drop set is an
    anti-join — typically tiny relative to the corpus."""
    drop = (
        contamination_hits(docs, bench, n, text_col)
        .filter(F.col("n_hits") > max_hits)
        .select("doc_id")
    )
    return docs.join(drop, "doc_id", "left_anti")


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (doc_id, n_emails, n_ipv4, n_phones, clean_text): PII
    scrubbed sequentially (email → IPv4 → phone), each count taken on
    the text as the PREVIOUS pass left it — so an email's dotted tail
    is never double-counted as an IP. Pure codegen'd expressions."""
    t0 = F.col(text_col)
    t1 = F.regexp_replace(t0, PII_EMAIL, "<EMAIL>")
    t2 = F.regexp_replace(t1, PII_IPV4, "<IP>")
    t3 = F.regexp_replace(t2, PII_PHONE, "<PHONE>")
    return docs.select(
        "doc_id",
        F.regexp_count(t0, F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(t1, F.lit(PII_IPV4)).cast("long").alias("n_ipv4"),
        F.regexp_count(t2, F.lit(PII_PHONE)).cast("long").alias("n_phones"),
        t3.alias("clean_text"),
    )


SAMPLE_SALT = "strat:"

# Persisted quality frame of the LAST budget_select call (released on
# the next call — the returned lazy frame references it; same bounded
# registry pattern as ops.dedup._lsh_persists).
_budget_persists: list[DataFrame] = []
# unigram_logprob's shared token-frequency frame (same single-flight
# registry semantics)
_nll_persists: list[DataFrame] = []


def sample_stratified(
    docs: DataFrame,
    rates_micro: dict[str, int],
    default_micro: int = 0,
    strata_col: str = "lang",
) -> DataFrame:
    """→ the deterministic per-stratum sample: keep a row iff
    ``pmod(h60('strat:'||doc_id), 1e6) < rate_micro[stratum]``.

    Hash-threshold sampling is the data-mixing primitive: rates are
    exact in expectation, the decision is a pure per-row function of
    doc_id (no shuffle, no RNG state, engine-reproducible — DuckDB
    computes the identical sample), and re-runs/appends sample
    consistently (a doc's verdict never changes as the corpus grows,
    unlike ``df.sample`` whose draw depends on partition layout)."""
    coin = F.pmod(
        portable_hash60(F.concat(F.lit(SAMPLE_SALT), F.col("doc_id").cast("string"))),
        F.lit(1_000_000),
    )
    # NULL strata collapse to '' — the same convention budget_select
    # and corpus_profile use; a raw NULL would fail every equality and
    # silently fall to default_micro
    strat = F.coalesce(F.col(strata_col).cast("string"), F.lit(""))
    rate = F.lit(int(default_micro))
    for stratum, micro in sorted(rates_micro.items()):
        rate = F.when(strat == stratum, F.lit(int(micro))).otherwise(rate)
    return docs.filter(coin < rate)


def budget_select(
    docs: DataFrame,
    stop_words: tuple[str, ...],
    token_budget: int,
    strata_col: str = "lang",
    n_buckets: int = 256,
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, stratum, n_tokens, cum_tokens): per stratum, the
    highest-quality documents whose running token total stays within
    ``token_budget``, ordered by (quality_micro DESC, doc_id ASC) —
    the deterministic prefix of the quality-sorted stratum.

    Semantics match the one-window formulation the oracle runs::

        SUM(n_tokens) OVER (PARTITION BY stratum
                            ORDER BY quality_micro DESC, doc_id
                            ROWS UNBOUNDED PRECEDING) <= budget

    but the execution NEVER sorts a whole stratum (a per-lang window
    is a handful of giant partitions at web scale). Instead:

    1. histogram pass — one groupBy((stratum, quality bucket)) token
       sum; ≤ strata×n_buckets rows collected driver-side;
    2. the driver walks each stratum's buckets top-down: buckets that
       fit entirely are kept by a broadcast-joined filter, the first
       bucket that would overflow is the BOUNDARY bucket;
    3. exact running totals come from windows partitioned by
       (stratum, bucket) — n_buckets× finer than a stratum sort; the
       boundary bucket's prefix cut uses its driver-computed prior
       total. Buckets below the boundary are dropped by the filter.

    The bucket is a monotone function of quality_micro, so bucket-desc
    + in-bucket (quality DESC, doc_id) order IS the global order and
    the result is bit-identical to the naive window. ``n_buckets``
    bounds the largest window partition (raise it toward 1e6 distinct
    quality values if strata are few and huge)."""
    spark = docs.sparkSession
    step = max(1_000_001 // n_buckets + 1, 1)
    q = quality_score(docs, stop_words, text_col).join(
        # NULL strata collapse to '' (same convention as
        # corpus_profile): the broadcast plan join below is plain
        # equality, so a raw NULL stratum would never match its own
        # plan row and silently vanish from the selection
        docs.select(
            "doc_id",
            F.coalesce(F.col(strata_col).cast("string"), F.lit("")).alias(
                "stratum"
            ),
        ),
        "doc_id",
    )
    rows = q.select(
        "doc_id",
        "stratum",
        "n_tokens",
        "quality_micro",
        F.floor(F.col("quality_micro") / F.lit(step)).cast("int").alias("bucket"),
    )
    # the quality pass (token explode + groupBy) feeds the histogram
    # collect AND the final windowed frame — persist so it runs once
    while _budget_persists:
        _budget_persists.pop().unpersist()
    rows = rows.persist()
    _budget_persists.append(rows)
    hist = (
        rows.groupBy("stratum", "bucket")
        .agg(F.sum("n_tokens").alias("toks"))
        .collect()
    )
    by_stratum: dict[str, list] = {}
    for r in hist:
        by_stratum.setdefault(r["stratum"], []).append((r["bucket"], r["toks"]))
    # (stratum, bucket, prior, boundary?): prior = tokens in all
    # HIGHER buckets of the stratum; buckets below the first overflow
    # are omitted — the join drops them
    plan_rows = []
    for stratum, buckets in by_stratum.items():
        cum = 0
        for bucket, toks in sorted(buckets, reverse=True):
            if cum + toks <= token_budget:
                plan_rows.append((stratum, bucket, cum, False))
                cum += toks
            else:
                plan_rows.append((stratum, bucket, cum, True))
                break
    plan = local_df(
        spark, plan_rows, "stratum string, bucket int, prior long, boundary boolean"
    )
    w = (
        Window.partitionBy("stratum", "bucket")
        .orderBy(F.col("quality_micro").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rows.join(F.broadcast(plan), ["stratum", "bucket"])
        .withColumn("cum_tokens", F.col("prior") + F.sum("n_tokens").over(w))
        .filter(~F.col("boundary") | (F.col("cum_tokens") <= F.lit(token_budget)))
        .select("doc_id", "stratum", "n_tokens", "cum_tokens")
    )


def unigram_logprob(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (doc_id, n_tokens, sum_nll_micro, avg_nll_micro): mean
    negative log2-probability of the document's tokens under the
    corpus's OWN unigram distribution with add-one smoothing —
    the cheap stand-in for LM perplexity filtering (CCNet-style):
    a high mean NLL marks unusual token mixes (gibberish,
    non-language, encoding junk), a very low one marks boilerplate;
    both tails are drop candidates.

    Determinism across engines: the per-TERM NLL is quantized to
    micro first (one double expression of three integers —
    floor(-log2((c+1)/(T+V))·1e6+0.5)), so the per-doc aggregate is
    INTEGER arithmetic (Σ tf·nll_micro, then an integer division) —
    immune to float summation order, which a few-hundred-addend
    double sum is not. Two passes over the token table: corpus
    unigram counts (one groupBy(term)), then a join back keyed on
    term (vocab-sized build side) + one groupBy(doc_id). No Python
    in the hot path."""
    toks = docs.select(
        "doc_id", F.explode(ws_tokens_col(F.col(text_col))).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    # tf feeds THREE plan branches (scored's join side, counts, and
    # tot via counts) and Spark does no cross-branch CSE — without a
    # persist the explode+groupBy scan runs three times per action
    # (same registry pattern as budget_select's shared frame)
    while _nll_persists:
        _nll_persists.pop().unpersist()
    tf = tf.persist()
    _nll_persists.append(tf)
    counts = tf.groupBy("tok").agg(F.sum("tf").alias("c"))
    tot = counts.agg(
        F.sum("c").alias("T"), F.count("*").alias("V")
    ).select("T", "V")
    nll = counts.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.floor(
            -F.log2((F.col("c") + 1) / (F.col("T") + F.col("V"))) * 1e6
            + F.lit(0.5)
        )
        .cast("long")
        .alias("nll_micro"),
    )
    scored = (
        tf.join(nll, "tok")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("nll_micro")).cast("long").alias(
                "sum_nll_micro"
            ),
        )
        .withColumn(
            "avg_nll_micro",
            # floor of an IEEE double quotient of two <2^53 ints is
            # engine-independent (correctly-rounded division; the
            # quotient is ≥1/n_tokens away from an integer unless
            # exact) — the DuckDB oracle floors the same quotient
            F.floor(F.col("sum_nll_micro") / F.col("n_tokens")).cast("long"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("sum_nll_micro", F.lit(0)).cast("long").alias(
                "sum_nll_micro"
            ),
            F.coalesce("avg_nll_micro", F.lit(0)).cast("long").alias(
                "avg_nll_micro"
            ),
        )
    )


def top_ngrams(
    docs: DataFrame, n: int = 3, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """→ (ngram, freq): the corpus's k most frequent n-word grams
    (multiplicity counted, ties broken by ngram ASC). One
    map-side-combining groupBy + TakeOrderedAndProject — the global
    top-k never materializes the full sort."""
    return (
        docs.select(ws_tokens_col(F.col(text_col)).alias("_t"))
        .select(F.explode(shingles_col(F.col("_t"), n)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("ngram").asc())
        .limit(k)
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 512,
    stride: int | None = None,
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, chunk_id, n_tokens, chunk_text): fixed-size token
    windows over each document — the "split long documents into
    context-window pieces" pass a tokenizer-bound pipeline runs last.
    ``stride`` < ``chunk_tokens`` gives overlapping chunks (the
    standard trick so no span is cut at every boundary); default is
    non-overlapping. chunk_id is the 0-based window index; the final
    chunk may be short; docs with zero tokens produce no chunks.

    Scale shape: a single per-row ``transform`` over start offsets +
    one explode — narrow, no shuffle at all (the chunker inherits the
    scan's partitioning)."""
    st = stride if stride is not None else chunk_tokens
    if st <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    # token array in its own projection: the chunk transform slices it
    # once per chunk, and inline tokenization would re-run per slice
    # (see dedup.doc_shingles)
    toked = docs.select("doc_id", ws_tokens_col(F.col(text_col)).alias("_t"))
    t = F.col("_t")
    # with overlap (stride < chunk), starts past len - (chunk - stride)
    # begin inside a span the PREVIOUS chunk already covers to the end
    # of the document — emitting them would duplicate suffix text into
    # fully-contained chunks, so the start sequence stops there
    # (non-overlapping strides leave the bound at len, unchanged)
    last_start = F.greatest(
        F.lit(1), F.size(t) - F.lit(max(0, chunk_tokens - st))
    )
    chunks = F.when(
        F.size(t) > 0,
        F.transform(
            F.sequence(F.lit(1), last_start, F.lit(st)),
            lambda start: F.struct(
                ((start - 1) / st).cast("long").alias("chunk_id"),
                F.concat_ws(" ", F.slice(t, start, chunk_tokens)).alias(
                    "chunk_text"
                ),
                F.least(
                    F.lit(chunk_tokens), F.size(t) - start + 1
                ).cast("long").alias("n_tokens"),
            ),
        ),
    ).otherwise(F.array().cast(
        "array<struct<chunk_id:bigint,chunk_text:string,n_tokens:bigint>>"
    ))
    return toked.select("doc_id", F.explode(chunks).alias("c")).select(
        "doc_id",
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.n_tokens").alias("n_tokens"),
        F.col("c.chunk_text").alias("chunk_text"),
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    n_groups: int = 1024,
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, pack_group, bin_id, n_tokens): deterministic
    document→training-sequence packing. Documents are hashed into
    ``n_groups`` independent pack groups; within a group they are
    filled sequentially (doc_id order) into ``seq_len``-token bins —
    bin_id = floor(tokens_before_this_doc / seq_len), the standard
    contiguous-fill approximation of sequence packing (a doc
    straddling a bin boundary is charged to the bin it starts in; the
    trainer's concat-and-split handles the carry).

    Scale shape: the only wide operation is a cumulative-sum window
    PER PACK GROUP — n_groups parallel partitions instead of the
    single-partition global window a naive global cumsum needs, which
    is the difference between a packing pass that scales and one that
    serializes the corpus through one task. Deterministic across
    runs/engines: group = md5-hash of doc_id, order = doc_id."""
    if seq_len <= 0 or n_groups <= 0:
        raise ValueError("seq_len and n_groups must be positive")
    base = docs.select(
        "doc_id",
        F.size(ws_tokens_col(F.col(text_col))).cast("long").alias("n_tokens"),
        F.pmod(
            portable_hash60(F.concat(F.lit("pack:"), F.col("doc_id").cast("string"))),
            F.lit(n_groups),
        ).cast("int").alias("pack_group"),
    )
    w = (
        Window.partitionBy("pack_group")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return base.select(
        "doc_id",
        "pack_group",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / F.lit(seq_len)
        ).cast("long").alias("bin_id"),
        "n_tokens",
    )
