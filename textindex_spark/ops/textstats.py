"""Text analysis operators: language-ID, quality scoring, token
counting, document fingerprinting. Pure Catalyst expressions —
whole-stage-codegen'd, no Python in the hot path."""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from textindex_spark.ops.dedup import (
    portable_hash60,
    shingles_col,
    shingles_pos_col,
    tokens_col,
    ws_tokens_col,
)
from textindex_spark.session import local_df

# Small public high-frequency marker lists per language (the reference
# stop-word table is merged across languages, so language attribution
# needs these separate lists).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "a", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr": ("le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"),
}

# BPE-ish segmentation: letter runs, digit runs, single other chars.
# The whitespace class is spelled out (not \s) so the Java regex here
# and the RE2 regex in the DuckDB oracle exclude the exact same set.
BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n\\r\\x0B\\f]"


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (doc_id, pred_lang, best_hits): n-gram/stop-word heuristic —
    count marker-word hits per language, argmax with fixed tie order
    (de < en < fr alphabetical), 'und' (unknown) when no marker hits."""
    toks = F.transform(ws_tokens_col(F.col(text_col)), lambda t: F.lower(t))
    df = docs.select("doc_id", toks.alias("toks"))
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        df = df.withColumn(
            f"hits_{lang}",
            F.size(F.filter(F.col("toks"), lambda t: F.array_contains(arr, t))),
        )
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    pred = F.when(best <= 0, F.lit("und"))
    for lg in langs:
        pred = pred.when(F.col(f"hits_{lg}") == best, F.lit(lg))
    return df.select("doc_id", pred.alias("pred_lang"), best.alias("best_hits"))


def quality_score(
    docs: DataFrame, stop_words: tuple[str, ...], text_col: str = "text"
) -> DataFrame:
    """→ (doc_id, n_tokens, n_chars, stop_ratio_micro, mean_tok_len_micro,
    quality_micro): length/stop-word/token-shape heuristics. quality =
    clamp01(0.4*stop_presence + 0.3*len_score + 0.3*shape_score).

    Stop-word membership is a broadcast hash join against the 1386-row
    stop table — not an ``array_contains`` over a 1386-literal array,
    which is O(tokens × |stops|) per row and bloats the plan into a
    kilo-literal expression. The per-doc stats come back via one
    map-side-combining groupBy(doc_id)."""
    spark = docs.sparkSession
    stop_df = local_df(
        spark, [(w,) for w in sorted(set(stop_words))], "tok string"
    ).withColumn("is_stop", F.lit(1))
    # newline-normalized split: extracted web text separates blocks
    # with '\n'; a space-only split would merge "a\nb" into one token
    # and undercount every multi-line document (r4 close-out fix; the
    # gate corpus is newline-free, so the DuckDB mirror is equivalent)
    toks = ws_tokens_col(F.col(text_col))
    tok_rows = docs.select(
        "doc_id",
        F.length(text_col).alias("n_chars"),
        F.explode_outer(toks).alias("tok"),
    ).withColumn(
        # the stop lookup is post-lowercase, matching the reference
        # tokenizer (refimpl/stop_words.py: binary search AFTER
        # lowercasing) — sentence-initial "The"/"And" must count as
        # stop words or Title-Case docs lose the stop_presence weight;
        # token counts/lengths stay on the original token
        "_ltok",
        F.lower(F.col("tok")),
    )
    df = (
        tok_rows.join(
            F.broadcast(stop_df.withColumnRenamed("tok", "_ltok")),
            "_ltok",
            "left",
        )
        .groupBy("doc_id")
        .agg(
            F.first("n_chars").alias("n_chars"),
            F.count("tok").cast("int").alias("n_tokens"),
            F.coalesce(F.sum("is_stop"), F.lit(0)).alias("n_stop"),
            F.coalesce(F.sum(F.length("tok")).cast("double"), F.lit(0.0)).alias(
                "tok_chars"
            ),
        )
    )
    n_tok = F.greatest(F.col("n_tokens"), F.lit(1))
    stop_ratio = F.col("n_stop") / n_tok
    mean_len = F.col("tok_chars") / n_tok
    len_score = F.least(F.col("n_tokens") / F.lit(64.0), F.lit(1.0))
    shape_score = F.when((mean_len >= 3.0) & (mean_len <= 8.0), 1.0).otherwise(0.0)
    stop_presence = F.least(stop_ratio * 5.0, F.lit(1.0))
    quality = stop_presence * 0.4 + len_score * 0.3 + shape_score * 0.3
    micro = lambda c: F.floor(c * 1e6 + F.lit(0.5)).cast("long")  # noqa: E731
    return df.select(
        "doc_id",
        "n_tokens",
        "n_chars",
        micro(stop_ratio).alias("stop_ratio_micro"),
        micro(mean_len).alias("mean_tok_len_micro"),
        micro(quality).alias("quality_micro"),
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (doc_id, n_ws_tokens, n_bpe_tokens): whitespace count + a
    BPE-ish regex segmentation count."""
    return docs.select(
        "doc_id",
        F.size(ws_tokens_col(F.col(text_col))).alias("n_ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(BPE_ISH_PATTERN)).alias("n_bpe_tokens"),
    )


def filter_verdicts(
    docs: DataFrame,
    stop_words: tuple[str, ...],
    langs: tuple[str, ...] = ("en",),
    min_quality_micro: int = 500_000,
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    text_col: str = "text",
) -> DataFrame:
    """→ (doc_id, pred_lang, quality_micro, n_tokens, keep, reason):
    the training-pipeline document filter — language allowlist +
    quality floor + token-count bounds composed into one verdict per
    doc. ``reason`` is the FIRST failing check in the fixed
    precedence lang > length > quality ('' when kept).

    Scale shape: ``lang_id`` is a narrow per-row expression;
    ``quality_score`` is one explode + map-side-combining
    groupBy(doc_id); the verdict join keys on doc_id (co-partitioned
    with the quality agg output). No collect, no Python in the hot
    path."""
    lid = lang_id(docs, text_col)
    q = quality_score(docs, stop_words, text_col)
    j = q.join(lid.select("doc_id", "pred_lang"), "doc_id")
    lang_ok = F.col("pred_lang").isin(list(langs))
    len_ok = (F.col("n_tokens") >= min_tokens) & (F.col("n_tokens") <= max_tokens)
    qual_ok = F.col("quality_micro") >= min_quality_micro
    return j.select(
        "doc_id",
        "pred_lang",
        "quality_micro",
        "n_tokens",
        (lang_ok & len_ok & qual_ok).alias("keep"),
        F.when(~lang_ok, F.lit("lang"))
        .when(~len_ok, F.lit("length"))
        .when(~qual_ok, F.lit("quality"))
        .otherwise(F.lit(""))
        .alias("reason"),
    )


def filter_corpus(docs: DataFrame, verdicts: DataFrame) -> DataFrame:
    """→ docs minus the dropped documents: one anti-join against the
    (typically small relative to the corpus) drop set."""
    drop = verdicts.filter(~F.col("keep")).select("doc_id")
    return docs.join(drop, "doc_id", "left_anti")


# Gopher repetition-filter thresholds (Rae et al. 2021, table A1):
# a document is dropped when ANY signal exceeds its threshold. Micro
# units so the keep verdict compares integers (engine-portable).
GOPHER_MAX_DUP_LINE_FRAC_MICRO = 300_000
GOPHER_MAX_DUP_LINE_CHAR_FRAC_MICRO = 200_000
GOPHER_MAX_TOP2_CHAR_FRAC_MICRO = 200_000
GOPHER_MAX_TOP3_CHAR_FRAC_MICRO = 180_000
GOPHER_MAX_DUP5_CHAR_FRAC_MICRO = 150_000

# Persisted base frames of the LAST repetition_signals call (released
# at the next call — the returned lazy frame references them).
_rep_persists: list[DataFrame] = []


def _top_gram_frac(base: DataFrame, n: int) -> DataFrame:
    """→ (doc_id, top{n}_c, top{n}_gchars): count and token-char
    length of the doc's most frequent n-gram (ties broken to the
    lexicographically smallest gram; deterministic across engines).
    Docs with fewer than n tokens are absent (callers coalesce 0).
    ``base`` = (doc_id, t: array<string>) — the caller's one
    (persisted) tokenization."""
    counts = (
        base.select(
            "doc_id",
            F.explode(shingles_col(F.col("t"), n)).alias("gram"),
        )
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("c"))
    )
    # min(struct(-c, gram, gchars)) == "highest count, then smallest
    # gram" — one map-side-combining agg instead of a ranking window.
    top = counts.groupBy("doc_id").agg(
        F.min(
            F.struct(
                (-F.col("c")).alias("nc"),
                F.col("gram").alias("g"),
                (F.length("gram") - (n - 1)).cast("long").alias("gchars"),
            )
        ).alias("t")
    )
    return top.select(
        "doc_id",
        (-F.col("t.nc")).alias(f"top{n}_c"),
        F.col("t.gchars").alias(f"top{n}_gchars"),
    )


def repetition_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (doc_id, n_lines, n_tokens, dup_line_frac_micro,
    dup_line_char_frac_micro, top2_char_frac_micro,
    top3_char_frac_micro, dup5_char_frac_micro, keep): the Gopher
    repetition filters (Rae et al. 2021 §A1.1) — the standard quality
    pass that catches boilerplate/spam pages whose *within-document*
    repetition survives corpus-level dedup.

    Definitions (each mirrored verbatim in the DuckDB oracle):
    * lines = non-empty '\\n' splits; a line occurring c times
      contributes c−1 duplicate occurrences (occurrences beyond the
      first, the DataTrove/NeMo formulation). dup_line_frac =
      Σ(c−1)/Σc; dup_line_char_frac weights by line length.
    * tokens = non-empty whitespace splits; total_chars = Σ token
      lengths (separators excluded, so the measure is layout-stable).
    * top{2,3}_char_frac = count·chars of the most frequent n-gram /
      total_chars, 0 when the top count is 1 (no repetition).
    * dup5_char_frac = chars of token positions covered by any
      occurrence of a ≥2×-repeated (within the doc) 5-gram /
      total_chars — position-coverage, not count-sum, so overlapping
      repeats can't push the fraction past 1.
    * keep = every signal at or below its Gopher threshold.

    Scale shape: everything is explode → groupBy(doc_id[, gram]) with
    map-side combine — keys are (doc, gram) pairs, no skew, no join
    wider than doc_id. The dup-5-gram coverage explodes 5 positions
    only for REPEATED grams (the rare case on clean text). The five
    signal subtrees all derive from ONE persisted (doc_id, tokens,
    lines) projection, so the corpus is scanned and tokenized once —
    not once per signal (six scans at 100 TB is the difference that
    matters; registry-released on the next call, the _lsh_persists
    pattern)."""
    while _rep_persists:
        _rep_persists.pop().unpersist()
    base = docs.select(
        "doc_id",
        ws_tokens_col(F.col(text_col)).alias("t"),
        F.filter(F.split(F.col(text_col), "\n"), lambda l: l != "").alias(
            "_lines"
        ),
    ).persist()
    _rep_persists.append(base)
    totals = base.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.aggregate(
            "t", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("total_chars"),
    )
    lines = base.select("doc_id", F.explode("_lines").alias("line"))
    lstat = (
        lines.groupBy("doc_id", "line")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_lines"),
            F.sum(F.col("c") - 1).alias("dup_lines"),
            F.sum(F.col("c") * F.length("line")).alias("line_chars"),
            F.sum((F.col("c") - 1) * F.length("line")).alias("dup_line_chars"),
        )
    )
    top2 = _top_gram_frac(base, 2)
    top3 = _top_gram_frac(base, 3)
    g5 = base.select(
        "doc_id",
        F.explode(shingles_pos_col(F.col("t"), 5)).alias("w"),
    ).select("doc_id", F.col("w.pos").alias("pos"), F.col("w.gram").alias("gram"))
    dup5g = (
        g5.groupBy("doc_id", "gram")
        .agg(F.count("*").alias("_c"))
        .filter(F.col("_c") >= 2)
        .select("doc_id", "gram")
    )
    cov5 = (
        g5.join(dup5g, ["doc_id", "gram"], "left_semi")
        .select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + 4)).alias("pos"),
        )
        .distinct()
    )
    tpos = base.select(
        "doc_id", F.posexplode("t").alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), F.length("tok").alias("tl"))
    dup5 = (
        cov5.join(tpos, ["doc_id", "pos"])
        .groupBy("doc_id")
        .agg(F.sum("tl").alias("dup5_chars"))
    )
    tc = F.greatest(F.col("total_chars"), F.lit(1))
    micro = lambda c: F.floor(c * 1e6 + F.lit(0.5)).cast("long")  # noqa: E731
    top_frac = lambda n: micro(  # noqa: E731
        F.when(
            F.coalesce(F.col(f"top{n}_c"), F.lit(0)) >= 2,
            F.col(f"top{n}_c") * F.col(f"top{n}_gchars") / tc,
        ).otherwise(F.lit(0.0))
    )
    out = (
        totals.join(lstat, "doc_id", "left")
        .join(top2, "doc_id", "left")
        .join(top3, "doc_id", "left")
        .join(dup5, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            "n_tokens",
            micro(
                F.coalesce(
                    F.col("dup_lines") / F.greatest(F.col("n_lines"), F.lit(1)),
                    F.lit(0.0),
                )
            ).alias("dup_line_frac_micro"),
            micro(
                F.coalesce(
                    F.col("dup_line_chars")
                    / F.greatest(F.col("line_chars"), F.lit(1)),
                    F.lit(0.0),
                )
            ).alias("dup_line_char_frac_micro"),
            top_frac(2).alias("top2_char_frac_micro"),
            top_frac(3).alias("top3_char_frac_micro"),
            micro(F.coalesce(F.col("dup5_chars"), F.lit(0)) / tc).alias(
                "dup5_char_frac_micro"
            ),
        )
    )
    return out.withColumn(
        "keep",
        (F.col("dup_line_frac_micro") <= GOPHER_MAX_DUP_LINE_FRAC_MICRO)
        & (F.col("dup_line_char_frac_micro") <= GOPHER_MAX_DUP_LINE_CHAR_FRAC_MICRO)
        & (F.col("top2_char_frac_micro") <= GOPHER_MAX_TOP2_CHAR_FRAC_MICRO)
        & (F.col("top3_char_frac_micro") <= GOPHER_MAX_TOP3_CHAR_FRAC_MICRO)
        & (F.col("dup5_char_frac_micro") <= GOPHER_MAX_DUP5_CHAR_FRAC_MICRO),
    )


PROFILE_PERCENTILES = (50, 90, 99)

# corpus_profile's shared projection cache (single-flight per process,
# like _rep_persists): the previous call's frame is unpersisted on the
# next call, after its returned union has normally been consumed
_profile_persists: list[DataFrame] = []


def corpus_profile(
    docs: DataFrame,
    text_col: str = "text",
    strata_col: str = "lang",
    percentiles: tuple[int, ...] = PROFILE_PERCENTILES,
) -> DataFrame:
    """→ (metric, stratum, value): the one-call corpus profile a
    pipeline prints before/after each stage — per-stratum and total
    ('*') document counts, token/char volumes, mean document length
    (micro), distinct-text count, corpus vocabulary size, and exact
    token-length percentiles.

    Every value is an integer with an engine-portable definition:
    percentile(p) is the SMALLEST doc length whose cumulative doc
    count reaches ceil(p/100 · n_docs) (percentile_disc semantics,
    spelled out as a cumulative sum over the doc-length histogram so
    no engine's interpolation flavor can drift the result).

    Scale shape: one groupBy(stratum) for the volume rows; the
    percentile pass aggregates the LENGTH HISTOGRAM (distinct doc
    lengths ≪ docs, bounded by max doc length), collects that tiny
    frame ONCE, and derives every percentile plus n_docs from the
    driver-side cumsum — one corpus scan total for the percentile
    block, no per-percentile jobs and no unpartitioned window; the
    shared (stratum, n_toks, n_chars, md5) projection is persisted so
    the volume aggs reuse it instead of re-tokenizing; vocab
    is one distinct-count over exploded tokens (map-side partial
    distinct). Nothing collects more than the histogram (≤ max doc
    length rows) and the profile rows themselves."""
    toks = ws_tokens_col(F.col(text_col))
    base = docs.select(
        F.coalesce(F.col(strata_col).cast("string"), F.lit("")).alias("stratum"),
        F.size(toks).cast("long").alias("n_toks"),
        F.length(text_col).cast("long").alias("n_chars"),
        F.md5(F.col(text_col)).alias("_h"),
    )
    # base feeds THREE consumers (per-stratum agg, total agg, and the
    # eager histogram collect below) — persist it so tokenize+md5 runs
    # once, not per consumer (same registry pattern as
    # repetition_signals; vocab stays its own scan, it needs the raw
    # token stream base doesn't carry)
    while _profile_persists:
        _profile_persists.pop().unpersist()
    base = base.persist()
    _profile_persists.append(base)

    def volume(grouped, label_col):
        return grouped.agg(
            F.count("*").alias("n_docs"),
            F.sum("n_toks").alias("total_tokens"),
            F.sum("n_chars").alias("total_chars"),
            F.floor(
                F.sum("n_toks") / F.count("*") * 1e6 + F.lit(0.5)
            ).cast("long").alias("mean_doc_len_micro"),
            F.count_distinct("_h").alias("n_unique_texts"),
        ).select(
            label_col.alias("stratum"),
            F.expr(
                "stack(5, 'n_docs', n_docs, 'total_tokens', total_tokens, "
                "'total_chars', total_chars, 'mean_doc_len_micro', "
                "mean_doc_len_micro, 'n_unique_texts', n_unique_texts) "
                "as (metric, value)"
            ),
        ).select("metric", "stratum", F.col("value").cast("long"))

    per = volume(base.groupBy("stratum"), F.col("stratum"))
    tot = volume(base.groupBy(), F.lit("*"))

    vocab = (
        docs.select(F.explode(toks).alias("tok"))
        .agg(F.count_distinct("tok").alias("v"))
        .select(
            F.lit("vocab_size").alias("metric"),
            F.lit("*").alias("stratum"),
            F.col("v").cast("long").alias("value"),
        )
    )

    # exact discrete percentiles over the doc-length histogram:
    # ONE job builds + collects the histogram (bounded by max doc
    # length, ≪ docs); cumsum and every percentile lookup happen
    # driver-side over the collected rows
    hist = sorted(
        (int(r["n_toks"]), int(r["c"]))
        for r in base.groupBy("n_toks").agg(F.count("*").alias("c")).collect()
    )
    n_total = sum(c for _, c in hist)
    cums: list[tuple[int, int]] = []
    running = 0
    for n_toks, c in hist:
        running += c
        cums.append((n_toks, running))
    pct_rows = []
    for p in percentiles:
        need = -(-p * n_total // 100)  # ceil(p/100 * n)
        val = next((n_toks for n_toks, cum in cums if cum >= need), 0)
        pct_rows.append((f"p{p}_doc_len", "*", val))
    pct = local_df(
        docs.sparkSession, pct_rows, "metric string, stratum string, value long"
    )
    return per.unionByName(tot).unionByName(vocab).unionByName(pct)


def doc_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (doc_id, fp60): 60-bit content fingerprint over the
    whitespace-normalized text (join of tokens with single spaces)."""
    norm = F.concat_ws(" ", tokens_col(F.col(text_col)))
    return docs.select("doc_id", portable_hash60(norm).alias("fp60"))
