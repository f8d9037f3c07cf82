"""End-to-end pipeline tests: filter → dedup → index composition
(`textindex_spark.pipeline.run_pipeline`)."""
from __future__ import annotations

import datetime
import json

import pytest

from tests.spark_fixtures import corpus_df, spark  # noqa: F401

TS = datetime.datetime(2025, 1, 1, tzinfo=datetime.timezone.utc)

EN = (
    "the quick brown fox jumps over the lazy dog and runs to the river "
    "in the morning because it is hungry for a fresh meal of trout"
)
EN2 = (
    "searching the web index is a matter of postings and terms that "
    "live in the compressed blocks of a distributed table for queries"
)
EN3 = (
    "spark executes the plan in stages and shuffles data between the "
    "workers so that every join key lands in exactly one partition"
)
EN4 = (
    "documents flow through the filters and the deduplication before "
    "the tokenizer turns them into postings for the ranked index"
)
DE = (
    "der hund und die katze sind nicht mit dem vogel in das haus "
    "gelaufen weil der regen von dem himmel auf die strasse fiel und "
    "ein kind mit der mutter zu dem markt gegangen ist"
)
HTML_EN = (
    b"<html><head><title>page</title></head><body><p>"
    b"the crawler fetched this page from the web and the extractor "
    b"pulled the visible words out of the markup so that the index "
    b"can rank it for a query about crawling</p></body></html>"
)


def _row(i: int, text: str | None, html: bytes | None = None) -> dict:
    return {
        "doc_id": i,
        "url": f"https://site{i}.example/en/page{i}.html",
        "warc_ts": TS,
        "html": html,
        "text": text,
        "lang": "en",
    }


@pytest.fixture(scope="module")
def pipe_docs(spark):  # noqa: F811
    rows = [
        _row(1, EN),
        _row(2, EN2),
        _row(3, EN3),
        _row(4, EN4),
        _row(5, EN),  # exact duplicate of 1 → dedup drop
        _row(6, EN),  # exact duplicate of 1 → dedup drop
        _row(7, DE),  # lang drop
        _row(8, "the fox ran"),  # english but 3 tokens → length drop
        _row(9, None, HTML_EN),  # html-only: needs extract_html
    ]
    return corpus_df(spark, rows)


def test_pipeline_exact_dedup(spark, pipe_docs, tmp_path):  # noqa: F811
    from textindex_spark.pipeline import run_pipeline

    out = str(tmp_path / "pipe")
    lineage = run_pipeline(
        spark,
        pipe_docs,
        out,
        langs=("en",),
        min_quality_micro=0,
        min_tokens=5,
        dedup_method="exact",
        extract_html=True,
    )
    # filter stage: 9 in, 7 kept (doc 7 lang, doc 8 length)
    assert lineage["input_docs"] == 9
    assert lineage["filter"]["lang"] == 1
    assert lineage["filter"]["length"] == 1
    assert lineage["filter"]["kept"] == 7
    # dedup stage: docs 5 and 6 collapse into doc 1's cluster
    assert lineage["dup_dropped"] == 2
    assert lineage["indexed_docs"] == 5
    # the index is a normal queryable index
    from textindex_spark import manifest

    docs = manifest.read_table(spark, f"{out}/index", "docs")
    ids = sorted(r["doc_id"] for r in docs.select("doc_id").collect())
    assert ids == [1, 2, 3, 4, 9]
    from textindex_spark.query import search

    hits = search(spark, f"{out}/index", ["crawler"], k=5).collect()
    assert [r["doc_id"] for r in hits] == [9]  # the extracted html doc
    # lineage report persisted
    rep = json.loads((tmp_path / "pipe" / "pipeline.json").read_text())
    assert rep["indexed_docs"] == 5
    assert rep["dedup_method"] == "exact"


def test_pipeline_lsh_matches_exact_on_dups(spark, pipe_docs, tmp_path):  # noqa: F811
    from textindex_spark.pipeline import run_pipeline

    out = str(tmp_path / "pipe_lsh")
    lineage = run_pipeline(
        spark,
        pipe_docs,
        out,
        langs=("en",),
        min_quality_micro=0,
        min_tokens=5,
        dedup_method="lsh",
        extract_html=True,
    )
    # LSH must catch the exact duplicates at minimum
    assert lineage["dup_dropped"] >= 2
    assert lineage["indexed_docs"] <= 5


def test_pipeline_dedup_none(spark, pipe_docs, tmp_path):  # noqa: F811
    from textindex_spark.pipeline import run_pipeline

    out = str(tmp_path / "pipe_none")
    lineage = run_pipeline(
        spark,
        pipe_docs,
        out,
        langs=("en",),
        min_quality_micro=0,
        min_tokens=5,
        dedup_method="none",
        extract_html=True,
    )
    assert lineage["dup_dropped"] == 0
    assert lineage["indexed_docs"] == 7  # duplicates stay


def test_pipeline_rejects_unknown_method(spark, pipe_docs, tmp_path):  # noqa: F811
    from textindex_spark.pipeline import run_pipeline

    with pytest.raises(ValueError, match="unknown dedup method"):
        run_pipeline(spark, pipe_docs, str(tmp_path / "x"), dedup_method="bogus")


def test_stream_pipeline_end_to_end(spark, tmp_path):  # noqa: F811
    """Composed streaming ingest: per-micro-batch filter + online
    dedup + incremental index append; exactly-once across reruns."""
    from textindex_spark import manifest
    from textindex_spark.query import search
    from textindex_spark.streaming.dedup import read_verdicts
    from textindex_spark.streaming.pipeline import stream_pipeline

    en5 = (
        "a completely new page about the harvest arrived in the batch "
        "and the farmer counted the apples in the orchard for the fair"
    )
    src = tmp_path / "incoming"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    kwargs = dict(
        langs=("en",), min_quality_micro=0, min_tokens=5, range_bits=6
    )
    # batch 1: four keepers + a lang drop + a length drop
    corpus_df(
        spark,
        [
            _row(1, EN), _row(2, EN2), _row(3, EN3), _row(4, EN4),
            _row(7, DE), _row(8, "the fox ran"),
        ],
    ).coalesce(1).write.parquet(str(src / "b1"))
    stream_pipeline(spark, str(src / "*"), out, ckpt, **kwargs)
    idx = f"{out}/index"
    ids1 = sorted(
        r["doc_id"] for r in manifest.read_table(spark, idx, "docs").collect()
    )
    assert ids1 == [1, 2, 3, 4]
    # batch 2: one exact duplicate of doc 1 + one genuinely new doc
    corpus_df(spark, [_row(10, EN), _row(11, en5)]).coalesce(1).write.parquet(
        str(src / "b2")
    )
    stream_pipeline(spark, str(src / "*"), out, ckpt, **kwargs)
    ids2 = sorted(
        r["doc_id"] for r in manifest.read_table(spark, idx, "docs").collect()
    )
    assert ids2 == [1, 2, 3, 4, 11]
    v = read_verdicts(spark, f"{out}/dedup_state").collect()
    assert {(r["doc_id"], r["dup_of"], r["kind"]) for r in v} == {(10, 1, "exact")}
    # the live index answers queries (doc 11 is the only harvest page)
    hits = search(spark, idx, ["harvest"], k=5).collect()
    assert [r["doc_id"] for r in hits] == [11]
    # re-running with no new files is a no-op (exactly-once)
    stream_pipeline(spark, str(src / "*"), out, ckpt, **kwargs)
    ids3 = sorted(
        r["doc_id"] for r in manifest.read_table(spark, idx, "docs").collect()
    )
    assert ids3 == ids2
    stats = manifest.read_table(spark, idx, "stats").collect()[0]
    assert stats["n_docs"] == 5


def test_pipeline_decontam_stage(spark, pipe_docs, tmp_path):  # noqa: F811
    """--bench drops benchmark-overlapping docs after the filter and
    before dedup: EN2 shares its 5-grams with the benchmark, so it
    (and nothing else) disappears; exact dups of EN still collapse."""
    from textindex_spark.pipeline import run_pipeline

    bench = spark.createDataFrame([(100, EN2)], "doc_id long, text string")
    out = str(tmp_path / "pipe_decon")
    lineage = run_pipeline(
        spark,
        pipe_docs,
        out,
        langs=("en",),
        min_quality_micro=0,
        min_tokens=5,
        dedup_method="exact",
        extract_html=True,
        bench=bench,
    )
    assert lineage["decontam_dropped"] == 1
    assert lineage["dup_dropped"] == 2
    assert lineage["indexed_docs"] == 4
    from textindex_spark import manifest

    ids = sorted(
        r["doc_id"]
        for r in manifest.read_table(spark, f"{out}/index", "docs").collect()
    )
    assert ids == [1, 3, 4, 9]  # EN2's doc 2 decontaminated away
    # per-doc hit counts persisted for audit
    hits = {
        r["doc_id"]: r["n_hits"]
        for r in spark.read.parquet(f"{out}/decontam/hits").collect()
    }
    assert hits[2] > 0 and hits[1] == 0


def test_stream_pipeline_decontam(spark, tmp_path):  # noqa: F811
    """Streaming decontamination: contaminated docs never reach the
    index, across batches and replays."""
    from textindex_spark import manifest
    from textindex_spark.streaming.pipeline import stream_pipeline

    src = tmp_path / "incoming"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    bench_path = str(tmp_path / "bench.parquet")
    spark.createDataFrame([(100, EN3)], "doc_id long, text string").write.parquet(
        bench_path
    )
    kwargs = dict(
        langs=("en",), min_quality_micro=0, min_tokens=5, range_bits=6,
        bench_path=bench_path,
    )
    corpus_df(spark, [_row(1, EN), _row(3, EN3)]).coalesce(1).write.parquet(
        str(src / "b1")
    )
    stream_pipeline(spark, str(src / "*"), out, ckpt, **kwargs)
    idx = f"{out}/index"
    ids = sorted(
        r["doc_id"] for r in manifest.read_table(spark, idx, "docs").collect()
    )
    assert ids == [1]  # EN3 contaminated
    # second batch: another contaminated doc + a clean one
    corpus_df(spark, [_row(12, EN3), _row(13, EN4)]).coalesce(1).write.parquet(
        str(src / "b2")
    )
    stream_pipeline(spark, str(src / "*"), out, ckpt, **kwargs)
    ids2 = sorted(
        r["doc_id"] for r in manifest.read_table(spark, idx, "docs").collect()
    )
    assert ids2 == [1, 13]


def test_pipeline_redact_stage(spark, tmp_path):  # noqa: F811
    """--redact scrubs PII from kept text before dedup and indexing:
    the scrubbed corpus is what lands in <out>/kept and the index
    (searching the redaction placeholder token finds the doc; the
    raw address never enters the postings)."""
    from textindex_spark.pipeline import run_pipeline
    from textindex_spark.query import search

    pii_doc = _row(
        20,
        EN + " contact the farmer at old.macdonald@example.org or "
        "10.1.2.3 or 555-123-4567 for apples",
    )
    rows = [_row(1, EN2), pii_doc]
    out = str(tmp_path / "pipe_redact")
    lineage = run_pipeline(
        spark,
        corpus_df(spark, rows),
        out,
        langs=("en",),
        min_quality_micro=0,
        min_tokens=5,
        dedup_method="exact",
        redact=True,
    )
    assert lineage["redacted"] == {"emails": 1, "ipv4": 1, "phones": 1}
    kept_text = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{out}/kept").collect()
    }
    assert "<EMAIL>" in kept_text[20] and "@" not in kept_text[20]
    assert "10.1.2.3" not in kept_text[20] and "555-123-4567" not in kept_text[20]
    assert kept_text[1] == EN2  # clean doc untouched
    # the index was built over the scrubbed text
    # (the tokenizer keeps alphabetic runs, so "<EMAIL>" indexes as
    # the term "email" and the address's words vanish entirely)
    hits = search(spark, f"{out}/index", ["email"], k=5).collect()
    assert [r["doc_id"] for r in hits] == [20]
    assert search(spark, f"{out}/index", ["macdonald"], k=5).count() == 0


def test_stream_pipeline_redact(spark, tmp_path):  # noqa: F811
    """Streaming redaction: scrubbed text is what gets indexed."""
    from textindex_spark import manifest
    from textindex_spark.query import search
    from textindex_spark.streaming.pipeline import stream_pipeline

    src = tmp_path / "incoming"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    corpus_df(
        spark,
        [_row(1, EN + " write to farmer.joe@example.org for apples")],
    ).coalesce(1).write.parquet(str(src / "b1"))
    stream_pipeline(
        spark, str(src / "*"), out, ckpt,
        langs=("en",), min_quality_micro=0, min_tokens=5, range_bits=6,
        redact=True,
    )
    idx = f"{out}/index"
    assert [
        r["doc_id"] for r in search(spark, idx, ["email"], k=5).collect()
    ] == [1]
    assert search(spark, idx, ["farmer.joe@example.org"], k=5).count() == 0
    docs_text = manifest.read_table(spark, idx, "docs").collect()
    assert len(docs_text) == 1


def test_pipeline_gopher_stage(spark, tmp_path):  # noqa: F811
    """--gopher drops within-document-repetitive docs after the base
    filter: the boilerplate doc passes lang/length/quality but fails
    the repetition thresholds, never reaching dedup or the index."""
    from textindex_spark.pipeline import run_pipeline

    spam = _row(30, "the quick brown fox " * 12)  # 48 tokens, one 4-gram
    rows = [_row(1, EN), _row(2, EN2), spam]
    out = str(tmp_path / "pipe_gopher")
    lineage = run_pipeline(
        spark,
        corpus_df(spark, rows),
        out,
        langs=("en",),
        min_quality_micro=0,
        min_tokens=5,
        dedup_method="exact",
        gopher=True,
    )
    assert lineage["gopher_dropped"] == 1
    assert lineage["indexed_docs"] == 2
    kept_ids = {
        r["doc_id"] for r in spark.read.parquet(f"{out}/kept").collect()
    }
    assert kept_ids == {1, 2}
    # audit table persisted with the per-doc signals
    sig = {
        r["doc_id"]: r for r in spark.read.parquet(f"{out}/gopher").collect()
    }
    assert not sig[30]["keep"] and sig[30]["dup5_char_frac_micro"] > 150_000
    assert sig[1]["keep"] and sig[2]["keep"]


def test_pipeline_url_dedup_stage(spark, tmp_path):  # noqa: F811
    """--url-dedup collapses to the latest snapshot per canonical URL
    before any content work: the older fetch and the tracking-param
    spelling both vanish; the content dedup then never sees them."""
    import datetime

    from textindex_spark.pipeline import run_pipeline

    t0 = datetime.datetime(2025, 1, 1, tzinfo=datetime.timezone.utc)
    t1 = datetime.datetime(2025, 2, 1, tzinfo=datetime.timezone.utc)
    old = dict(_row(1, EN), url="https://a.example/p?x=1", warc_ts=t0)
    new = dict(
        _row(2, EN2),
        url="HTTPS://A.EXAMPLE:443/p?utm_source=f&x=1",
        warc_ts=t1,
    )
    other = dict(_row(3, EN3), url="https://b.example/q", warc_ts=t0)
    out = str(tmp_path / "pipe_url")
    lineage = run_pipeline(
        spark,
        corpus_df(spark, [old, new, other]),
        out,
        langs=("en",),
        min_quality_micro=0,
        min_tokens=5,
        dedup_method="exact",
        url_dedup=True,
    )
    assert lineage["url_snapshots_dropped"] == 1
    assert lineage["indexed_docs"] == 2
    kept_ids = {
        r["doc_id"] for r in spark.read.parquet(f"{out}/kept").collect()
    }
    assert kept_ids == {2, 3}  # doc 1 was the older snapshot of doc 2's page


def test_pipeline_url_dedup_without_doc_id(spark, tmp_path):  # noqa: F811
    """--url-dedup on the canonical crawl shape (no doc_id column —
    the input_hint contract): ids are minted before the snapshot
    dedup instead of crashing on an unresolved doc_id, and the
    latest snapshot per canonical URL still wins."""
    import datetime

    from textindex_spark.pipeline import run_pipeline

    t0 = datetime.datetime(2025, 1, 1, tzinfo=datetime.timezone.utc)
    t1 = datetime.datetime(2025, 2, 1, tzinfo=datetime.timezone.utc)
    old = dict(_row(1, EN), url="https://a.example/p?x=1", warc_ts=t0)
    new = dict(
        _row(2, EN2),
        url="HTTPS://A.EXAMPLE:443/p?utm_source=f&x=1",
        warc_ts=t1,
    )
    other = dict(_row(3, EN3), url="https://b.example/q", warc_ts=t0)
    out = str(tmp_path / "pipe_url_noid")
    lineage = run_pipeline(
        spark,
        corpus_df(spark, [old, new, other]).drop("doc_id"),
        out,
        langs=("en",),
        min_quality_micro=0,
        min_tokens=5,
        dedup_method="exact",
        url_dedup=True,
    )
    assert lineage["url_snapshots_dropped"] == 1
    assert lineage["indexed_docs"] == 2
    kept_urls = {
        r["url"] for r in spark.read.parquet(f"{out}/kept").collect()
    }
    # the later fetch's spelling survives, the older one is gone
    assert kept_urls == {
        "HTTPS://A.EXAMPLE:443/p?utm_source=f&x=1",
        "https://b.example/q",
    }


def test_pipeline_strip_lines_stage(spark, tmp_path):  # noqa: F811
    """--strip-lines cuts corpus-level boilerplate lines from kept
    text before dedup/index: the shared footer line vanishes from
    the indexed text, per-doc bodies survive."""
    from textindex_spark.pipeline import run_pipeline
    from textindex_spark.query import search

    footer = "megacorp footer navigation bar"
    rows = [
        _row(i, EN_BY_I[i] + "\n" + footer) for i in range(1, 4)
    ]
    out = str(tmp_path / "pipe_lines")
    lineage = run_pipeline(
        spark,
        corpus_df(spark, rows),
        out,
        langs=("en",),
        min_quality_micro=0,
        min_tokens=5,
        dedup_method="exact",
        strip_lines=True,
        max_line_df=2,
    )
    assert lineage["boilerplate_lines_dropped"] == 3
    kept_text = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{out}/kept").collect()
    }
    assert all(footer not in t for t in kept_text.values())
    # the footer terms are not indexed; body terms are
    assert search(spark, f"{out}/index", ["megacorp"], k=5).count() == 0
    assert search(spark, f"{out}/index", ["postings"], k=5).count() > 0


EN_BY_I = {1: EN, 2: EN2, 3: EN3}


def test_pipeline_linkgraph_stage(spark, tmp_path):  # noqa: F811
    """--linkgraph: the kept corpus's hyperlinks become graph tables
    and an anchor-field index keyed by the BODY index's doc ids."""
    from textindex_spark import fields

    def html_doc(i: int, tgt: int) -> bytes:
        body = (
            EN3 + f' see also <a href="https://site{tgt}.example/en/'
            f'page{tgt}.html">zzweb archive {tgt}</a>'
        )
        return f"<html><body><p>{body}</p></body></html>".encode()

    rows = [_row(i, None, html_doc(i, (i % 4) + 1)) for i in range(1, 6)]
    docs = corpus_df(spark, rows)
    out = str(tmp_path / "lg")
    lineage = __import__(
        "textindex_spark.pipeline", fromlist=["run_pipeline"]
    ).run_pipeline(
        spark, docs, out, dedup_method="none", extract_html=True,
        linkgraph=True, range_bits=6,
    )
    assert lineage["links"] == 5
    assert lineage["anchor_index_docs"] == 4  # targets 1..4 have in-links
    links = spark.read.parquet(f"{out}/graph/links")
    assert links.where("anchor LIKE 'zzweb archive%'").count() == 5
    pr = spark.read.parquet(f"{out}/graph/pagerank")
    assert abs(sum(r.rank for r in pr.collect()) - 1.0) < 1e-9
    # fielded retrieval through the composed outputs: every page's own
    # visible text carries its outgoing anchor's words too, so all 5
    # docs match in body — but the 4 link TARGETS additionally score
    # through the anchor field and outrank the body-only doc 5
    hits = fields.search_fielded(
        spark, f"{out}/index", f"{out}/anchor_index", ["zzweb"], k=10
    ).collect()
    assert len(hits) == 5
    assert hits[-1].doc_id == 5
    assert all(h.score > hits[-1].score for h in hits[:-1])
    # a text-only corpus (null html) has no anchors: graph tables are
    # empty, the anchor field is skipped, the pipeline still completes
    rows2 = [_row(i, EN3 + f" tail{i}") for i in range(1, 5)]
    lineage2 = __import__(
        "textindex_spark.pipeline", fromlist=["run_pipeline"]
    ).run_pipeline(
        spark, corpus_df(spark, rows2), str(tmp_path / "lg2"),
        dedup_method="none", linkgraph=True, range_bits=6,
    )
    assert lineage2["links"] == 0
    assert lineage2["anchor_index_docs"] == 0
    assert "anchor_index" not in lineage2


def test_pipeline_alerts_stage(spark, pipe_docs, tmp_path):  # noqa: F811
    """Standing-query alerts fire on exactly the docs that entered
    the index (survivors), read from the index's own segments table —
    no re-tokenize — with per-query lineage counts."""
    from textindex_spark import manifest
    from textindex_spark.pipeline import run_pipeline

    out = str(tmp_path / "palerts")
    alerts = [
        ("a_fox", "fox AND river"),        # doc 1 only (dups dropped)
        ("a_idx", "postings AND NOT web"), # doc 4 (doc 2 has 'web')
        ("a_none", "zzznope"),
    ]
    lineage = run_pipeline(
        spark, pipe_docs, out, dedup_method="exact", alerts=alerts,
        min_tokens=5,  # EN2/EN4 keep 9-12 tokens after stop-wording
    )
    got = {
        (r["query_id"], r["doc_id"])
        for r in spark.read.parquet(f"{out}/alerts").collect()
    }
    indexed = {
        r["doc_id"]
        for r in manifest.read_table(spark, out + "/index", "docs").collect()
    }
    assert got == {("a_fox", 1), ("a_idx", 4)}
    assert all(d in indexed for _, d in got)
    assert lineage["alerts"] == {"a_fox": 1, "a_idx": 1}
    # urls attach from the segments table
    urls = {
        r["doc_id"]: r["url"]
        for r in spark.read.parquet(f"{out}/alerts").collect()
    }
    assert urls[1] == "https://site1.example/en/page1.html"
    # invalid standing queries fail BEFORE any stage runs
    with pytest.raises(ValueError, match="none of its terms"):
        run_pipeline(
            spark, pipe_docs, str(tmp_path / "pbad"),
            dedup_method="exact", alerts=[("bad", "NOT fox")],
            min_tokens=5,
        )


def test_stream_pipeline_alerts(spark, tmp_path):  # noqa: F811
    """Streaming alerts: per-batch idempotent match dirs over the
    batch's dedup survivors."""
    from textindex_spark.streaming.pipeline import stream_pipeline

    src = tmp_path / "in"
    src.mkdir()
    out, ck = str(tmp_path / "sout"), str(tmp_path / "sck")
    rows1 = [_row(1, EN), _row(2, EN2)]
    rows2 = [_row(3, EN3), _row(4, EN4), _row(5, EN)]  # 5 dups 1
    corpus_df(spark, rows1).coalesce(1).write.parquet(str(src / "b1"))
    alerts = [("fox", "fox AND river"), ("posts", "postings")]
    stream_pipeline(spark, str(src / "*"), out, ck, alerts=alerts,
                    min_tokens=5)
    got1 = {
        (r["query_id"], r["doc_id"])
        for r in spark.read.parquet(f"{out}/alerts/batch_*").collect()
    }
    assert got1 == {("fox", 1), ("posts", 2)}
    corpus_df(spark, rows2).coalesce(1).write.parquet(str(src / "b2"))
    stream_pipeline(spark, str(src / "*"), out, ck, alerts=alerts,
                    min_tokens=5)
    got2 = {
        (r["query_id"], r["doc_id"])
        for r in spark.read.parquet(f"{out}/alerts/batch_*").collect()
    }
    # doc 5 is an online-dedup drop (exact dup of 1) → never alerts;
    # doc 4 matches 'postings'
    assert got2 == got1 | {("posts", 4)}
