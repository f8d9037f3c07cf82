"""Anchor-text retrieval field (`textindex_spark/fields.py`):
anchor-corpus derivation, two-field BM25 merging, tombstone and
anchor-only-match semantics. Scores are pinned against an independent
two-OracleIndex combination (same per-field BM25, python floats)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.spark_fixtures import corpus_df, spark  # noqa: F401
from textindex_spark import fields
from textindex_spark.build import build_index
from textindex_spark.query import delete_docs, search
from textindex_spark.refimpl.oracle import OracleIndex

N_DOCS = 24
WORDS = ["spark", "vector", "merge", "archive", "table", "quarry"]


def _body_rows():
    rows = []
    for i in range(N_DOCS):
        text = " ".join(
            WORDS[(i + j) % len(WORDS)] for j in range(3 + i % 4)
        )
        rows.append(
            {
                "doc_id": i,
                "url": f"http://s{i % 5}.example/p{i}.html",
                "warc_ts": None,
                "html": None,
                "text": text,
                "lang": "en" if i % 3 else "de",
            }
        )
    return rows


def _link_rows():
    """Incoming links: doc (i) ← anchors from two other pages. Doc 7
    is findable ONLY via anchors: the token 'zzmagnet' never appears
    in any body."""
    links = []
    for i in range(N_DOCS):
        dst = f"http://s{i % 5}.example/p{i}.html"
        links.append((f"http://ref{i}.example/a", dst, f"{WORDS[i % 6]} link", False))
        links.append((f"http://ref{i}.example/b", dst, f"{WORDS[(i + 2) % 6]} link", False))
    links.append(("http://hub.example/", "http://s2.example/p7.html", "zzmagnet page", False))
    links.append(("http://hub2.example/", "http://s2.example/p7.html", "zzmagnet page", False))
    return links


@pytest.fixture(scope="module")
def idx_dirs(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("fields")
    body_dir, anchor_dir = str(base / "body"), str(base / "anchor")
    build_index(spark, corpus_df(spark, _body_rows()), body_dir, range_bits=6)
    links = spark.createDataFrame(
        _link_rows(), "src_url string, dst_url string, anchor string, nofollow boolean"
    )
    fields.build_anchor_index(
        spark, body_dir, anchor_dir, links=links, range_bits=6
    )
    return body_dir, anchor_dir


def _anchor_oracle_rows(spark, idx_dirs):
    body_dir, _ = idx_dirs
    links = spark.createDataFrame(
        _link_rows(), "src_url string, dst_url string, anchor string, nofollow boolean"
    )
    docs = spark.createDataFrame(
        [(r["doc_id"], r["url"]) for r in _body_rows()], "doc_id long, url string"
    )
    adocs = fields.anchor_documents(docs, links).collect()
    return [
        {"doc_id": r.doc_id, "url": r.url, "html": None, "text": r.text, "lang": ""}
        for r in adocs
    ]


def test_anchor_documents_digest(spark, idx_dirs):
    rows = {r["doc_id"]: r["text"] for r in _anchor_oracle_rows(spark, idx_dirs)}
    assert len(rows) == N_DOCS
    # doc 7 carries the anchor-only token, counted once per distinct
    # anchor string (top_anchors digests distinct anchors)
    assert "zzmagnet" in rows[7]
    assert WORDS[7 % 6] in rows[7]


def test_anchor_only_match_ranks(spark, idx_dirs):
    body_dir, anchor_dir = idx_dirs
    got = fields.search_fielded(
        spark, body_dir, anchor_dir, ["zzmagnet"], k=5
    ).collect()
    assert [r.doc_id for r in got] == [7]
    assert got[0].url == "http://s2.example/p7.html"
    # and the body index alone can NOT find it
    assert search(spark, body_dir, ["zzmagnet"], k=5).count() == 0


@pytest.mark.parametrize("w_anchor", [1.0, 0.4])
@pytest.mark.parametrize("terms", [["spark"], ["spark", "vector"], ["qu*"]])
def test_fielded_scores_match_two_oracle_sum(spark, idx_dirs, terms, w_anchor):
    body_dir, anchor_dir = idx_dirs
    b_oracle = OracleIndex.build(_body_rows())
    a_oracle = OracleIndex.build(_anchor_oracle_rows(spark, idx_dirs))
    bs = dict(b_oracle.search(terms, k=10**6, mode="or"))
    as_ = dict(a_oracle.search(terms, k=10**6, mode="or"))
    want = {
        d: bs.get(d, 0.0) + w_anchor * as_.get(d, 0.0)
        for d in set(bs) | set(as_)
    }
    want_top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r.doc_id, r.score)
        for r in fields.search_fielded(
            spark, body_dir, anchor_dir, terms, k=10, w_anchor=w_anchor,
            with_urls=False,
        ).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want_top]
    for (gd, gs), (wd, ws) in zip(got, want_top):
        assert gs == pytest.approx(ws, abs=1e-9)


def test_fielded_random_differential(spark, tmp_path):
    """Seeded random corpora + random link structure: search_fielded
    must equal the independent two-OracleIndex weighted sum for every
    drawn (terms, w_anchor) — including wildcard and fuzzy patterns
    and docs matched in only one field."""
    import random

    rng = random.Random(421)
    vocab = WORDS + ["zzonly", "qualm", "quartz", "merger"]
    rows = []
    for i in range(30):
        text = " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 9)))
        rows.append(
            {
                "doc_id": i,
                "url": f"http://h{i % 7}.example/p{i}.html",
                "warc_ts": None,
                "html": None,
                "text": text,
                "lang": "en",
            }
        )
    links = []
    for _ in range(60):
        dst = rng.randrange(30)
        anchor = " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 3)))
        links.append(
            (f"http://ref{rng.randrange(9)}.example/",
             f"http://h{dst % 7}.example/p{dst}.html", anchor, False)
        )
    body_dir = str(tmp_path / "body")
    anchor_dir = str(tmp_path / "anchor")
    build_index(spark, corpus_df(spark, rows), body_dir, range_bits=6)
    ldf = spark.createDataFrame(
        links, "src_url string, dst_url string, anchor string, nofollow boolean"
    )
    fields.build_anchor_index(spark, body_dir, anchor_dir, links=ldf, range_bits=6)

    docs = spark.createDataFrame(
        [(r["doc_id"], r["url"]) for r in rows], "doc_id long, url string"
    )
    arows = [
        {"doc_id": r.doc_id, "url": r.url, "html": None, "text": r.text,
         "lang": ""}
        for r in fields.anchor_documents(docs, ldf).collect()
    ]
    b_oracle = OracleIndex.build(rows)
    a_oracle = OracleIndex.build(arows)

    for trial in range(8):
        n_terms = rng.randint(1, 3)
        terms = []
        for _ in range(n_terms):
            w = rng.choice(vocab)
            form = rng.random()
            if form < 0.2:
                terms.append(w[: max(2, len(w) // 2)] + "*")
            elif form < 0.3:
                terms.append(w + "~1")
            else:
                terms.append(w)
        w_anchor = rng.choice([0.25, 1.0, 2.0])
        bs = dict(b_oracle.search(terms, k=10**6, mode="or"))
        as_ = dict(a_oracle.search(terms, k=10**6, mode="or"))
        want = sorted(
            (
                (d, bs.get(d, 0.0) + w_anchor * as_.get(d, 0.0))
                for d in set(bs) | set(as_)
            ),
            key=lambda kv: (-kv[1], kv[0]),
        )[:10]
        got = [
            (r.doc_id, r.score)
            for r in fields.search_fielded(
                spark, body_dir, anchor_dir, terms, k=10,
                w_anchor=w_anchor, with_urls=False,
            ).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in want], (trial, terms)
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9), (trial, terms, gd)


def test_fielded_scope_filters_anchor_only_matches(spark, idx_dirs):
    body_dir, anchor_dir = idx_dirs
    # doc 7 (lang 'en', 7%3=1) survives lang:en, dies under lang:de
    got_en = fields.search_fielded(
        spark, body_dir, anchor_dir, ["zzmagnet"], k=5, scope="lang:en"
    ).collect()
    assert [r.doc_id for r in got_en] == [7]
    got_de = fields.search_fielded(
        spark, body_dir, anchor_dir, ["zzmagnet"], k=5, scope="lang:de"
    ).collect()
    assert got_de == []


def test_title_documents_extraction(spark):
    pages = spark.createDataFrame(
        [
            ("http://h.example/p1", "<html><head><title> The <b>Spark</b>\n Title </title></head></html>"),
            ("http://h.example/p2", "<html><body>no title here</body></html>"),
            ("http://h.example/p3", "<title>first</title><title>second ignored</title>"),
            ("http://H.EXAMPLE/p4?utm_a=1", b"<title>bytes \xfftitle</title>".decode("latin1")),
        ],
        "url string, html string",
    )
    docs = spark.createDataFrame(
        [
            (1, "http://h.example/p1"),
            (2, "http://h.example/p2"),
            (3, "http://h.example/p3"),
            (4, "http://h.example/p4"),  # canonical join: utm dropped, host lowered
        ],
        "doc_id long, url string",
    )
    got = {r.doc_id: r.text for r in fields.title_documents(docs, pages).collect()}
    assert got[1] == "The Spark Title"  # de-tagged, whitespace collapsed
    assert 2 not in got  # no title → no row
    assert got[3] == "first"  # lazy: first title element only
    assert 4 in got  # canonical-url join matched


def test_title_documents_dedupes_url_variants(spark):
    # two snapshots / URL spellings of the same page → ONE title row
    # (deterministic lexicographic min), not a join fanout
    pages = spark.createDataFrame(
        [
            ("http://h.example/p", "<title>zz later</title>"),
            ("HTTP://H.example/p?utm_a=1", "<title>aa earlier</title>"),
        ],
        "url string, html string",
    )
    docs = spark.createDataFrame(
        [(1, "http://h.example/p")], "doc_id long, url string"
    )
    got = fields.title_documents(docs, pages).collect()
    assert [(r.doc_id, r.text) for r in got] == [(1, "aa earlier")]


def test_build_title_index_refuses_empty_corpus(spark, idx_dirs, tmp_path):
    body_dir, _ = idx_dirs
    no_titles = spark.createDataFrame(
        [("http://h.example/x", "<p>plain text, no title</p>")],
        "url string, html string",
    )
    with pytest.raises(ValueError, match="no <title>"):
        fields.build_title_index(
            spark, body_dir, str(tmp_path / "t"), no_titles, range_bits=6
        )


def test_three_field_search_matches_three_oracle_sum(spark, idx_dirs, tmp_path):
    """body + anchor + title merged: exact vs three independent
    OracleIndex scorers combined with the same weights."""
    body_dir, anchor_dir = idx_dirs
    # title pages: doc i gets '<title>WORDS[i%6] heading</title>'
    pages = spark.createDataFrame(
        [
            (r["url"], f"<html><title>{WORDS[r['doc_id'] % 6]} heading</title></html>")
            for r in _body_rows()
        ],
        "url string, html string",
    )
    title_dir = str(tmp_path / "title")
    fields.build_title_index(spark, body_dir, title_dir, pages, range_bits=6)

    b_oracle = OracleIndex.build(_body_rows())
    a_oracle = OracleIndex.build(_anchor_oracle_rows(spark, idx_dirs))
    t_rows = [
        {"doc_id": r["doc_id"], "url": r["url"], "html": None,
         "text": f"{WORDS[r['doc_id'] % 6]} heading", "lang": ""}
        for r in _body_rows()
    ]
    t_oracle = OracleIndex.build(t_rows)

    terms, wa, wt = ["spark", "vector"], 0.5, 2.0
    bs = dict(b_oracle.search(terms, k=10**6, mode="or"))
    as_ = dict(a_oracle.search(terms, k=10**6, mode="or"))
    ts = dict(t_oracle.search(terms, k=10**6, mode="or"))
    want = sorted(
        (
            (d, bs.get(d, 0.0) + wa * as_.get(d, 0.0) + wt * ts.get(d, 0.0))
            for d in set(bs) | set(as_) | set(ts)
        ),
        key=lambda kv: (-kv[1], kv[0]),
    )[:10]
    got = [
        (r.doc_id, r.score)
        for r in fields.search_fields(
            spark, body_dir, [(anchor_dir, wa), (title_dir, wt)], terms,
            k=10, with_urls=False,
        ).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (gd, gs), (wd, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-9)


def test_anchor_field_refresh_after_body_append(spark, tmp_path):
    """The derived-field freshness story: append a crawl batch to the
    body, re-run build_anchor_index with the grown links table →
    fielded results equal a two-oracle recomputation over the FULL
    corpus + links (new docs rank, old docs' changed digests count)."""
    from textindex_spark.build import append_batch

    rows0 = _body_rows()[:16]
    rows1 = _body_rows()[16:]
    body_dir = str(tmp_path / "body")
    anchor_dir = str(tmp_path / "anchor")
    build_index(spark, corpus_df(spark, rows0), body_dir, range_bits=6)
    links_all = _link_rows()
    links0 = [l for l in links_all if "/p7.html" not in l[1]]
    ldf0 = spark.createDataFrame(
        links0, "src_url string, dst_url string, anchor string, nofollow boolean"
    )
    fields.build_anchor_index(spark, body_dir, anchor_dir, links=ldf0, range_bits=6)

    # crawl batch 2: docs 16.. appended; the zzmagnet links to doc 7
    # appear (an EXISTING page's digest changes)
    append_batch(spark, corpus_df(spark, rows1), body_dir)
    ldf_all = spark.createDataFrame(
        links_all, "src_url string, dst_url string, anchor string, nofollow boolean"
    )
    fields.build_anchor_index(
        spark, body_dir, anchor_dir, links=ldf_all, range_bits=6
    )

    b_oracle = OracleIndex.build(_body_rows())
    docs = spark.createDataFrame(
        [(r["doc_id"], r["url"]) for r in _body_rows()], "doc_id long, url string"
    )
    arows = [
        {"doc_id": r.doc_id, "url": r.url, "html": None, "text": r.text,
         "lang": ""}
        for r in fields.anchor_documents(docs, ldf_all).collect()
    ]
    a_oracle = OracleIndex.build(arows)
    for terms in (["zzmagnet"], ["spark", "vector"]):
        bs = dict(b_oracle.search(terms, k=10**6, mode="or"))
        as_ = dict(a_oracle.search(terms, k=10**6, mode="or"))
        want = sorted(
            ((d, bs.get(d, 0.0) + as_.get(d, 0.0)) for d in set(bs) | set(as_)),
            key=lambda kv: (-kv[1], kv[0]),
        )[:10]
        got = [
            (r.doc_id, r.score)
            for r in fields.search_fielded(
                spark, body_dir, anchor_dir, terms, k=10, with_urls=False
            ).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in want], terms
        for (gd, gs), (wd, ws) in zip(got, want):
            assert gs == pytest.approx(ws, abs=1e-9)
    # the digest change is visible: doc 7 is findable by zzmagnet now
    assert [
        r.doc_id
        for r in fields.search_fielded(
            spark, body_dir, anchor_dir, ["zzmagnet"], k=5, with_urls=False
        ).collect()
    ] == [7]


def test_fielded_respects_body_tombstones(spark, idx_dirs):
    body_dir, anchor_dir = idx_dirs
    n = delete_docs(spark, body_dir, "*p7.html")
    assert n == 1
    got = fields.search_fielded(
        spark, body_dir, anchor_dir, ["zzmagnet"], k=5
    ).collect()
    assert got == []
