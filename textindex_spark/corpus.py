"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).

Generates rows of exactly the BASELINE.json input_hint shape::

    (url: string, warc_ts: timestamp, html: binary, text: string,
     lang: string)

seeded and reproducible — no external data. The branch mix exercises
every parser path of the reference semantics (entities, comments,
CDATA, bogus sections, stray ``<``/``&``, PGP/base64/key-value text
blocks, >20-byte terms, invalid UTF-8, control-byte binaries,
blacklisted extensions) plus a Zipf vocabulary with deliberately hot
terms for shuffle-skew coverage.
"""
from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

from textindex_spark.refimpl.stop_words import STOP_WORDS

EPOCH = datetime(2025, 1, 1, tzinfo=timezone.utc)

_SYLLABLES = [
    "ka", "ro", "mi", "ten", "zur", "bel", "fon", "gri", "hax", "lum",
    "pra", "que", "sor", "tul", "vex", "wim", "yor", "zel", "dra", "eph",
]
_ACCENT_WORDS = ["café", "über", "straße", "héros", "naïve", "jalapeño", "grüße"]
_LONG_WORDS = [
    "donaudampfschifffahrtsgesellschaft",      # > 20 ascii bytes
    "anticonstitutionnellement",
    "übermäßigkeitserklärung",                 # multibyte across the 20-byte cut
]
# Deliberately hot terms (~few % of tokens each) — skew coverage.
HOT_TERMS = ["spark", "index", "query", "woven", "archive"]

# Site-correlated vocabulary (r4): every fetched page of site s
# carries a site-topic token that occurs on NO other site. Because
# doc_ids are minted in url order (same-site pages get adjacent ids),
# each site's topic postings concentrate in a few doc-id ranges — the
# clustered-rare-term shape real crawls have. This (a) makes the
# url-sort doc-id-clustering effect measurable (postings bytes vs a
# random id assignment) and (b) gives block-max pruning ranges it can
# actually skip — on the previous all-hot uniform vocabulary no
# query's theta ever beat any range's upper bound.
N_SITES = 97


def site_topic_word(site: int) -> str:
    """Alphabetic-only site topic token (digits never survive the
    reference word tokenizer): 'topiq' + two base-20 syllables."""
    return "topiq" + _SYLLABLES[(site // 20) % 20] + _SYLLABLES[site % 20]

_ENTITY_SNIPPETS = [
    " Tom &#38; Jerry ",          # dec charref
    " caf&#xE9; au lait ",        # hex charref
    " x &#X3C; y ",               # hex uppercase marker
    " a &unknownent; b ",         # failed named ref → literal
    " lone & ampersand ",         # stray &
    " 3 < 4 proof ",              # stray < followed by space (literal)
]

_LANGS = ["de", "en", "fr"]


def make_vocab(seed: int = 42, size: int = 800) -> list[str]:
    rng = random.Random(seed * 7 + 1)
    vocab: list[str] = []
    seen = set()
    while len(vocab) < size:
        w = "".join(rng.choice(_SYLLABLES) for _ in range(rng.randint(2, 4)))
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return vocab


def _zipf_word(rng: random.Random, vocab: list[str]) -> str:
    # Zipf-ish: rank ∝ 1/r via inverse-power transform
    r = int(len(vocab) * (rng.random() ** 3))
    return vocab[min(r, len(vocab) - 1)]


def _sentence(rng: random.Random, vocab: list[str], lang: str, n: int) -> str:
    words = []
    stop_pool = STOP_WORDS
    for _ in range(n):
        roll = rng.random()
        if roll < 0.12:
            words.append(rng.choice(HOT_TERMS))
        elif roll < 0.32:
            words.append(rng.choice(stop_pool))
        elif roll < 0.34:
            words.append(rng.choice(_ACCENT_WORDS))
        elif roll < 0.35:
            words.append(rng.choice(_LONG_WORDS))
        elif roll < 0.40:
            words.append(str(rng.randint(0, 99999)))  # digits: never tokens
        else:
            w = _zipf_word(rng, vocab)
            if rng.random() < 0.3:
                w = w.capitalize()
            words.append(w)
    return " ".join(words)


def _html_doc(rng: random.Random, vocab: list[str], lang: str, i: int, scale: int = 1) -> str:
    parts = ["<!DOCTYPE html>", "<html>", "<head>"]
    parts.append(f"<title>{_sentence(rng, vocab, lang, 4)}</title>")
    parts.append("<!-- a comment, dropped -->")
    parts.append("</head><body>")
    n_paras = rng.randint(2, 6) * scale
    for p in range(n_paras):
        parts.append(f'<p class="c{p}">')
        parts.append(_sentence(rng, vocab, lang, rng.randint(10, 40)))
        if rng.random() < 0.5:
            parts.append(rng.choice(_ENTITY_SNIPPETS))
        if rng.random() < 0.2:
            parts.append("<![CDATA[ hidden cdata words ]]>")
        if rng.random() < 0.2:
            parts.append("<?php bogus_section(); ?>")
        parts.append("</p>")
    w = site_topic_word(i % N_SITES)
    parts.append(f"<p>{w} {w} {w}</p>")  # before the truncation quirk
    if rng.random() < 0.05:
        # named charref → reference quirk truncates extraction here
        parts.append("fin &amp; truncated tail never indexed")
    parts.append("</body></html>")
    return "\n".join(parts)


def _text_doc(rng: random.Random, vocab: list[str], lang: str, i: int) -> str:
    lines = [_sentence(rng, vocab, lang, rng.randint(6, 20)) for _ in range(rng.randint(3, 10))]
    if rng.random() < 0.25:
        lines.append("Subject: a suppressed header line")
        lines.append("X-Mailer-*: another suppressed one")
    if rng.random() < 0.15:
        lines += [
            "-----BEGIN PGP SIGNATURE-----",
            "Version: ref 1.0",
            "aGlkZGVuIHBncCBib2R5",
            "-----END PGP SIGNATURE-----",
            _sentence(rng, vocab, lang, 6),
        ]
    if rng.random() < 0.1:
        lines += ["begin 644 blob.bin", "M37DGZ2L*", "`", "end", _sentence(rng, vocab, lang, 5)]
    if rng.random() < 0.1:
        lines += ["BEGIN uuencoded", "QUJDCg==", "END", _sentence(rng, vocab, lang, 5)]
    if rng.random() < 0.2:
        lines.append(f"short <tag{i % 7}> inside text")
    w = site_topic_word(i % N_SITES)
    lines.append(f"{w} {w} {w}")
    return "\n".join(lines)


def make_row(i: int, vocab: list[str], seed: int = 42, scale: int = 1) -> dict:
    """One deterministic corpus row; the per-doc rng stream depends
    only on (seed, i), so generation is order-free and distributable."""
    rng = random.Random((seed << 20) + i)
    lang = _LANGS[i % 3]
    roll = rng.random()
    url = f"https://site{i % N_SITES}.example/{lang}/page{i}.html"
    text_col = ""
    if roll < 0.70:
        body = _html_doc(rng, vocab, lang, i, scale)
        raw = body.encode("utf-8")
        if rng.random() < 0.05:
            # invalid UTF-8 injection (lossy-decode parity subset)
            cut = rng.randint(len(raw) // 2, len(raw) - 1)
            raw = raw[:cut] + rng.choice([b"\xff", b"\x80", b"\xe2\x82"]) + raw[cut:]
    elif roll < 0.90:
        body = _text_doc(rng, vocab, lang, i)
        raw = body.encode("utf-8")
        text_col = body
        url = url[: -len(".html")] + ".txt"
    elif roll < 0.95:
        # binary-looking: control bytes in the first 256 bytes → Ignore
        raw = bytes([7, 1, 2]) + bytes(rng.randrange(256) for _ in range(200))
        url = url[: -len(".html")] + ".dat"
    else:
        # blacklisted extension → name filter drops before sniffing
        raw = b"GIF89a fake image bytes"
        url = url[: -len(".html")] + rng.choice([".jpg", ".css", ".zip", ".mp3"])
    return {
        "doc_id": i,
        "url": url,
        "warc_ts": EPOCH + timedelta(seconds=13 * i),
        "html": raw,
        "text": text_col,
        "lang": lang,
    }


def synth_corpus(n_docs: int, seed: int = 42, scale: int = 1) -> list[dict]:
    """Deterministic corpus rows. ``html`` is the raw page bytes for
    every fetched row; ``text`` is set only for text/plain rows
    (FIXTURES.md §1)."""
    vocab = make_vocab(seed)
    return [make_row(i, vocab, seed, scale) for i in range(n_docs)]


def synth_corpus_spark(spark, n_docs: int, seed: int = 42, scale: int = 1):
    """Generate the same corpus distributed (one kernel call per id
    range) — used for benchmark corpora too big to build on the
    driver. Row i is identical to ``synth_corpus``'s row i."""
    import pandas as pd

    def gen(batches):
        vocab = make_vocab(seed)
        for pdf in batches:
            rows = [make_row(int(i), vocab, seed, scale) for i in pdf["id"]]
            out = pd.DataFrame(rows)
            out["warc_ts"] = out["warc_ts"].dt.tz_localize(None)
            yield out

    n_parts = spark.sparkContext.defaultParallelism * 2
    return (
        spark.range(n_docs).repartition(n_parts)
        .mapInPandas(
            gen,
            "doc_id long, url string, warc_ts timestamp, html binary, "
            "text string, lang string",
        )
    )


# Fixed query set over the synthetic vocabulary (FIXTURES.md §2):
# exact terms, wildcards, hot terms, rare terms, absent terms.
def query_set(seed: int = 42) -> list[dict]:
    vocab = make_vocab(seed)
    rng = random.Random(seed + 99)
    qs = [
        {"query_id": 0, "terms": ["spark"], "k": 10},
        {"query_id": 1, "terms": ["spark", "index"], "k": 10},
        {"query_id": 2, "terms": ["karo*"], "k": 10},
        {"query_id": 3, "terms": ["?iro"], "k": 10},
        {"query_id": 4, "terms": ["café"], "k": 10},
        {"query_id": 5, "terms": ["woven", "archive", "query"], "k": 10},
        {"query_id": 6, "terms": ["absentterm"], "k": 10},
        {"query_id": 7, "terms": ["zel*", "spark"], "k": 100},
        {"query_id": 8, "terms": [vocab[5]], "k": 1},
        {"query_id": 9, "terms": [vocab[50], vocab[51]], "k": 10},
        {"query_id": 10, "terms": ["donaudampfschifffahrt*"], "k": 10},
        {"query_id": 11, "terms": ["*ie*"], "k": 10},
    ]
    for qid in range(12, 20):
        n = rng.randint(1, 3)
        qs.append(
            {
                "query_id": qid,
                "terms": [vocab[rng.randrange(len(vocab))] for _ in range(n)],
                "k": 10,
            }
        )
    return qs
