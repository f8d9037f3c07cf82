"""Arrow-batched pandas kernels for the index pipeline.

These wrap the pure-Python reference semantics
(``textindex_spark.refimpl``) for ``mapInPandas`` execution: the hot
loop is per-document Python (the parsers are inherently stateful scans
— SURVEY.md P1/P8), but batching, transport and everything around the
kernels is Arrow-vectorized, and all relational work stays JVM-side.
No per-row Python UDFs anywhere (input_hint mandate).
"""
from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from textindex_spark.refimpl import filters
from textindex_spark.refimpl.html_extract import decode_lossy, extract_text_full
from textindex_spark.refimpl.oracle import classify_and_extract
from textindex_spark.refimpl.txt_tokenize import term_positions

# Output schema of the extract+tokenize kernel. Parallel term/tf
# arrays (not array<struct>) keep the Arrow conversion flat; the
# build plan zips+explodes them JVM-side.
SEGMENT_SCHEMA = (
    "doc_id long, url string, lang string, warc_ts timestamp, "
    "filter string, "
    "truncated boolean, doc_len long, terms array<string>, tfs array<int>, "
    "positions array<array<int>>"
)

EXTRACTED_SCHEMA = "doc_id long, url string, text string, truncated boolean"


def extract_tokenize_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, url, html, text, lang[, warc_ts])
    → SEGMENT_SCHEMA rows. Rows that the name/content filters classify
    as Ignore are dropped here (the url-extension part is *also*
    pushed down as a Catalyst predicate in the build plan — this is
    the authoritative re-check). ``warc_ts`` (crawl fetch time,
    input_hint column) passes through untouched so the docs table can
    serve ts-scoped retrieval; absent → NaT (null timestamp)."""
    for pdf in batches:
        out: dict[str, list] = {
            "doc_id": [],
            "url": [],
            "lang": [],
            "warc_ts": [],
            "filter": [],
            "truncated": [],
            "doc_len": [],
            "terms": [],
            "tfs": [],
            "positions": [],
        }
        tss = pdf["warc_ts"] if "warc_ts" in pdf else None
        htmls = pdf["html"].values
        texts = pdf["text"].values if "text" in pdf else [""] * len(pdf)
        for i in range(len(pdf)):
            url = pdf["url"].iat[i]
            kind, text, truncated = classify_and_extract(
                url, htmls[i] or b"", texts[i] or ""
            )
            if kind == filters.IGNORE:
                continue
            pos, dl = term_positions(text)
            out["doc_id"].append(pdf["doc_id"].iat[i])
            out["url"].append(url)
            out["lang"].append(pdf["lang"].iat[i] if "lang" in pdf else "")
            out["warc_ts"].append(tss.iat[i] if tss is not None else pd.NaT)
            out["filter"].append(kind)
            out["truncated"].append(truncated)
            out["doc_len"].append(dl)
            out["terms"].append(np.array(list(pos.keys()), dtype=object))
            out["tfs"].append(
                np.array([len(p) for p in pos.values()], dtype=np.int32)
            )
            out["positions"].append(
                [np.array(p, dtype=np.int32) for p in pos.values()]
            )
        if not out["doc_id"]:
            # a batch whose every row the filters classified Ignore:
            # an all-empty DataFrame infers float64 columns, which
            # Arrow rejects against the list<...> fields (latent crash
            # on e.g. an all-binary crawl segment) — yield nothing
            continue
        pdf_out = pd.DataFrame(out)
        # object/NaT values must not leave the timestamp column as
        # object dtype — Arrow needs datetime64[ns]
        pdf_out["warc_ts"] = pd.to_datetime(pdf_out["warc_ts"])
        yield pdf_out


def extract_text_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel for the extraction stage alone (byte-identity
    tests): (doc_id, url, html) → (doc_id, url, text, truncated)."""
    for pdf in batches:
        texts, truncs = [], []
        for raw in pdf["html"].values:
            text, truncated = extract_text_full(decode_lossy(raw or b""))
            texts.append(text)
            truncs.append(truncated)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "url": pdf["url"],
                "text": texts,
                "truncated": truncs,
            }
        )
