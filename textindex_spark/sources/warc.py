"""WARC source: Common-Crawl archives → the engine's documents shape.

The reference walks a directory tree of saved pages
(``/root/reference/src/proc3/threads.rs:203-315``); the web-scale
equivalent input is WARC (ISO 28500, the Common Crawl container
format). This reader turns WARC ``response`` records into
``(url, warc_ts, html, text, lang)`` rows:

* file list is parallelized over executors (one task per WARC file —
  at scale, list from the crawl manifest and let file-count drive
  parallelism),
* record parsing is a pure-Python scan per file inside
  ``mapInPandas`` (WARC is a sequential container; per-file is the
  natural parallel unit),
* HTTP headers are stripped; the response body becomes the ``html``
  binary column; ``warc_ts`` comes from ``WARC-Date``.

Supports plain and (per-record or whole-file) gzip WARCs.
"""
from __future__ import annotations

import gzip
import io
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_DOC_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def _split_headers(block: bytes) -> tuple[dict[str, str], bytes]:
    head, _, rest = block.partition(b"\r\n\r\n")
    headers: dict[str, str] = {}
    for line in head.split(b"\r\n")[1:]:
        k, _, v = line.partition(b":")
        headers[k.decode("latin-1").strip().lower()] = v.decode("latin-1").strip()
    return headers, rest


def iter_warc_records(raw: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield (warc_headers, payload) for each record in a WARC file
    (handles whole-file gzip and multi-member per-record gzip)."""
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.GzipFile(fileobj=io.BytesIO(raw)).read()
    pos = 0
    n = len(raw)
    while pos < n:
        head_end = raw.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        head = raw[pos:head_end]
        if not head.startswith(b"WARC/"):
            break
        headers: dict[str, str] = {}
        for line in head.split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.decode("latin-1").strip().lower()] = v.decode(
                "latin-1"
            ).strip()
        length = int(headers.get("content-length", "0"))
        body_start = head_end + 4
        payload = raw[body_start : body_start + length]
        yield headers, payload
        pos = body_start + length
        # records are separated by two CRLFs
        while raw[pos : pos + 2] == b"\r\n":
            pos += 2


def _parse_warc_file(path: str) -> list[dict]:
    with open(path, "rb") as f:
        raw = f.read()
    rows = []
    for headers, payload in iter_warc_records(raw):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        ts_raw = headers.get("warc-date", "1970-01-01T00:00:00Z")
        try:
            ts = datetime.fromisoformat(ts_raw.replace("Z", "+00:00")).astimezone(
                timezone.utc
            ).replace(tzinfo=None)
        except ValueError:
            ts = datetime(1970, 1, 1)
        body = payload
        if payload[:5] in (b"HTTP/",):
            _http_headers, body = _split_headers(payload)
        rows.append(
            {"url": url, "warc_ts": ts, "html": body, "text": "", "lang": ""}
        )
    return rows


def read_warc(spark: SparkSession, paths: list[str]) -> DataFrame:
    """→ documents DataFrame (url, warc_ts, html, text, lang); add
    doc_ids downstream via ``normalize_input`` or the caller's id
    minting. One task per WARC file."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for p in pdf["path"]:
                rows.extend(_parse_warc_file(p))
            out = pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )
            yield out

    from textindex_spark.session import local_df

    files = local_df(spark, [(p,) for p in paths], "path string").repartition(
        max(1, len(paths))
    )
    return files.mapInPandas(kernel, WARC_DOC_SCHEMA)
