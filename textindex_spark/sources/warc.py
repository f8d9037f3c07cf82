"""WARC source: Common-Crawl archives → the engine's documents shape.

The reference walks a directory tree of saved pages
(``/root/reference/src/proc3/threads.rs:203-315``); the web-scale
equivalent input is WARC (ISO 28500, the Common Crawl container
format). This reader turns WARC ``response`` records into
``(url, warc_ts, html, text, lang)`` rows:

* file list is parallelized over executors (one task per WARC file —
  at scale, list from the crawl manifest and let file-count drive
  parallelism),
* record parsing is a pure-Python STREAM per file inside
  ``mapInPandas`` (WARC is a sequential container; per-file is the
  natural parallel unit). The stream never materializes the whole
  decompressed file — a ~1 GB gzipped Common-Crawl WARC is ~5 GB
  raw, and holding raw + decompressed + row copies at once OOMs the
  Python worker (review r4); rows are emitted in bounded batches,
* HTTP headers are stripped; chunked transfer framing is removed and
  gzip content-encoding decompressed (review r4 — raw network-byte
  records otherwise put framing garbage / gzip bytes in ``html``);
  the response body becomes the ``html`` binary column; ``warc_ts``
  comes from ``WARC-Date`` (naive timestamps are UTC per the WARC
  spec — NOT executor-local time, which would make snapshot
  ordering machine-dependent).

Supports plain and (per-record or whole-file) gzip WARCs. A record
with a missing or malformed ``Content-Length`` is recovered
best-effort by resyncing to the next ``WARC/`` boundary instead of
silently dropping the rest of the file.
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

# rows buffered per emitted Arrow batch when streaming a file
WARC_BATCH_ROWS = 512


def _split_headers(block: bytes) -> tuple[dict[str, str], bytes]:
    head, _, rest = block.partition(b"\r\n\r\n")
    headers: dict[str, str] = {}
    for line in head.split(b"\r\n")[1:]:
        k, _, v = line.partition(b":")
        headers[k.decode("latin-1").strip().lower()] = v.decode("latin-1").strip()
    return headers, rest


def _dechunk(body: bytes) -> bytes:
    """Remove HTTP/1.1 chunked transfer framing; malformed framing
    returns the body unchanged (best-effort)."""
    out: list[bytes] = []
    pos = 0
    while True:
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            break
        try:
            size = int(body[pos:nl].split(b";")[0], 16)
        except ValueError:
            return body  # not actually chunked — keep as-is
        if size == 0:
            break
        chunk = body[nl + 2 : nl + 2 + size]
        out.append(chunk)
        pos = nl + 2 + size + 2
    return b"".join(out) if out else body


def _decode_http_body(http_headers: dict[str, str], body: bytes) -> bytes:
    """Undo transfer/content codings a raw-network-bytes record
    carries: de-chunk, then gunzip. Failures keep the raw bytes (the
    downstream sniffer rejects binary garbage)."""
    if "chunked" in http_headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    if http_headers.get("content-encoding", "").lower() in ("gzip", "x-gzip"):
        try:
            body = gzip.decompress(body)
        except OSError:
            pass
    return body


def _read_until(fobj, marker: bytes, buf: bytearray, chunk: int = 65536) -> int:
    """Index of ``marker`` in ``buf``, reading from ``fobj`` until
    found or EOF. Returns -1 at EOF without the marker."""
    while True:
        i = buf.find(marker)
        if i >= 0:
            return i
        data = fobj.read(chunk)
        if not data:
            return -1
        buf.extend(data)


def _iter_warc_stream(fobj) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield (warc_headers, payload) from a (possibly gzip) stream
    without materializing the file. Bad/missing Content-Length resyncs
    to the next WARC/ boundary instead of aborting the file."""
    buf = bytearray()
    while True:
        # skip inter-record CRLFs / leading junk up to the next header
        head_end = _read_until(fobj, b"\r\n\r\n", buf)
        if head_end < 0:
            return
        start = buf.find(b"WARC/")
        if start < 0 or start > head_end:
            # no header start before this blank line — drop and rescan
            del buf[: head_end + 4]
            continue
        headers, _ = _split_headers(bytes(buf[start : head_end + 4]))
        del buf[: head_end + 4]
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            length = -1
        if length >= 0:
            while len(buf) < length:
                data = fobj.read(65536)
                if not data:
                    break
                buf.extend(data)
            payload = bytes(buf[:length])
            del buf[:length]
        else:
            # malformed/missing Content-Length (spec violation):
            # best-effort payload = everything up to the next WARC/
            # boundary, so ONE bad record cannot drop the rest of the
            # file (review r4)
            nxt = _read_until(fobj, b"\r\nWARC/", buf)
            if nxt < 0:
                payload = bytes(buf)
                del buf[:]
            else:
                payload = bytes(buf[:nxt])
                del buf[: nxt + 2]
        yield headers, payload


def iter_warc_records(raw: bytes) -> Iterator[tuple[dict[str, str], bytes]]:
    """Yield (warc_headers, payload) for each record in an in-memory
    WARC (handles whole-file gzip and multi-member per-record gzip).
    Kept for small inputs/tests; ``read_warc`` streams from disk."""
    fobj: io.BufferedIOBase = io.BytesIO(raw)
    if raw[:2] == b"\x1f\x8b":
        fobj = gzip.GzipFile(fileobj=fobj)  # type: ignore[assignment]
    yield from _iter_warc_stream(fobj)


def _parse_warc_ts(ts_raw: str) -> datetime:
    try:
        ts = datetime.fromisoformat(ts_raw.replace("Z", "+00:00"))
    except ValueError:
        return datetime(1970, 1, 1)
    if ts.tzinfo is None:
        # naive WARC-Date is UTC per spec — interpreting it as
        # executor-local time would make the stored timestamp (and
        # latest-snapshot dedup ordering) machine-dependent
        ts = ts.replace(tzinfo=timezone.utc)
    return ts.astimezone(timezone.utc).replace(tzinfo=None)


def _record_row(headers: dict[str, str], payload: bytes) -> dict | None:
    if headers.get("warc-type") != "response":
        return None
    url = headers.get("warc-target-uri", "")
    ts = _parse_warc_ts(headers.get("warc-date", "1970-01-01T00:00:00Z"))
    body = payload
    if payload[:5] == b"HTTP/":
        http_headers, body = _split_headers(payload)
        body = _decode_http_body(http_headers, body)
    return {"url": url, "warc_ts": ts, "html": body, "text": "", "lang": ""}


def _iter_warc_file_rows(path: str) -> Iterator[dict]:
    with open(path, "rb") as f:
        magic = f.read(2)
        f.seek(0)
        fobj = gzip.GzipFile(fileobj=f) if magic == b"\x1f\x8b" else f
        for headers, payload in _iter_warc_stream(fobj):
            row = _record_row(headers, payload)
            if row is not None:
                yield row


def _parse_warc_file(path: str) -> list[dict]:
    """Whole-file convenience wrapper (tests / small files)."""
    return list(_iter_warc_file_rows(path))


def read_warc(spark: SparkSession, paths: list[str]) -> DataFrame:
    """→ documents DataFrame (url, warc_ts, html, text, lang); add
    doc_ids downstream via ``normalize_input`` or the caller's id
    minting. One task per WARC file; rows stream out in bounded
    batches so a multi-GB archive never lives in worker memory."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["url", "warc_ts", "html", "text", "lang"]
        for pdf in batches:
            for p in pdf["path"]:
                rows: list[dict] = []
                for row in _iter_warc_file_rows(p):
                    rows.append(row)
                    if len(rows) >= WARC_BATCH_ROWS:
                        yield pd.DataFrame(rows, columns=cols)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=cols)

    from textindex_spark.session import local_df

    files = local_df(spark, [(p,) for p in paths], "path string").repartition(
        max(1, len(paths))
    )
    return files.mapInPandas(kernel, WARC_DOC_SCHEMA)
