"""WARC source round-trip + streaming incremental indexing."""
import gzip

import pytest

from textindex_spark import manifest
from textindex_spark.corpus import synth_corpus
from textindex_spark.query import search
from textindex_spark.sources.warc import iter_warc_records, read_warc
from textindex_spark.streaming.incremental import stream_index

from tests.spark_fixtures import corpus_df, spark  # noqa: F401


def make_warc(rows, gz=False) -> bytes:
    out = bytearray()
    for r in rows:
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + r["html"]
        head = (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Target-URI: {r['url']}\r\n"
            f"WARC-Date: {r['warc_ts'].strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
            f"Content-Length: {len(http)}\r\n"
        ).encode()
        out += head + b"\r\n" + http + b"\r\n\r\n"  # header lines already end CRLF
    return gzip.compress(bytes(out)) if gz else bytes(out)


@pytest.fixture(scope="module")
def rows():
    return [r for r in synth_corpus(40) if r["url"].endswith(".html")][:12]


def test_iter_warc_records(rows):
    raw = make_warc(rows)
    got = list(iter_warc_records(raw))
    assert len(got) == len(rows)
    assert got[0][0]["warc-target-uri"] == rows[0]["url"]


def test_read_warc_roundtrip(spark, rows, tmp_path):
    p1 = tmp_path / "a.warc"
    p2 = tmp_path / "b.warc.gz"
    p1.write_bytes(make_warc(rows[:6]))
    p2.write_bytes(make_warc(rows[6:], gz=True))
    df = read_warc(spark, [str(p1), str(p2)])
    got = {r["url"]: r for r in df.collect()}
    assert len(got) == len(rows)
    for r in rows:
        assert bytes(got[r["url"]]["html"]) == r["html"]  # byte-exact payload
        assert got[r["url"]]["warc_ts"].replace(tzinfo=None) == r["warc_ts"].replace(tzinfo=None)


def test_stream_index_incremental(spark, tmp_path):
    rows = synth_corpus(150)
    src = tmp_path / "incoming"
    src.mkdir()
    idx = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    corpus_df(spark, rows[:100]).coalesce(2).write.parquet(str(src / "batch1"))
    # paths must be at one glob depth for the file stream source
    stream_index(spark, str(src / "*"), idx, ckpt, range_bits=6)
    n1 = manifest.read_table(spark, idx, "docs").count()
    assert n1 > 0
    r1 = search(spark, idx, ["spark"], k=5, with_urls=False).collect()
    assert len(r1) > 0
    # new files arrive → second availableNow pass appends only them
    corpus_df(spark, rows[100:]).coalesce(2).write.parquet(str(src / "batch2"))
    stream_index(spark, str(src / "*"), idx, ckpt, range_bits=6)
    n2 = manifest.read_table(spark, idx, "docs").count()
    assert n2 > n1
    stats = manifest.read_table(spark, idx, "stats").collect()[0]
    assert stats["n_docs"] == n2
