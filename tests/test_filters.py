"""name_filter / content_filter parity (proc3.rs:203-336)."""
from textindex_spark.refimpl.filters import (
    HTML,
    IGNORE,
    TEXT,
    content_filter,
    name_filter_keep,
)


def test_name_filter_extensions():
    assert not name_filter_keep("https://x.example/a/pic.JPG")
    assert not name_filter_keep("https://x.example/style.css")
    assert not name_filter_keep("site/code.js")
    assert name_filter_keep("https://x.example/page.html")
    assert name_filter_keep("https://x.example/readme")
    assert name_filter_keep("https://x.example/archive.tar")  # not listed


def test_name_filter_names():
    assert not name_filter_keep("dir/History.TXT")
    assert not name_filter_keep("a/b/thumbs.db")
    assert not name_filter_keep("stored.idx")
    assert name_filter_keep("week1.html")  # commented out in the reference


def test_content_filter_html_magic():
    assert content_filter(b"<!DOCTYPE html><html>") == HTML
    assert content_filter(b"  \n\t <html><body>") == HTML  # ws skipped
    assert content_filter(b"<?xml version='1.0'?>") == HTML
    assert content_filter(b"_<!DOCTYPE") == HTML
    assert content_filter(b"<head><title>t</title>") == HTML


def test_content_filter_binary():
    assert content_filter(bytes([7, 65, 66])) == IGNORE
    assert content_filter(b"ab\x1fcd") == IGNORE
    assert content_filter(b"plain text\nwith lines\t.") == TEXT
    # \t(9) \n(10) \r(13) are allowed control bytes
    assert content_filter(b"a\tb\nc\rd") == TEXT
    # only the first 256 bytes are sniffed
    assert content_filter(b"x" * 256 + bytes([7])) == TEXT
    assert content_filter(b"") == TEXT
