"""Document type filters with reference semantics.

* ``name_filter`` — extension/name blacklist applied to the url/path
  before any content is read (``/root/reference/src/proc3.rs:203-299``).
* ``content_filter`` — sniff of the first 256 bytes: leading-whitespace
  skip, HTML magic prefixes, control-byte scan
  (``/root/reference/src/proc3.rs:301-336``).

Both run as vectorized kernels inside the Spark pipeline; the
name-filter is additionally expressed as a pure Catalyst predicate in
``textindex_spark.build`` so it pushes down to the scan.
"""
from __future__ import annotations

IGNORE = "ignore"
TEXT = "text"
HTML = "html"

# proc3.rs:215-220 (EXT_IGNORE, verbatim incl. duplicates)
EXT_IGNORE = frozenset(
    [
        "jpg", "pdf", "gif", "css", "png", "doc", "rtf", "js", "ico",
        "woff", "zip", "jpeg", "odt", "docx", "lit", "xml", "epub",
        "mobi", "exe", "mp3", "azw3", "bmp", "bak", "ccs", "dwt",
        "eot", "img", "pdb", "prc", "psc", "swf", "svg", "wmf", "wpd",
        "wav", "mso", "mid", "thmx", "zblorb", "rm", "ttf", "woff2",
        "emz", "mht",
    ]
)

# proc3.rs:221-292 (NAME_IGNORE; the commented-out entries are not live)
NAME_IGNORE = frozenset(
    [".message.ftp.txt", "history.txt", "stored.idx", "log.txt", "thumbs.db"]
)

# proc3.rs:302-312 (HTML_RECOGNIZE, verbatim)
HTML_RECOGNIZE = (
    b"<!--ADULTSONLY",
    b"<--",
    b"<head",
    b"<HTML",
    b"<html",
    b"<?xml",
    b"<!DOCTYPE",
    b"<!doctype",
    b"_<!DOCTYPE",
)

SNIFF_BYTES = 256


def name_filter_keep(url: str) -> bool:
    """True if the url/path survives the name filter (Inspect),
    False for Ignore. Mirrors ``name_filter`` (proc3.rs:203-299):
    lowercased extension (the part after the last '.' of the final
    path component, if any) and lowercased file name are checked
    against the blacklists."""
    name = url.rsplit("/", 1)[-1].lower()
    # Path::extension: suffix after the last '.', unless the name
    # starts with '.' and has no other dot (hidden file → no ext).
    stem, dot, ext = name.rpartition(".")
    if not dot or not stem:
        ext = ""
    return ext not in EXT_IGNORE and name not in NAME_IGNORE


def content_filter(head: bytes) -> str:
    """Classify by the first 256 bytes → 'html' | 'text' | 'ignore'.
    Mirrors ``content_filter`` (proc3.rs:301-336)."""
    head = head[:SNIFF_BYTES]
    start = 0
    for i, b in enumerate(head):
        if b not in (0x20, 0x09, 0x0A, 0x0D):
            start = i
            break
    part = head[start:]
    for magic in HTML_RECOGNIZE:
        if part.startswith(magic):
            return HTML
    for b in part:
        if b <= 8 or 11 <= b <= 12 or 14 <= b <= 31:
            return IGNORE
    return TEXT
