#!/usr/bin/env python3
"""Port the reference's two *data* tables into Python modules.

These are pure data (HTML5 named character references; a trilingual
stop-word list), not code:

- /root/reference/src/proc3/named_char.rs  (NAMED_CHAR / NAMED_CHAR_VAL)
- /root/reference/src/proc3/stop_words.rs  (STOP_WORDS)

SURVEY.md P3/P15 call for porting them verbatim. The generated modules
carry the citation. Run from the repo root:

    python3 tools/port_tables.py
"""
from __future__ import annotations

import re
from pathlib import Path

REF = Path("/root/reference/src/proc3")
OUT = Path(__file__).resolve().parent.parent / "textindex_spark" / "refimpl"

BYTESTR = re.compile(rb'b"((?:\\.|[^"\\])*)"')
STR = re.compile(r'"((?:\\.|[^"\\])*)"')


def unescape_rust_bytes(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i]
        if c == 0x5C:  # backslash
            nxt = raw[i + 1 : i + 2]
            if nxt == b"x":
                out.append(int(raw[i + 2 : i + 4], 16))
                i += 4
            elif nxt == b"n":
                out.append(0x0A)
                i += 2
            elif nxt == b"r":
                out.append(0x0D)
                i += 2
            elif nxt == b"t":
                out.append(0x09)
                i += 2
            elif nxt == b"\\":
                out.append(0x5C)
                i += 2
            elif nxt == b'"':
                out.append(0x22)
                i += 2
            elif nxt == b"0":
                out.append(0x00)
                i += 2
            else:
                raise ValueError(f"unknown escape {raw[i:i+2]!r}")
        else:
            out.append(c)
            i += 1
    return bytes(out)


def port_named_char() -> None:
    src = (REF / "named_char.rs").read_bytes()
    src = b"\n".join(
        ln for ln in src.split(b"\n") if not ln.lstrip().startswith(b"//")
    )
    # Split at the VAL declaration so keys and values can't interleave.
    key_part, val_part = src.split(b"pub static NAMED_CHAR_VAL")
    keys = [unescape_rust_bytes(m) for m in BYTESTR.findall(key_part)]
    vals = [
        bytes(int(x) for x in m.split(b",") if x.strip())
        for m in re.findall(rb"&\[([0-9, ]*)\]", val_part)
    ]
    assert len(keys) == len(vals) == 2231, (len(keys), len(vals))
    assert keys == sorted(keys), "reference table must be bytewise sorted"
    pairs = []
    for k, v in zip(keys, vals):
        pairs.append(f"    {k!r}: {v.decode('utf-8')!r},")
    body = "\n".join(pairs)
    (OUT / "named_chars.py").write_text(
        '"""HTML5 named character reference table.\n\n'
        "Data ported verbatim from the reference\n"
        "``/root/reference/src/proc3/named_char.rs:1`` (NAMED_CHAR /\n"
        "NAMED_CHAR_VAL, 2231 entries, bytewise-sorted; binary-searched by\n"
        "``tok_named_charref`` at ``html_parse2.rs:329-360``). Keys are the\n"
        "raw ASCII entity names (some with, some without a trailing ``;``),\n"
        "values are the decoded replacement strings.\n"
        '"""\n\n'
        "NAMED_CHAR: dict[bytes, str] = {\n" + body + "\n}\n\n"
        "MAX_NAMED_CHAR_LEN = max(len(k) for k in NAMED_CHAR)\n"
    )
    print(f"named_chars.py: {len(keys)} entries")


def port_stop_words() -> None:
    src = (REF / "stop_words.rs").read_text()
    words = STR.findall(src)
    assert not any("\\" in w for w in words), "no escapes expected"
    assert len(words) == 1433, len(words)
    body = "\n".join(f"    {w!r}," for w in words)
    (OUT / "stop_words.py").write_text(
        '"""Multilingual (de/en/fr) stop-word list.\n\n'
        "Data ported verbatim from the reference\n"
        "``/root/reference/src/proc3/stop_words.rs:1-1435`` (STOP_WORDS,\n"
        "1433 entries; binary-searched post-lowercase at\n"
        "``indexer.rs:53-57``).\n"
        '"""\n\n'
        "STOP_WORDS: tuple[str, ...] = (\n" + body + "\n)\n\n"
        "STOP_WORD_SET = frozenset(STOP_WORDS)\n"
    )
    print(f"stop_words.py: {len(words)} entries")


if __name__ == "__main__":
    port_named_char()
    port_stop_words()
