"""Plain-text tokenization with reference semantics.

Pure-Python port of ``parse_txt`` (``/root/reference/src/proc3/
txt_parse.rs:74-105``) as driven by ``index_txt2``
(``indexer.rs:25-95``): yields the raw word spans (maximal alphabetic
runs); everything else — punctuation, digits, short ``<tag>`` runs,
and the line-start PGP / uuencode-base64 / ``Key: value`` suppressor
blocks — is dropped. This module is both the oracle and the kernel
inside the Spark pandas UDFs.

Grammar recap (all citations into ``txt_parse.rs``):

* When the current char is a newline (``\\n`` or ``\\r``, ``:386-388``)
  the parser consumes it plus any whitespace run and tries the block
  suppressors ``parse_pgp`` (``:184-227``), ``parse_base64``
  (``:275-298``, lowercase ``begin``/`` ` ``/``end``),
  ``parse_base64_v2`` (``:230-252``, ``BEGIN``/``END``) and
  ``parse_key_value`` (``:338-356``) in that order; on failure it
  falls back to the generic alternation at the ORIGINAL position
  (``:80-104``).
* Generic alternation: ``parse_tag`` (``<`` + 1..=20 non-``>`` chars +
  ``>``, may span newlines, ``:126-138``), ``parse_word``
  (``take_while1(is_alphabetic)`` + trailing non-word run, ``:141-146,
  157-163, 175-181``), ``parse_nonword`` (``take_while1(!alpha &&
  != '\\n')``, ``:149-154``) — note ``\\r`` is a nonword char, only
  ``\\n`` is excluded — then single newline, then EOF.

Alphabet deviation (documented): Rust ``char::is_alphabetic`` is the
Unicode ``Alphabetic`` property (L* + Nl + Other_Alphabetic). We use
the regex class ``[^\\W\\d_]`` (= L* + Nl + numeric-No). The two agree
on all L* and Nl codepoints — i.e. on everything the fixtures and any
realistic web text contain — and differ only on category-No digits
(``²`` ``¼`` — included here, excluded by Rust) and Other_Alphabetic
combining marks (excluded here, included by Rust).
``tests/test_tokenizer.py`` pins this with an explicit codepoint table.

Normalization pipeline (``normalize_token``): Unicode lowercase
(``indexer.rs:52``; Rust ``to_lowercase`` is per-char — no Greek
final-sigma contextual form, handled in ``rust_lower``), stop-word
filter (``indexer.rs:53-57``), then the at-rest 20-byte UTF-8-safe
truncation ``copy_fix`` (``index2.rs:598-619``) applied as an explicit
vocabulary normalization (SURVEY.md P17 decision).
"""
from __future__ import annotations

import re
from collections import Counter
from collections.abc import Iterator

from textindex_spark.refimpl.stop_words import STOP_WORD_SET

# Alphabetic-run word token, txt_parse.rs:157-163 (see module note).
WORD_RE = re.compile(r"[^\W\d_]+")
# Trailing non-word run after a word (take_while, :175-181).
_STOP_RE = re.compile(r"[^\W\d_]|\n")
# <tag> of 1..=20 non-'>' chars (NOT newline-excluded), :126-138.
_TAG_RE = re.compile(r"<[^>]{1,20}>", re.DOTALL)
# Unicode White_Space (Rust char::is_whitespace), :391-394.
_WS_RE = re.compile(
    "[\t\n\x0b\x0c\r \x85\xa0\u1680\u2000-\u200a\u2028\u2029\u202f\u205f\u3000]*"
)
# take_while(!= '\n') — rest of line, :368-374.
# tok_key: ascii alnum / '-' / '*', may be empty, :350-356.
_KEY_RE = re.compile(r"[A-Za-z0-9\-*]*")

PGP_HEADER = "-----BEGIN PGP SIGNATURE-----"
PGP_END_TAG = "END PGP SIGNATURE-----"

TERM_MAX_BYTES = 20


def _line_end(s: str, pos: int) -> int:
    j = s.find("\n", pos)
    return len(s) if j < 0 else j


def _parse_pgp(s: str, p: int) -> int | None:
    """parse_pgp, txt_parse.rs:184-227. Returns end position or None."""
    if not s.startswith(PGP_HEADER, p):
        return None
    p = _line_end(s, p + len(PGP_HEADER))
    if p >= len(s):
        return None  # `newline` after the header line is required
    p += 1
    # tok_pgp_text: find the first run of five '-' (scan proven
    # equivalent to str.find since only non-'-' chars are skipped).
    q = s.find("-----", p)
    if q < 0:
        return None
    p = q + 5
    if not s.startswith(PGP_END_TAG, p):
        return None
    return _line_end(s, p + len(PGP_END_TAG))


def _parse_base64(s: str, p: int) -> int | None:
    """parse_base64 (lowercase uuencode form), txt_parse.rs:275-335."""
    if not s.startswith("begin", p):
        return None
    p = _line_end(s, p + 5)
    while True:
        if p >= len(s):
            return None
        p += 1  # newline (take_while stopped exactly at '\n')
        # tok_base64_stop: '`' with the next char being '\n'.
        if s.startswith("`\n", p):
            p += 1  # tok_at_new_line consumes nothing
            break
        # tok_base64_line: whitespace run (may swallow blank lines),
        # then at least one non-'\n' char.
        m = _WS_RE.match(s, p)
        q = m.end()
        e = _line_end(s, q)
        if e == q:
            return None  # empty line at EOF → take_while1 fails
        if s[q:e] == "`" and m.group() == "":
            # line branch matched a bare '`' at EOF (no trailing \n)
            p = e
            break
        p = e
    # tok_base64_end: whitespace (incl. newlines) + 'end' + rest-of-line
    m = _WS_RE.match(s, p)
    q = m.end()
    if not s.startswith("end", q):
        return None
    return _line_end(s, q + 3)


def _parse_base64_v2(s: str, p: int) -> int | None:
    """parse_base64_v2 (BEGIN/END form), txt_parse.rs:230-272."""
    if not s.startswith("BEGIN", p):
        return None
    p = _line_end(s, p + 5)
    while True:
        if p >= len(s):
            return None
        p += 1  # newline
        if s.startswith("END", p):
            return _line_end(s, p + 3)
        m = _WS_RE.match(s, p)
        q = m.end()
        e = _line_end(s, q)
        if e == q:
            return None
        p = e


def _parse_key_value(s: str, p: int) -> int | None:
    """parse_key_value, txt_parse.rs:338-356 (key may be empty)."""
    m = _KEY_RE.match(s, p)
    q = m.end()
    if q < len(s) and s[q] == ":":
        return _line_end(s, q + 1)
    return None


def iter_raw_words(text: str) -> Iterator[str]:
    """Yield raw word spans per the parse_txt loop (pre-lowercase,
    pre-stop-word)."""
    s = text
    n = len(s)
    i = 0
    while i < n:
        c = s[i]
        if c == "\n" or c == "\r":
            # newline → whitespace → block suppressors (txt_parse.rs:80-92)
            p = _WS_RE.match(s, i + 1).end()
            for parse in (_parse_pgp, _parse_base64, _parse_base64_v2, _parse_key_value):
                e = parse(s, p)
                if e is not None:
                    i = e
                    break
            else:
                # fall through to the generic alternation at i
                if c == "\n":
                    i += 1  # parse_newline ('\r' is handled as nonword)
                else:
                    m = _STOP_RE.search(s, i)
                    i = m.start() if m else n
            continue
        if c == "<":
            m = _TAG_RE.match(s, i)
            if m:
                i = m.end()
                continue
        m = WORD_RE.match(s, i)
        if m:
            yield m.group()
            i = m.end()
            # tok_non_word0: trailing non-word run (stops at word or \n)
            stop = _STOP_RE.search(s, i)
            i = stop.start() if stop else n
            continue
        # parse_nonword: take_while1(!alpha && != '\n')
        stop = _STOP_RE.search(s, i + 1)
        i = stop.start() if stop else n
    return


def rust_lower(word: str) -> str:
    """``str::to_lowercase`` parity (``indexer.rs:52``): Python's
    ``str.lower`` is identical except for the contextual Greek final
    sigma — Rust lowercases ``Σ`` to ``σ`` unconditionally."""
    if "Σ" in word:
        return "".join(c.lower() for c in word)
    return word.lower()


def truncate_term(term: str) -> str:
    """``copy_fix::<20>`` (``index2.rs:598-619``): keep the first 20
    UTF-8 bytes, then strip trailing continuation bytes and one lead
    byte — note a COMPLETE trailing multi-byte char whose last byte
    lands exactly at the boundary is also stripped (the reference
    walks back unconditionally when the final byte is >= 128)."""
    raw = term.encode("utf-8")
    if len(raw) <= TERM_MAX_BYTES:
        return term
    dst = bytearray(raw[:TERM_MAX_BYTES])
    for i in range(TERM_MAX_BYTES - 1, -1, -1):
        b = dst[i]
        if b >= 192:
            del dst[i:]
            break
        elif b >= 128:
            del dst[i:]
        else:
            break
    return dst.decode("utf-8")


def normalize_token(raw_word: str) -> str | None:
    """lowercase → stop-word filter → 20-byte truncation.
    Returns None for stop words."""
    word = rust_lower(raw_word)
    if word in STOP_WORD_SET:
        return None
    return truncate_term(word)


def tokenize(text: str) -> list[str]:
    """Indexable terms of a text document, in order."""
    out = []
    for raw in iter_raw_words(text):
        t = normalize_token(raw)
        if t is not None:
            out.append(t)
    return out


def term_frequencies(text: str) -> tuple[Counter[str], int]:
    """Per-doc tf map + doc length (= count of indexed tokens,
    the analog of ``TmpWords`` at ``tmp_index.rs:5-28``)."""
    tf: Counter[str] = Counter()
    for raw in iter_raw_words(text):
        t = normalize_token(raw)
        if t is not None:
            tf[t] += 1
    return tf, sum(tf.values())


def term_positions(text: str) -> tuple[dict[str, list[int]], int]:
    """Per-doc term → sorted token positions (+ doc length). Position
    = 0-based ordinal in the KEPT token sequence (after suppressors,
    stop-word removal and truncation) — phrase adjacency is therefore
    defined over indexed tokens, the standard semantics for a
    stop-word-removing engine. tf(term) == len(positions[term]) and
    doc_len == total kept tokens, so this is a strict refinement of
    ``term_frequencies`` (beyond the reference: it stores no
    positions and has no phrase operator)."""
    pos: dict[str, list[int]] = {}
    i = 0
    for raw in iter_raw_words(text):
        t = normalize_token(raw)
        if t is not None:
            pos.setdefault(t, []).append(i)
            i += 1
    return pos, i
