"""HTML → text extraction with reference semantics.

Pure-Python port of the reference's pull parser driven by
``index_html2`` (``/root/reference/src/proc3/indexer.rs:97-173``): the
parser alternation ``parse_html`` (``html_parse2.rs:69-86``) yields
parts; Text runs and decoded character references are appended to the
output buffer; tags / comments / doctype / CDATA / bogus sections are
dropped; a parse error (e.g. a ``\\0`` byte that no alternative
accepts) truncates extraction at that point (``indexer.rs:145-157``).

This module is BOTH the test oracle and the kernel executed inside the
Spark pandas UDF — byte-identical extracted text per url is the
invariant (BASELINE.json ``input_hint``).

Semantics notes (each verified against the reference source):

* Text runs: ``take_while1(c != '<' && c != '&' && c != '\\0')``
  (``html_parse2.rs:258-266``).
* Comments ``<!--``: the reference's nested state machine
  (``html_parse2.rs:192-255``) terminates on the *first* ``>`` seen at
  any nesting level (every arm either consumes-and-breaks on ``>`` or
  falls back to the outer loop), or at EOF — so it is exactly
  "consume through the first ``>``".
* ``<![CDATA[`` (case-insensitive): consume through the first ``]]``
  or EOF (``html_parse2.rs:95-132``).
* ``<?`` bogus, ``<!doctype`` (case-insensitive), ``</x`` end tags and
  ``<x`` start tags (x ASCII alphabetic): consume through the first
  ``>`` or EOF (``html_parse2.rs:134-179, 362-389``).
* Any other ``<`` or a ``&`` that is not a valid charref is kept as
  literal text (``parse_lt_amp``, ``html_parse2.rs:88-93``).
* Decimal/hex charrefs ``&#123`` ``&#x1F`` ``&#X1F`` with optional
  ``;``; an invalid codepoint (surrogate/out-of-range/overflow) fails
  the charref and the ``&`` falls through as text
  (``html_parse2.rs:298-326``).
* Named charrefs (``html_parse2.rs:329-360``): the reference
  accumulates bytes (chars with codepoint > 256 break the scan; a char
  is stored as its low byte) and checks the table after EVERY byte —
  i.e. SHORTEST-prefix match, so ``&amp;`` matches table key ``amp``
  before ``amp;``. On a match the reference returns
  ``input.slice(0..ins+1)`` as the *remaining input* — the consumed
  prefix — instead of ``input.slice(ins+1..)``. The net observable
  behavior: the replacement string is emitted, the matched entity name
  is then re-parsed as a text run, and the rest of the document is
  dropped (extraction ends). ``quirk_charref=True`` (default)
  reproduces this faithfully; ``False`` gives the evidently intended
  continue-after-entity behavior. The quirk is reference behavior, not
  ours — documented here so the deviation switch is explicit.
"""
from __future__ import annotations

import re

from textindex_spark.refimpl.named_chars import NAMED_CHAR

# take_while1(c != '<' && c != '&' && c != '\0')  html_parse2.rs:258-266
_TEXT_RUN = re.compile(r"[^<&\x00]+")
_DEC_RUN = re.compile(r"[0-9]+")
_HEX_RUN = re.compile(r"[0-9a-fA-F]+")
_ASCII_ALPHA = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
_ASCII_ALNUM = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789")


def decode_lossy(raw: bytes) -> str:
    """UTF-8 lossy decode, parity with ``String::from_utf8_lossy``
    (``/root/reference/src/proc3.rs:136``). CPython's ``errors='replace'``
    implements the same WHATWG maximal-subpart substitution."""
    return raw.decode("utf-8", errors="replace")


def _char_from_u32(cp: int) -> str | None:
    """``char::from_u32`` parity: None for surrogates / > 0x10FFFF."""
    if cp > 0x10FFFF or 0xD800 <= cp <= 0xDFFF:
        return None
    return chr(cp)


def _consume_unto(s: str, pos: int, ch: str) -> int:
    """``unto(c)``: consume up to and including ``ch``; whole input if
    absent (``html_parse2.rs:362-389``)."""
    j = s.find(ch, pos)
    return len(s) if j < 0 else j + 1


def _named_charref(s: str, j: int) -> tuple[str, int] | None:
    """``tok_named_charref`` (``html_parse2.rs:329-360``).

    Returns ``(replacement, consumed_len)`` on a (shortest-prefix)
    match, else None. Caller handles the rest-slice quirk.
    """
    name = bytearray()
    n = len(s)
    for ins in range(32):
        if j + ins >= n:
            return None
        c = s[j + ins]
        cp = ord(c)
        if cp > 256:
            return None
        name.append(cp & 0xFF)
        val = NAMED_CHAR.get(bytes(name))
        if val is not None:
            return val, ins + 1
        if c == ";":
            return None
    return None


def extract_text(html: str, quirk_charref: bool = True) -> str:
    """Extract visible text from HTML, reference semantics."""
    text, _ = extract_text_full(html, quirk_charref=quirk_charref)
    return text


def extract_text_full(html: str, quirk_charref: bool = True) -> tuple[str, bool]:
    """Returns ``(text, truncated)`` where ``truncated`` marks a parse
    error (or the named-charref quirk) that ended extraction early —
    surfaced into the metrics table like the reference's error log
    (``indexer.rs:145-157``)."""
    s = html
    n = len(s)
    out: list[str] = []
    i = 0
    while i < n:
        c = s[i]
        if c != "<" and c != "&" and c != "\x00":
            m = _TEXT_RUN.match(s, i)
            out.append(m.group())
            i = m.end()
        elif c == "&":
            j = i + 1
            nxt = s[j] if j < n else ""
            if nxt in _ASCII_ALNUM:
                hit = _named_charref(s, j)
                if hit is not None:
                    val, consumed = hit
                    out.append(val)
                    if quirk_charref:
                        # Reference returns the consumed prefix as the
                        # remaining input (html_parse2.rs:342-345): the
                        # entity name becomes the final text run and
                        # everything after it is dropped.
                        out.append(s[j : j + consumed])
                        return "".join(out), True
                    i = j + consumed
                else:
                    out.append("&")
                    i = j
            elif nxt == "#":
                k = j + 1
                if k < n and (s[k] == "x" or s[k] == "X"):
                    m = _HEX_RUN.match(s, k + 1)
                    base = 16
                else:
                    m = _DEC_RUN.match(s, k)
                    base = 10
                ch = None
                end = i
                if m:
                    cp_txt = m.group()
                    try:
                        cp = int(cp_txt, base)
                    except ValueError:  # pragma: no cover
                        cp = 1 << 32
                    # u32::from_str_radix overflow also fails the parse
                    ch = _char_from_u32(cp) if cp < 1 << 32 else None
                    end = m.end()
                if ch is not None:
                    out.append(ch)
                    if end < n and s[end] == ";":
                        end += 1
                    i = end
                else:
                    out.append("&")
                    i = j
            else:
                out.append("&")
                i = j
        elif c == "<":
            j = i + 1
            nxt = s[j] if j < n else ""
            if nxt == "!":
                if s.startswith("<!--", i):
                    i = _consume_unto(s, i + 4, ">")
                elif s[i + 2 : i + 9].lower() == "[cdata[":
                    e = s.find("]]", i + 9)
                    i = len(s) if e < 0 else e + 2
                elif s[i : i + 9].lower() == "<!doctype":
                    i = _consume_unto(s, i + 9, ">")
                else:
                    out.append("<")
                    i = j
            elif nxt == "?":
                i = _consume_unto(s, i + 2, ">")
            elif nxt == "/":
                if i + 2 < n and s[i + 2] in _ASCII_ALPHA:
                    i = _consume_unto(s, i + 3, ">")
                else:
                    out.append("<")
                    i = j
            elif nxt in _ASCII_ALPHA:
                i = _consume_unto(s, i + 2, ">")
            else:
                out.append("<")
                i = j
        else:
            # '\0': no parse_html alternative accepts it → parse error
            # → truncate (indexer.rs:145-157).
            return "".join(out), True
    return "".join(out), False
