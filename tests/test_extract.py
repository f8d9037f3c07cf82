"""HTML extraction parity tests.

Ports the reference parser test cases
(``/root/reference/src/proc3/html_parse2.rs:391-517``) into end-to-end
``extract_text`` expectations, plus the charref quirk and truncation
semantics established in SURVEY.md §2.2.
"""
from textindex_spark.refimpl.html_extract import (
    decode_lossy,
    extract_text,
    extract_text_full,
)


def test_tags_dropped():
    assert extract_text("hello <b>world</b>!") == "hello world!"
    assert extract_text('<a href="&lt&gt">x') == "x"  # html_parse2.rs:442


def test_invalid_endtag_is_text():
    # html_parse2.rs:451-453: "</ FONT>" is not an end tag
    assert extract_text("</ FONT>x") == "</ FONT>x"
    assert extract_text("</9>x") == "</9>x"


def test_doctype():
    # html_parse2.rs:457-464
    assert extract_text("<!doctype bla bla>x") == "x"
    assert extract_text("<!DOCTYPE html>x") == "x"
    assert extract_text("<!doctype unterminated") == ""


def test_comment_edge_cases():
    # html_parse2.rs:467-484 — machine reduces to consume-through-first-'>'
    assert extract_text("<!-->x") == "x"
    assert extract_text("<!--->x") == "x"
    assert extract_text("<!---->x") == "x"
    assert extract_text("<!----->x") == "x"
    assert extract_text("<!--!---->x") == "x"
    assert extract_text("<!--!>x") == "x"
    assert extract_text("a<!-- x > y -->b") == "a y -->b"
    assert extract_text("<!--unterminated") == ""


def test_cdata():
    # html_parse2.rs:402-426
    assert extract_text("<![CDATA[>x") == ""          # unterminated eats all
    assert extract_text("<![CDATA[]]>x") == ">x"      # ends at ']]'
    assert extract_text("a<![CDATA[zz]]>b") == "a>b"
    assert extract_text("a<![cdata[zz]]X") == "aX"    # case-insensitive
    assert extract_text("<![CDATA[bla]bla]]tail") == "tail"
    assert extract_text("<![CDAT x") == "<![CDAT x"   # not cdata → '<' literal


def test_bogus():
    # html_parse2.rs:429-434
    assert extract_text("<?asdfasdf>asdf") == "asdf"
    assert extract_text("<?unterminated") == ""


def test_stray_lt_amp():
    # html_parse2.rs:507-516
    s = "*---(:>     MrDouble's Palisades     <:)---*"
    assert extract_text(s) == s
    assert extract_text("<:)---*") == "<:)---*"
    assert extract_text("t&x") == "t&x"


def test_dec_hex_charrefs():
    assert extract_text("A&#66;C") == "ABC"
    assert extract_text("A&#66C") == "ABC"        # optional ';'
    assert extract_text("x&#x41;y") == "xAy"
    assert extract_text("x&#X41;y") == "xAy"
    assert extract_text("x&#xD800;y") == "x&#xD800;y"   # surrogate invalid
    assert extract_text("x&#999999999999;y") == "x&#999999999999;y"  # overflow
    assert extract_text("x&#;y") == "x&#;y"       # no digits
    assert extract_text("&#0;") == "\x00"         # NUL charref IS emitted


def test_named_charref_quirk():
    # html_parse2.rs:329-360: shortest-prefix match; rest-slice quirk
    # makes the entity name the final text run and drops the tail.
    text, truncated = extract_text_full("pre&amp;post")
    assert text == "pre&amp" and truncated
    text, truncated = extract_text_full("pre&AElig;post")
    assert text == "preÆAElig" and truncated
    # fixed mode continues after the (shortest) match
    assert extract_text("pre&amp;post", quirk_charref=False) == "pre&;post"
    # unknown entity: '&' falls through as literal text, no truncation
    text, truncated = extract_text_full("pre&nosuchentity;post")
    assert text == "pre&nosuchentity;post" and not truncated


def test_nul_truncates():
    text, truncated = extract_text_full("ab\x00cd")
    assert text == "ab" and truncated
    # "tex<tex": '<tex' is an (unterminated) start tag → consumed to EOF
    text, truncated = extract_text_full("tex<tex")
    assert text == "tex" and not truncated


def test_lossy_decode_patterns():
    # parity subset with String::from_utf8_lossy (proc3.rs:136)
    assert decode_lossy(b"ab\xffcd") == "ab�cd"
    assert decode_lossy(b"ab\x80cd") == "ab�cd"
    assert decode_lossy(b"ab\xe2\x82cd") == "ab�cd"
    assert decode_lossy(b"ab\xf0\x9f") == "ab�"
    assert decode_lossy(b"\xc3") == "�"
    assert decode_lossy("héllo".encode()) == "héllo"


def test_extraction_never_raises_property():
    import random

    rng = random.Random(7)
    alphabet = "<>&;!?#xX-[]CDATAdoctype abc\x00é\n"
    for _ in range(500):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        text, _ = extract_text_full(s)
        assert isinstance(text, str)
