"""Tokenizer parity tests (txt_parse.rs / indexer.rs / index2.rs)."""
import unicodedata

from textindex_spark.refimpl.stop_words import STOP_WORD_SET
from textindex_spark.refimpl.txt_tokenize import (
    WORD_RE,
    iter_raw_words,
    normalize_token,
    rust_lower,
    term_frequencies,
    tokenize,
    truncate_term,
)


def words(s):
    return list(iter_raw_words(s))


def test_words_are_alphabetic_runs():
    # tok_word = take_while1(is_alphabetic), txt_parse.rs:157-163;
    # digits are never tokens (tests/test_index2.rs:38-47)
    assert words("09feb97:") == ["feb"]
    assert words("Hello, wörld_42!") == ["Hello", "wörld"]
    assert words("a1b2c3") == ["a", "b", "c"]


def test_tag_suppressor():
    # parse_tag: '<' + 1..=20 non-'>' + '>', txt_parse.rs:126-138.
    # The tag parser only fires when the parse position lands ON '<':
    # after a word, tok_non_word0 (txt_parse.rs:141-146,175-181)
    # swallows a following '<' as part of the trailing non-word run.
    assert words("<b> c") == ["c"]                      # doc start
    assert words("x\n<b> y") == ["x", "y"]              # after newline
    assert words("a <b> c") == ["a", "b", "c"]          # '<' eaten by nonword0
    assert words("<exactlytwenty chars!> c") == ["c"]   # 20 inside (may contain ws)
    assert words("<twentyonecharstring!!> c") == [
        "twentyonecharstring", "c",
    ]  # 21 inside → not a tag; '<' becomes a nonword run
    assert words("<> c") == ["c"]  # 0 inside → not a tag ('<>' nonword run)
    assert words("<a\nb> y") == ["y"]  # tags may span newlines
    assert words("<a><b>x") == ["x"]  # consecutive tags


def test_key_value_only_at_line_start():
    # parse_key_value after newline+ws, txt_parse.rs:74-105, 338-356
    assert words("Key: value") == ["Key", "value"]  # line 1: no newline before
    assert words("x\nKey: value\ny") == ["x", "y"]
    assert words("x\n  Key-Name*: value\ny") == ["x", "y"]  # ws skipped first
    assert words("x\n: odd empty key\ny") == ["x", "y"]  # empty key allowed
    assert words("x\nnot a kv pair\ny") == ["x", "not", "a", "kv", "pair", "y"]
    # ':' later in the line does not suppress
    assert words("x\nablauf um: zehn\ny") != ["x", "y"]


def test_pgp_suppressor():
    doc = "head\n-----BEGIN PGP SIGNATURE-----\nVersion: 1\nabcdef\n-----END PGP SIGNATURE-----\ntail"
    assert words(doc) == ["head", "tail"]
    # missing END → block not suppressed, falls through to word parsing
    doc2 = "head\n-----BEGIN PGP SIGNATURE-----\nstuff without end\nmore"
    assert "stuff" in words(doc2)


def test_base64_suppressors():
    doc = "a\nbegin 644 f.bin\nM37D*\n`\nend\nb"
    assert words(doc) == ["a", "b"]
    doc2 = "a\nBEGIN something\nQUJD\nEND trailing\nb"
    assert words(doc2) == ["a", "b"]
    # unterminated 'begin' block → not suppressed
    doc3 = "a\nbegin 644\ndata here\nnoend"
    assert "data" in words(doc3)


def test_crlf_and_cr_handling():
    # '\r' triggers the newline/block path too (one_of "\n\r")
    assert words("x\r\nKey: v\r\ny") == ["x", "y"]
    # lone '\r' with no block match is consumed as nonword run
    assert words("a\r-!b") == ["a", "b"]


def test_normalization_pipeline():
    # lowercase (indexer.rs:52), stop-words (indexer.rs:53-57)
    assert normalize_token("Zanzibar") == "zanzibar"
    assert normalize_token("The") is None  # 'the' is a stop word
    assert "durch" in STOP_WORD_SET and normalize_token("Durch") is None
    assert tokenize("The Quick brown Fox") == ["quick", "brown", "fox"]


def test_rust_lower_final_sigma():
    # Rust to_lowercase is per-char: 'Σ' → 'σ' even word-finally;
    # Python str.lower would give final 'ς'.
    assert rust_lower("ΟΔΥΣΣΕΥΣ") == "οδυσσευσ"
    assert "ΟΔΥΣΣΕΥΣ".lower() == "οδυσσευς"  # the deviation we correct


def test_truncate_term_reference_cases():
    # tests/test_index2.rs:266-285
    assert truncate_term("abcdefghijklmnopqrsü") == "abcdefghijklmnopqrs"
    assert truncate_term("ü" * 20) == "ü" * 9
    assert truncate_term("abcdefghijklmnopqrst") == "abcdefghijklmnopqrst"
    assert truncate_term("abcdefghijklmnopqrstu") == "abcdefghijklmnopqrst"
    assert truncate_term("short") == "short"
    # complete multibyte char ending exactly at byte 20 is also stripped
    # (copy_fix walks back unconditionally on a >=128 final byte)
    assert truncate_term("aaaaaaaaaaaaaaaaaaéz") == "a" * 18


def test_alphabet_deviation_pin():
    """WORD_RE vs Rust char::is_alphabetic: identical on L* and Nl;
    documented deviation on No digits and Other_Alphabetic marks."""
    agree_alpha = ["a", "ß", "é", "日", "ひ", "Ω", "ʰ", "ᛮ"]  # L* + Nl(ᛮ)
    agree_non = ["1", "_", "-", " ", "\n", "€", "!"]
    for c in agree_alpha:
        assert WORD_RE.fullmatch(c), c
    for c in agree_non:
        assert not WORD_RE.fullmatch(c), c
    # pinned deviations (category No / Other_Alphabetic)
    assert WORD_RE.fullmatch("²")  # No: we include, Rust excludes
    assert unicodedata.category("²") == "No"
    assert not WORD_RE.fullmatch("ͅ")  # Other_Alphabetic: Rust includes


def test_term_frequencies():
    tf, dl = term_frequencies("alpha beta alpha the gamma alpha")
    assert tf == {"alpha": 3, "beta": 1, "gamma": 1}
    assert dl == 5  # 'the' dropped as stop word
