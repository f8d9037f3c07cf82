"""Property-based fuzz over the reference-parity tokenizer pipeline
and the wildcard matcher (pure Python, no Spark). The ported example
cases in test_tokenizer.py pin exact reference behavior; these pin
the INVARIANTS that every downstream component (codec, positions,
phrase matching, dictionary probes) relies on, over arbitrary
unicode input including the suppressor-grammar trigger characters."""
from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from textindex_spark.refimpl.oracle import wildcard_to_regex
from textindex_spark.refimpl.stop_words import STOP_WORD_SET
from textindex_spark.refimpl.txt_tokenize import (
    TERM_MAX_BYTES,
    iter_raw_words,
    normalize_token,
    rust_lower,
    term_frequencies,
    term_positions,
    tokenize,
    truncate_term,
)

# text with the characters that drive the tokenizer's grammar edges:
# newlines (block suppressors), '<'/'>' (tags), '-'/':' (PGP / kv),
# base64-ish runs, plus arbitrary unicode
_edge = st.sampled_from(
    ["\n", "\r", "<", ">", "-", ":", " ", "`", "begin", "end",
     "BEGIN", "END", "-----BEGIN PGP", "Σ", "ß", "ﬁ", "a" * 25]
)
_texts = st.lists(
    st.one_of(st.text(max_size=12), _edge), max_size=30
).map("".join)


@settings(max_examples=300, deadline=None)
@given(_texts)
def test_tokenize_invariants(text):
    toks = tokenize(text)
    for t in toks:
        assert t, "empty token"
        assert t not in STOP_WORD_SET
        assert len(t.encode("utf-8")) <= TERM_MAX_BYTES
        # normalization is stable: a kept token re-normalizes to itself
        assert normalize_token(t) == t


@settings(max_examples=300, deadline=None)
@given(_texts)
def test_raw_words_alphabetic_and_consistent(text):
    raws = list(iter_raw_words(text))
    import re

    alpha = re.compile(r"[^\W\d_]+", re.UNICODE)
    for w in raws:
        assert alpha.fullmatch(w), w
    # tokenize == normalize over the raw word stream, order preserved
    want = [t for t in (normalize_token(w) for w in raws) if t is not None]
    assert tokenize(text) == want


@settings(max_examples=300, deadline=None)
@given(_texts)
def test_tf_and_positions_are_refinements(text):
    toks = tokenize(text)
    tf, dl = term_frequencies(text)
    assert dl == len(toks) == sum(tf.values())
    assert tf == Counter(toks)
    pos, dl2 = term_positions(text)
    assert dl2 == dl
    # positions partition 0..dl-1 and agree with the token stream
    flat = sorted(p for ps in pos.values() for p in ps)
    assert flat == list(range(dl))
    for t, ps in pos.items():
        assert ps == sorted(ps)
        assert [toks[p] for p in ps] == [t] * len(ps)


@settings(max_examples=500, deadline=None)
@given(st.text(max_size=40))
def test_truncate_term_invariants(s):
    out = truncate_term(s)
    raw = out.encode("utf-8")
    assert len(raw) <= TERM_MAX_BYTES
    assert s.startswith(out)  # prefix in characters
    assert truncate_term(out) == out  # idempotent
    if len(s.encode("utf-8")) <= TERM_MAX_BYTES:
        assert out == s


@settings(max_examples=500, deadline=None)
@given(st.text(max_size=30))
def test_rust_lower_idempotent_and_sigma_free(s):
    out = rust_lower(s)
    assert rust_lower(out) == out
    assert "Σ" not in out
    assert "ς" not in rust_lower("Σ" * 3)  # unconditional σ, never final sigma


def _wild_match(pattern: str, s: str) -> bool:
    """Reference WildMatch semantics by dynamic programming: '*' any
    run (incl. empty), '?' exactly one char — the independent oracle
    for wildcard_to_regex."""
    ok = [True] + [False] * len(s)
    for pc in pattern:
        if pc == "*":
            for i in range(1, len(s) + 1):
                ok[i] = ok[i] or ok[i - 1]
        else:
            new = [False] * (len(s) + 1)
            for i in range(len(s), 0, -1):
                new[i] = ok[i - 1] and (pc == "?" or s[i - 1] == pc)
            ok = new
    return ok[len(s)]


@settings(max_examples=500, deadline=None)
@given(
    st.text(alphabet="ab*?.[^$\\", max_size=8),
    st.text(alphabet="ab.?\n", max_size=8),
)
def test_wildcard_regex_matches_dp_oracle(pattern, s):
    got = bool(wildcard_to_regex(pattern).fullmatch(s))
    assert got == _wild_match(pattern, s), (pattern, s)
