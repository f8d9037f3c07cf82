"""Posting codec round-trip tests (analog of the reference's storage
round-trips, tests/test_index2.rs:50-263)."""
import numpy as np

from textindex_spark.codec import (
    decode_batch,
    decode_posting_block,
    encode_batch,
    encode_posting_block,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_edges():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**32, 2**62], dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(vals)), vals.astype(np.int64))
    assert varint_encode(np.array([], dtype=np.uint64)) == b""
    assert len(varint_decode(b"")) == 0
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"


def test_varint_roundtrip_random():
    rng = np.random.default_rng(42)
    for scale in (100, 10**6, 10**12):
        vals = rng.integers(0, scale, size=1000).astype(np.uint64)
        assert np.array_equal(varint_decode(varint_encode(vals)), vals.astype(np.int64))


def test_block_roundtrip():
    doc_ids = np.array([8192, 8200, 9000, 16383], dtype=np.int64)
    tfs = np.array([1, 5, 2, 130], dtype=np.int64)
    dls = np.array([50, 700, 12, 99], dtype=np.int64)
    gaps_b, tfs_b, dls_b = encode_posting_block(doc_ids, 8192, tfs, dls)
    d2, t2, l2 = decode_posting_block(gaps_b, 8192, tfs_b, dls_b)
    assert np.array_equal(d2, doc_ids)
    assert np.array_equal(t2, tfs)
    assert np.array_equal(l2, dls)


def test_batch_roundtrip_matches_single():
    rng = np.random.default_rng(7)
    blocks, tf_blocks, bases = [], [], []
    for i in range(50):
        n = rng.integers(1, 200)
        base = int(i) * 8192
        docs = np.sort(rng.choice(8192, size=n, replace=False)) + base
        blocks.append(docs.astype(np.int64))
        tf_blocks.append(rng.integers(1, 50, size=n).astype(np.int64))
        bases.append(base)
    bases = np.array(bases, dtype=np.int64)
    enc = encode_batch(blocks, bases, [tf_blocks])
    # batch encode ≡ per-block encode
    for i, (g, t) in enumerate(enc):
        g1, t1 = encode_posting_block(blocks[i], bases[i], tf_blocks[i])
        assert g == g1 and t == t1
    dec_docs, dec_tfs = decode_batch([e[0] for e in enc], bases, [[e[1] for e in enc]])
    for i in range(50):
        assert np.array_equal(dec_docs[i], blocks[i])
        assert np.array_equal(dec_tfs[i], tf_blocks[i])


def test_batch_empty():
    assert encode_batch([], np.array([]), [[]]) == []
    d, t = decode_batch([], np.array([]), [[]])
    assert d == [] and t == []


def test_zero_length_blocks_rejected():
    import numpy as np
    import pytest

    from textindex_spark.codec import decode_batch, encode_batch

    with pytest.raises(ValueError, match="zero-length"):
        encode_batch([np.array([1, 2]), np.array([], dtype=np.int64)],
                     np.array([0, 0]))
    with pytest.raises(ValueError, match="zero-length"):
        decode_batch([b"\x01", b""], np.array([0, 0]))


def test_positions_codec_roundtrip():
    import numpy as np

    from textindex_spark.codec import (
        decode_positions_batch,
        encode_positions_batch,
    )

    blocks = [
        [np.array([0, 5, 9]), np.array([2]), np.array([7, 8])],
        [np.array([100000, 100001])],
        [np.array([3]), np.array([0, 2**30])],
    ]
    tfs = [np.array([3, 1, 2]), np.array([2]), np.array([1, 2])]
    dec = decode_positions_batch(encode_positions_batch(blocks), tfs)
    for b, docs in enumerate(blocks):
        for d, want in enumerate(docs):
            assert (dec[b][d] == want).all()
    # zero-length doc payloads must fail loudly (same invariant as
    # encode_batch)
    import pytest

    with pytest.raises(ValueError):
        encode_positions_batch([[np.array([], dtype=np.int64)]])


def test_single_block_decode_is_int64_and_exact():
    """The n==1 decode path must use an int64 cumsum base: the float64
    np.zeros default upcasts the subtraction and rounds doc_ids above
    2^53 (review r4 — confirmed corruption for snowflake-scale ids)."""
    import numpy as np

    from textindex_spark.codec import (
        decode_batch,
        decode_positions_batch,
        encode_batch,
        encode_positions_batch,
    )

    big = 1 << 60
    ids = np.array([big + 1, big + 3, big + 4], dtype=np.int64)
    (bufs,) = encode_batch([ids], np.array([big], dtype=np.int64))
    (decoded,), = (decode_batch([bufs[0]], np.array([big], dtype=np.int64)),)
    assert decoded[0].dtype == np.int64
    assert (decoded[0] == ids).all()
    # single-doc positional block: int64 positions, exact values
    pos = [np.array([3, 4], dtype=np.int64)]
    out = decode_positions_batch(
        encode_positions_batch([pos]), [np.array([2], dtype=np.int64)]
    )
    assert out[0][0].dtype == np.int64
    assert (out[0][0] == pos[0]).all()
