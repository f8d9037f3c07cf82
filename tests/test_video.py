"""Video container codecs (ops.video): Y4M + MJPEG-AVI round trips,
the MJPEG omitted-DHT convention, error contracts, and the Spark
kernel integration (fps-true sample_frames, first-frame features)."""
from __future__ import annotations

import struct

import numpy as np
import pytest

from tests.spark_fixtures import spark  # noqa: F401
from textindex_spark.ops import multimodal
from textindex_spark.ops.jpeg import decode_jpeg, encode_jpeg
from textindex_spark.ops.video import (
    UnsupportedCodecError,
    _mjpeg_frame_bytes,
    decode_avi_mjpeg,
    decode_video,
    decode_y4m,
    encode_avi_mjpeg,
    encode_y4m,
    sniff_container,
)


def _frames(n=3, h=16, w=24, seed=7):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


# ------------------------------------------------------------------- Y4M

def test_y4m_c444_roundtrip_within_rounding():
    frames = _frames()
    dec, fps = decode_y4m(encode_y4m(frames, fps=25.0, colorspace="444"))
    assert fps == 25.0 and len(dec) == 3
    for d, f in zip(dec, frames):
        # encode matrix and decode matrix are exact float inverses →
        # only quantization error survives
        assert np.abs(d.astype(int) - f.astype(int)).max() <= 2


def test_y4m_c420_c422_shapes_and_uniform_color_exact():
    # uniform frames: chroma subsampling is lossless on constants
    solid = [np.full((8, 12, 3), c, dtype=np.uint8) for c in (17, 130, 250)]
    for cs in ("420", "422"):
        dec, fps = decode_y4m(encode_y4m(solid, fps=30000 / 1001, colorspace=cs))
        assert abs(fps - 30000 / 1001) < 1e-9  # F30000:1001 survives exactly
        for d, f in zip(dec, solid):
            assert d.shape == f.shape
            assert np.abs(d.astype(int) - f.astype(int)).max() <= 2


def test_y4m_mono_and_siting_variant_headers():
    gray = [np.repeat(np.arange(64, dtype=np.uint8).reshape(8, 8, 1), 3, 2)]
    dec, _ = decode_y4m(encode_y4m(gray, fps=10, colorspace="mono"))
    assert np.abs(dec[0].astype(int) - gray[0].astype(int)).max() <= 1
    # all 4:2:0 chroma-siting spellings parse; C absent defaults to 420
    base = encode_y4m(_frames(1, 8, 8), colorspace="420")
    for variant in (b"C420jpeg", b"C420mpeg2", b"C420paldv"):
        dec2, _ = decode_y4m(base.replace(b"C420", variant))
        assert dec2[0].shape == (8, 8, 3)
    headerless = base.replace(b" C420", b"")
    assert decode_y4m(headerless)[0][0].shape == (8, 8, 3)
    # FRAME parameters (spec-legal) are skipped, not choked on
    assert len(decode_y4m(base.replace(b"FRAME\n", b"FRAME Xtag\n"))[0]) == 1


def test_y4m_error_contract():
    ok = encode_y4m(_frames(2, 8, 8), colorspace="444")
    for bad in (
        b"",                                   # not Y4M
        b"YUV4MPEG2 W8 H8 F25:1 C444\n",        # no frames
        ok[:-5],                               # truncated payload
        ok.replace(b"C444", b"C411"),          # unsupported colorspace
        ok.replace(b"W8", b"W0"),              # bad dimensions
        ok.replace(b"FRAME", b"FRAMX", 1),     # bad frame marker
        b"YUV4MPEG2 W8 H8 F0:0 C444\n",         # zero-division F tag
    ):
        with pytest.raises(ValueError):
            decode_y4m(bad)


# ------------------------------------------------------------------- AVI

def test_avi_mjpeg_roundtrip_bit_identical_to_jpeg_path():
    frames = _frames()
    dec, fps = decode_avi_mjpeg(encode_avi_mjpeg(frames, fps=12.5))
    assert fps == 12.5 and len(dec) == 3
    for d, f in zip(dec, frames):
        # container adds nothing: identical to the bare JPEG codec
        assert (d == decode_jpeg(encode_jpeg(f, quality=90))).all()


def test_avi_mjpeg_missing_dht_gets_annex_k_defaults():
    """Real-world MJPEG frames omit DHT; the decoder must splice in
    the ITU T.81 Annex K default tables."""
    frame = _frames(1)[0]
    full = encode_jpeg(frame, quality=90)
    stripped, i = bytearray(), 0
    while i < len(full):
        if full[i] == 0xFF and i + 3 < len(full) and full[i + 1] == 0xC4:
            i += 2 + int.from_bytes(full[i + 2:i + 4], "big")
            continue
        stripped.append(full[i])
        i += 1
    stripped = bytes(stripped)
    assert b"\xff\xc4" not in stripped
    assert (decode_jpeg(_mjpeg_frame_bytes(stripped)) == decode_jpeg(full)).all()
    # and end-to-end: rebuild the container around the naked frame —
    # an AVI whose frames carry no DHT must still decode
    avi = encode_avi_mjpeg([frame], fps=5)
    assert full in avi

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    # reuse the encoder's own header (everything before the movi LIST)
    movi_at = avi.index(b"movi") - 8
    header = avi[12:movi_at]
    movi = chunk(b"LIST", b"movi" + chunk(b"00dc", stripped))
    body = b"AVI " + header + movi
    naked = b"RIFF" + struct.pack("<I", len(body)) + body
    dec, _ = decode_avi_mjpeg(naked)
    assert (dec[0] == decode_jpeg(full)).all()


def test_avi_error_contract():
    ok = encode_avi_mjpeg(_frames(1), fps=5)
    audio_only = ok.replace(b"vids", b"auds")
    for bad in (b"", b"RIFF\x08\x00\x00\x00WAVEdata", ok[:40], audio_only):
        with pytest.raises(ValueError):
            decode_avi_mjpeg(bad)
    # non-MJPEG codec is the TYPED error (kernels route it to the
    # stub, not to the corrupt-skip path) — both fourcc fields patched
    not_mjpg = ok.replace(b"MJPG", b"H264")
    with pytest.raises(UnsupportedCodecError):
        decode_avi_mjpeg(not_mjpg)
    with pytest.raises(UnsupportedCodecError):
        decode_y4m(encode_y4m(_frames(1, 8, 8)).replace(b"C444", b"C411"))


def test_avi_strf_only_mjpg_and_dropped_frames():
    """Real muxers blank strh fccHandler (players key on strf
    biCompression) and emit zero-length ##dc chunks for dropped
    frames — both must decode."""
    frames = _frames(2, 8, 8)
    avi = encode_avi_mjpeg(frames, fps=5)
    blank_handler = avi.replace(b"vids" + b"MJPG", b"vids" + b"\x00\x00\x00\x00")
    assert blank_handler != avi
    dec, _ = decode_avi_mjpeg(blank_handler)
    assert len(dec) == 2
    # splice a zero-length 00dc chunk (dropped frame) into movi and
    # fix the two enclosing sizes
    movi_at = avi.index(b"movi") - 8
    import struct as _s

    head, movi_size = avi[:movi_at + 4], _s.unpack_from("<I", avi, movi_at + 4)[0]
    movi_body = avi[movi_at + 12:movi_at + 8 + movi_size]
    tail = avi[movi_at + 8 + movi_size + (movi_size & 1):]
    drop = b"00dc" + _s.pack("<I", 0)
    new_body = drop + movi_body
    rebuilt = (
        head + _s.pack("<I", len(new_body) + 4) + b"movi" + new_body + tail
    )
    rebuilt = b"RIFF" + _s.pack("<I", len(rebuilt) - 8) + rebuilt[8:]
    dec2, _ = decode_avi_mjpeg(rebuilt)
    assert len(dec2) == 2 and (dec2[0] == dec[0]).all()


def test_decode_video_max_frames_probe():
    frames = _frames(4, 8, 8)
    for blob in (encode_avi_mjpeg(frames, fps=5), encode_y4m(frames, fps=5)):
        one, _ = decode_video(blob, max_frames=1)
        full, _ = decode_video(blob)
        assert len(one) == 1 and len(full) == 4
        assert (one[0] == full[0]).all()


def test_decode_video_dispatch_and_sniff():
    frames = _frames(2, 8, 8)
    avi = encode_avi_mjpeg(frames, fps=4)
    y4m = encode_y4m(frames, fps=4, colorspace="444")
    assert sniff_container(avi) == "avi" and sniff_container(y4m) == "y4m"
    # generic mime + magic sniff still routes correctly
    assert len(decode_video(avi, "application/octet-stream")[0]) == 2
    assert len(decode_video(y4m, None)[0]) == 2
    assert sniff_container(b"\x00\x00\x00 ftypisom", "video/mp4") is None
    with pytest.raises(ValueError):
        decode_video(b"\x00\x00\x00 ftypisom", "video/mp4")


def test_video_byte_flip_fuzz_valueerror_only():
    """Corrupt containers must decode or raise ValueError — never any
    other exception (the kernels' route-to-skip contract), and never
    allocate from attacker-controlled dimensions (the payload-length
    check runs before any frombuffer)."""
    frames = _frames(2, 8, 8)
    samples = {
        "y4m": encode_y4m(frames, fps=5, colorspace="420"),
        "avi": encode_avi_mjpeg(frames, fps=5),
    }
    rng = np.random.default_rng(11)
    for name, base in samples.items():
        for trial in range(250):
            buf = bytearray(base)
            for _ in range(rng.integers(1, 4)):
                buf[rng.integers(0, len(buf))] = rng.integers(0, 256)
            blob = bytes(buf)
            try:
                if sniff_container(blob) is not None:
                    decode_video(blob)
            except ValueError:
                pass  # the only permitted failure


# ------------------------------------------------------- Spark kernels

def test_sample_frames_real_video(spark):
    """sample_frames walks the real container timeline: 2 fps video
    sampled at 1000 ms → one PNG per second, showing the frame a
    viewer would see (frame f on screen in [f/fps, (f+1)/fps))."""
    frames = [np.full((6, 6, 3), 40 * i, dtype=np.uint8) for i in range(4)]
    avi = encode_avi_mjpeg(frames, fps=2)          # 2 s total
    y4m = encode_y4m(frames, fps=1, colorspace="444")  # 4 s total
    rows = [
        (1, "video", bytes(avi), "video/x-msvideo", 6, 6, None),
        (2, "video", bytes(y4m), "video/x-yuv4mpeg", 6, 6, None),
        (3, "video", b"corrupt" + bytes(avi[:20]), "video/avi", 6, 6, 9000),
        (4, "video", b"opaque-mp4", "video/mp4", 6, 6, 2500),
        # valid AVI container, non-MJPEG codec → falls back to the
        # duration_ms stub path (it must NOT be silently dropped)
        (5, "video", bytes(avi.replace(b"MJPG", b"H264")), "video/avi", 6, 6, 3000),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = multimodal.sample_frames(media, every_ms=1000).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    # AVI: 4 frames @2fps = 2000 ms → samples at 0,1000 → frames 0,2
    assert [r["frame_idx"] for r in sorted(by_id[1], key=lambda r: r["frame_idx"])] == [0, 1]
    png0 = multimodal.png_to_rgb(multimodal.decode_png(bytes(by_id[1][0]["frame"])))
    assert png0.shape == (6, 6, 3)
    # Y4M: 4 frames @1fps = 4000 ms → 4 samples, one per source frame
    y4m_frames = sorted(by_id[2], key=lambda r: r["frame_idx"])
    assert len(y4m_frames) == 4
    for i, r in enumerate(y4m_frames):
        img = multimodal.png_to_rgb(multimodal.decode_png(bytes(r["frame"])))
        expect = decode_y4m(y4m)[0][i]
        assert (img == expect).all()
    # corrupt identified container → row skipped (GIF contract)
    assert 3 not in by_id
    # unidentified container keeps the deterministic-fake plumbing
    assert len(by_id[4]) == 3  # 2500 ms @ 1000 ms
    # parseable container + undecodable codec → stub, not dropped
    assert len(by_id[5]) == 3  # 3000 ms @ 1000 ms


def test_resize_images_real_video(spark):
    """resize_images re-encodes Y4M and MJPEG-AVI rows frame-by-frame,
    preserving frame count and fps."""
    frames = [np.full((8, 8, 3), 60 * i + 20, dtype=np.uint8) for i in range(3)]
    rows = [
        (1, "video", bytes(encode_avi_mjpeg(frames, fps=6)), "video/avi", 8, 8, None),
        (2, "video", bytes(encode_y4m(frames, fps=6)), "video/x-yuv4mpeg", 8, 8, None),
        (3, "video", b"opaque-mp4", "video/mp4", 8, 8, 500),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in multimodal.resize_images(media, 4, 4).collect()}
    assert out[1]["ok"] and out[2]["ok"] and not out[3]["ok"]
    for mid in (1, 2):
        dec, fps = decode_video(bytes(out[mid]["content"]))
        assert fps == 6 and len(dec) == 3
        assert dec[0].shape == (4, 4, 3)
        # uniform frames survive resize + re-encode within rounding
        for d, f in zip(dec, frames):
            assert np.abs(d.astype(int) - int(f[0, 0, 0])).max() <= 3
    assert bytes(out[3]["content"]) == b"opaque-mp4"  # pass-through


def test_extract_features_real_video(spark):
    frames = _frames(2, 8, 8)
    rows = [
        (1, "video", bytes(encode_avi_mjpeg(frames, fps=4)), "video/avi", 8, 8, None),
        (2, "video", bytes(encode_y4m(frames, fps=4)), "video/x-yuv4mpeg", 8, 8, None),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {
        r["media_id"]: r
        for r in multimodal.extract_features(media, deterministic_fake=False).collect()
    }
    # deterministic_fake=False: only a REAL decode can set ok=True
    assert got[1]["ok"] and got[2]["ok"]
    first = decode_avi_mjpeg(encode_avi_mjpeg(frames, fps=4))[0][0].astype(np.float32)
    mean_rgb = first.reshape(-1, 3).mean(axis=0) / 255.0
    assert np.allclose(np.array(got[1]["feature"][:3]), mean_rgb, atol=1e-6)


def test_extract_features_corrupt_audio_never_fails_stage(spark):
    """A corrupt WAV (or 8-bit PCM) row must produce a row, not a
    Spark stage failure — wave.Error is re-raised as ValueError and
    the row falls through to the stub like corrupt images do."""
    import io
    import wave as wave_mod

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(1)  # 8-bit PCM: decode_wav rejects it
        wf.setframerate(8000)
        wf.writeframes(bytes(range(64)))
    rows = [
        (1, "audio", b"not-a-riff-wav", "audio/wav", 0, 0, None),
        (2, "audio", buf.getvalue(), "audio/wav", 0, 0, None),
        (3, "audio", b"RIFF\x24\x00\x00\x00WAVEfmt ", "audio/x-wav", 0, 0, None),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in multimodal.extract_features(media).collect()}
    assert set(got) == {1, 2, 3}  # all rows emitted, stage survived
    assert all(got[i]["ok"] for i in (1, 2, 3))  # deterministic fake
    strict = {
        r["media_id"]: r
        for r in multimodal.extract_features(media, deterministic_fake=False).collect()
    }
    assert not any(strict[i]["ok"] for i in (1, 2, 3))  # honest ok=False
