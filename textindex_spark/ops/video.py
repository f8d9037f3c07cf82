"""Video container codecs — stdlib + numpy only, no ffmpeg.

REAL decode for the two container/codec combinations this toolchain
can parse end-to-end without an external media library:

* **YUV4MPEG2 (.y4m)** — the uncompressed interchange format video
  tooling pipelines exchange (ffmpeg/x264/VMAF all speak it): a
  plain-text stream header (``YUV4MPEG2 W.. H.. F..:.. C..``), then
  one ``FRAME`` header + planar YUV payload per frame.
  ``decode_y4m`` handles C420* (all chroma-siting variants share the
  nearest-neighbor upsample), C422, C444 and Cmono, converting to
  RGB with the BT.601 limited-range matrix.
* **MJPEG-in-AVI (.avi, fourcc MJPG)** — each frame is a baseline
  JPEG inside a RIFF/AVI container (webcams, older crawled clips).
  The RIFF walk pulls ``avih``/``strh`` timing and the ``movi``
  ``##dc``/``##db`` chunks; frames decode through ``ops.jpeg``.
  Per the MJPEG convention, frames that omit their Huffman tables
  (DHT) get the ITU T.81 Annex K default tables spliced in before
  decode — real-world MJPEG files rely on exactly this decoder
  behavior.

Both decoders return ``(frames, fps)`` with frames as a list of
(H, W, 3) uint8 RGB arrays, and raise ``ValueError`` on corrupt or
unsupported streams — the same uniform contract as
``decode_png``/``decode_jpeg``/``decode_gif``, so the Arrow kernels
in ``ops.multimodal`` route bad blobs to ok=False/skip instead of
failing the Spark stage. Encoders exist as deterministic synthetic
writers for round-trip tests and re-encode paths, like
``encode_png``/``encode_jpeg``.

ffmpeg-class codecs (H.264/VP9/AV1 in MP4/MKV/WebM) remain honestly
stubbed in ``ops.multimodal`` — entropy-coded inter-frame video is
not implementable credibly here; those rows keep the
``deterministic_fake`` plumbing path.

Reference parity note: the reference engine (thscharler/textindex)
has no media path — this module is part of the
training-data-pipeline extension surface (SURVEY.md §2.8), not a
reference port.
"""
from __future__ import annotations

import struct

import numpy as np

# ------------------------------------------------------------ YUV <-> RGB
# BT.601 limited-range ("studio swing") matrices. DECODE_M is the exact
# float inverse of ENCODE_M so encode->decode round-trips to within
# rounding (<= 2/255 per channel), which the tests pin.

_ENCODE_M = np.array(
    [
        [0.299, 0.587, 0.114],
        [-0.168735891647856, -0.331264108352144, 0.5],
        [0.5, -0.418687589158345, -0.081312410841655],
    ]
)
_DECODE_M = np.linalg.inv(_ENCODE_M)
_Y_SCALE = 219.0 / 255.0
_C_SCALE = 224.0 / 255.0


class UnsupportedCodecError(ValueError):
    """The container parsed fine but the payload codec is one this
    module honestly cannot decode (non-MJPEG AVI, exotic Y4M
    colorspace). Kept distinct from plain ValueError (= corrupt
    stream) so the multimodal kernels can route these rows to the
    deterministic-fake stub instead of skipping them."""


def _rgb_to_yuv(rgb: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 RGB → (H, W, 3) float YCbCr, limited range."""
    ycc = np.asarray(rgb, dtype=np.float64) @ _ENCODE_M.T
    ycc[..., 0] = 16.0 + _Y_SCALE * ycc[..., 0]
    ycc[..., 1:] = 128.0 + _C_SCALE * ycc[..., 1:]
    return ycc


def _yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Full-resolution planes → (H, W, 3) uint8 RGB."""
    ycc = np.stack(
        [
            (y.astype(np.float64) - 16.0) / _Y_SCALE,
            (u.astype(np.float64) - 128.0) / _C_SCALE,
            (v.astype(np.float64) - 128.0) / _C_SCALE,
        ],
        axis=-1,
    )
    rgb = ycc @ _DECODE_M.T
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _gray_to_rgb(y: np.ndarray) -> np.ndarray:
    g = np.clip(np.round((y.astype(np.float64) - 16.0) / _Y_SCALE), 0, 255)
    return np.repeat(g.astype(np.uint8)[:, :, None], 3, axis=2)


# ------------------------------------------------------------------- Y4M

_Y4M_MAGIC = b"YUV4MPEG2"
# chroma-siting variants of 4:2:0 share one nearest-neighbor upsample
_Y4M_SUBSAMPLE = {
    "420": (2, 2), "420jpeg": (2, 2), "420mpeg2": (2, 2),
    "420paldv": (2, 2), "422": (1, 2), "444": (1, 1),
}


def decode_y4m(
    blob: bytes, max_pixels: int = 1 << 26, max_frames: int | None = None
) -> tuple[list[np.ndarray], float]:
    """YUV4MPEG2 bytes → ([(H, W, 3) uint8 RGB ...], fps).

    ValueError on corrupt/truncated streams; UnsupportedCodecError
    for colorspaces outside C420*/C422/C444/Cmono (e.g. C411, 10-bit
    p10 variants). ``max_frames`` stops the walk early — frames are
    independent, so a first-frame probe costs one frame, not the
    whole stream."""
    if not blob.startswith(_Y4M_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    nl = blob.find(b"\n")
    if nl < 0:
        raise ValueError("truncated Y4M stream header")
    w = h = 0
    fps = 0.0
    cs = "420jpeg"  # spec default when C is absent
    try:
        for tok in blob[len(_Y4M_MAGIC):nl].decode("ascii").split():
            tag, val = tok[0], tok[1:]
            if tag == "W":
                w = int(val)
            elif tag == "H":
                h = int(val)
            elif tag == "F":
                num, den = val.split(":")
                fps = int(num) / int(den)
            elif tag == "C":
                cs = val
            # I (interlacing), A (aspect), X (extensions): ignored —
            # frames carry full planes either way
    except (UnicodeDecodeError, ValueError, ZeroDivisionError) as e:
        raise ValueError(f"bad Y4M stream header ({e})") from e
    if w <= 0 or h <= 0:
        raise ValueError("bad Y4M dimensions")
    if w * h > max_pixels:
        raise ValueError("Y4M frame exceeds pixel budget")
    if fps <= 0:
        fps = 30.0  # F is technically required; tolerate like players do
    mono = cs == "mono"
    if not mono:
        sub = _Y4M_SUBSAMPLE.get(cs)
        if sub is None:
            raise UnsupportedCodecError(f"unsupported Y4M colorspace C{cs}")
        sv, sh = sub
        if (h % sv) or (w % sh):
            raise ValueError("Y4M dimensions not divisible by subsampling")
        cw, ch = w // sh, h // sv
    ysz = w * h
    csz = 0 if mono else cw * ch
    frames: list[np.ndarray] = []
    pos = nl + 1
    while pos < len(blob):
        if max_frames is not None and len(frames) >= max_frames:
            break
        if not blob.startswith(b"FRAME", pos):
            raise ValueError("bad Y4M frame marker")
        fnl = blob.find(b"\n", pos)
        if fnl < 0:
            raise ValueError("truncated Y4M frame header")
        pos = fnl + 1
        if pos + ysz + 2 * csz > len(blob):
            raise ValueError("truncated Y4M frame payload")
        y = np.frombuffer(blob, np.uint8, ysz, pos).reshape(h, w)
        if mono:
            frames.append(_gray_to_rgb(y))
        else:
            u = np.frombuffer(blob, np.uint8, csz, pos + ysz).reshape(ch, cw)
            v = np.frombuffer(blob, np.uint8, csz, pos + ysz + csz).reshape(ch, cw)
            u = np.repeat(np.repeat(u, sv, axis=0), sh, axis=1)
            v = np.repeat(np.repeat(v, sv, axis=0), sh, axis=1)
            frames.append(_yuv_to_rgb(y, u, v))
        pos += ysz + 2 * csz
    if not frames:
        raise ValueError("Y4M stream has no frames")
    return frames, fps


def encode_y4m(
    frames: list[np.ndarray], fps: float = 25.0, colorspace: str = "444"
) -> bytes:
    """[(H, W, 3) uint8 RGB ...] → YUV4MPEG2 bytes (C444/C422/C420/
    Cmono). Deterministic synthetic writer for round-trip tests."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    from fractions import Fraction

    f = Fraction(fps).limit_denominator(1001 * 1000)
    head = f"YUV4MPEG2 W{w} H{h} F{f.numerator}:{f.denominator} Ip A1:1 C{colorspace}\n"
    out = [head.encode("ascii")]
    mono = colorspace == "mono"
    if not mono:
        sv, sh = _Y4M_SUBSAMPLE[colorspace]
    for fr in frames:
        if fr.shape[:2] != (h, w):
            raise ValueError("frame dimensions differ")
        ycc = _rgb_to_yuv(fr)
        planes = np.clip(np.round(ycc), 0, 255).astype(np.uint8)
        out.append(b"FRAME\n")
        out.append(planes[:, :, 0].tobytes())
        if not mono:
            for c in (1, 2):
                # box-filter subsample straight from the float plane
                p = ycc[:, :, c].reshape(h // sv, sv, w // sh, sh).mean(axis=(1, 3))
                out.append(np.clip(np.round(p), 0, 255).astype(np.uint8).tobytes())
    return b"".join(out)


# ------------------------------------------------------------------- AVI

def _build_default_dht() -> bytes:
    """ITU T.81 Annex K default Huffman tables as one DHT segment —
    what an MJPEG decoder must supply when frames omit theirs."""
    from textindex_spark.ops.jpeg import (
        AC_CHROMA_BITS, AC_CHROMA_VALS, AC_LUMA_BITS, AC_LUMA_VALS,
        DC_CHROMA_BITS, DC_CHROMA_VALS, DC_LUMA_BITS, DC_LUMA_VALS,
    )

    body = b""
    for cls, tid, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
        (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        body += bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _mjpeg_frame_bytes(data: bytes) -> bytes:
    """Splice the Annex K default DHT before SOS when the frame
    carries no Huffman tables (the MJPEG omitted-DHT convention).
    Walks the marker structure — a substring scan would false-match
    0xFFC4 inside other segments' payload bytes."""
    if data[:2] != b"\xff\xd8":
        return data  # let decode_jpeg produce the uniform ValueError
    i = 2
    sos = -1
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            return data  # malformed marker stream: decode as-is
        marker = data[i + 1]
        if marker == 0xC4:
            return data  # has its own Huffman tables
        if marker == 0xDA:
            sos = i
            break
        if marker == 0xFF:
            i += 1  # fill byte before the real marker
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD9:
            i += 2  # standalone marker (TEM / RSTn / SOI / EOI)
            continue
        i += 2 + int.from_bytes(data[i + 2:i + 4], "big")
    if sos < 0:
        return data
    return data[:sos] + _build_default_dht() + data[sos:]


def _walk_riff(blob: bytes, start: int, end: int):
    """Yield (fourcc, list_type|None, payload_start, payload_end)."""
    pos = start
    while pos + 8 <= end:
        fourcc = blob[pos:pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        body_start = pos + 8
        body_end = body_start + size
        if body_end > end:
            raise ValueError("truncated AVI chunk")
        if fourcc in (b"LIST", b"RIFF"):
            yield fourcc, blob[body_start:body_start + 4], body_start + 4, body_end
        else:
            yield fourcc, None, body_start, body_end
        pos = body_end + (size & 1)  # chunks pad to even


def decode_avi_mjpeg(
    blob: bytes, max_frames: int | None = None
) -> tuple[list[np.ndarray], float]:
    """MJPEG-in-AVI bytes → ([(H, W, 3) uint8 RGB ...], fps).

    ValueError on non-AVI RIFF or corrupt frame data;
    UnsupportedCodecError when the video stream's codec is not MJPEG
    (checked in strh fccHandler, falling back to strf biCompression —
    real muxers leave either blank). Zero-length ``##dc`` chunks (the
    standard dropped-frame timing marker) are skipped like players
    do. Grayscale MJPEG frames are expanded to RGB so the frame list
    is uniformly (H, W, 3)."""
    from textindex_spark.ops.jpeg import decode_jpeg

    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        raise ValueError("not an AVI stream")
    try:
        top = list(_walk_riff(blob, 12, len(blob)))
    except struct.error as e:
        raise ValueError("truncated AVI header") from e
    fps = 0.0
    handler_ok = False
    vid_stream = None  # index of the vids stream among all streams
    stream_no = 0
    frames: list[np.ndarray] = []
    for fourcc, ltype, s, e in top:
        if fourcc == b"LIST" and ltype == b"hdrl":
            for c2, l2, s2, e2 in _walk_riff(blob, s, e):
                if c2 == b"avih" and e2 - s2 >= 4 and fps <= 0:
                    (us_per_frame,) = struct.unpack_from("<I", blob, s2)
                    if us_per_frame:
                        fps = 1e6 / us_per_frame
                elif c2 == b"LIST" and l2 == b"strl":
                    this_is_vid = False
                    for c3, _l3, s3, e3 in _walk_riff(blob, s2, e2):
                        if c3 == b"strh" and e3 - s3 >= 28:
                            fcc_type = blob[s3:s3 + 4]
                            handler = blob[s3 + 4:s3 + 8]
                            scale, rate = struct.unpack_from("<II", blob, s3 + 20)
                            if fcc_type == b"vids" and vid_stream is None:
                                vid_stream = stream_no
                                this_is_vid = True
                                if handler.upper() in (b"MJPG", b"DMB1"):
                                    handler_ok = True
                                if scale and rate:
                                    fps = rate / scale
                        elif c3 == b"strf" and e3 - s3 >= 20 and this_is_vid:
                            # BITMAPINFOHEADER biCompression: muxers
                            # often blank fccHandler and set only this
                            if blob[s3 + 16:s3 + 20].upper() in (b"MJPG", b"DMB1"):
                                handler_ok = True
                    stream_no += 1
        elif fourcc == b"LIST" and ltype == b"movi":
            if vid_stream is None:
                raise ValueError("AVI has no video stream")
            want = b"%02d" % vid_stream
            for c2, l2, s2, e2 in _walk_riff(blob, s, e):
                # tolerate OpenDML 'rec ' sub-lists around the chunks
                entries = (
                    _walk_riff(blob, s2, e2)
                    if c2 == b"LIST" and l2 == b"rec "
                    else [(c2, l2, s2, e2)]
                )
                for c3, _l3, s3, e3 in entries:
                    if c3[:2] == want and c3[2:4] in (b"dc", b"db"):
                        if e3 == s3:
                            continue  # dropped-frame timing marker
                        if not handler_ok:
                            raise UnsupportedCodecError(
                                "AVI video stream is not MJPEG"
                            )
                        data = _mjpeg_frame_bytes(blob[s3:e3])
                        img = decode_jpeg(data)
                        if img.shape[2] == 1:
                            img = np.repeat(img, 3, axis=2)
                        frames.append(img)
                        if max_frames is not None and len(frames) >= max_frames:
                            return frames, fps if fps > 0 else 30.0
    if vid_stream is None:
        raise ValueError("AVI has no video stream")
    if not handler_ok:
        raise UnsupportedCodecError("AVI video stream is not MJPEG")
    if not frames:
        raise ValueError("AVI has no video frames")
    return frames, fps if fps > 0 else 30.0


def encode_avi_mjpeg(
    frames: list[np.ndarray], fps: float = 25.0, quality: int = 90
) -> bytes:
    """[(H, W, 3) uint8 RGB ...] → minimal spec-shaped MJPEG AVI
    (RIFF hdrl/avih/strl/strh/strf + movi + idx1). Deterministic
    synthetic writer for round-trip tests and re-encode paths."""
    from textindex_spark.ops.jpeg import encode_jpeg

    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    jpgs = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" if len(body) & 1 else b"")

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    rate, scale = max(1, round(fps * 1000)), 1000
    max_jpg = max(len(j) for j in jpgs)
    avih = struct.pack(
        "<14I",
        round(1e6 * scale / rate), max_jpg * rate // scale, 0,
        0x10,  # AVIF_HASINDEX
        len(frames), 0, 1, max_jpg, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, scale, rate, 0,
                      len(frames), max_jpg, 0xFFFFFFFF, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b""
    idx = b""
    for j in jpgs:
        # idx1 offsets point at the chunk fourcc, relative to 'movi'
        idx += b"00dc" + struct.pack("<III", 0x10, 4 + len(movi_body), len(j))
        movi_body += chunk(b"00dc", j)
    movi = lst(b"movi", movi_body)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ------------------------------------------------------------- dispatch

_VIDEO_MIMES_Y4M = ("video/x-yuv4mpeg", "video/y4m")
_VIDEO_MIMES_AVI = ("video/x-msvideo", "video/avi", "video/msvideo")


def sniff_container(blob: bytes, mime: str | None = None) -> str | None:
    """'y4m' / 'avi' when the row is positively one of the decodable
    containers (by mime or magic bytes — crawled media frequently
    ships with a wrong or generic Content-Type), else None. None is
    the callers' signal to keep the honest-stub path."""
    blob = blob or b""
    if mime in _VIDEO_MIMES_Y4M or blob.startswith(_Y4M_MAGIC):
        return "y4m"
    if mime in _VIDEO_MIMES_AVI or (blob[:4] == b"RIFF" and blob[8:12] == b"AVI "):
        return "avi"
    return None


def decode_video(
    blob: bytes, mime: str | None = None, max_frames: int | None = None
) -> tuple[list[np.ndarray], float]:
    """Dispatch on ``sniff_container``. UnsupportedCodecError for
    ffmpeg-class containers/codecs — callers keep the stub path for
    those; plain ValueError means an identified container is corrupt
    (callers skip the row, the corrupt-GIF contract)."""
    kind = sniff_container(blob, mime)
    if kind == "y4m":
        return decode_y4m(blob or b"", max_frames=max_frames)
    if kind == "avi":
        return decode_avi_mjpeg(blob or b"", max_frames=max_frames)
    raise UnsupportedCodecError(f"unsupported video container (mime={mime!r})")
