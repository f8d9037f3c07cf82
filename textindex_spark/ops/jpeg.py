"""JPEG codec — stdlib + numpy only, no imaging library.

REAL decode for the two formats that cover essentially all crawled
web JPEGs: baseline sequential DCT (SOF0) and progressive DCT with
Huffman coding (SOF2, ITU T.81 Annex G — spectral selection AND
successive approximation, interleaved or single-component scans),
8-bit, grayscale or YCbCr with any integer sampling factors (4:4:4 /
4:2:2 / 4:2:0 ...), restart markers (DRI/RSTn) and 16-bit quant
tables. Arithmetic coding, hierarchical and 12-bit modes raise
``ValueError`` — callers route those rows to an imaging-library
cluster exactly like the other decoders in ``ops.multimodal`` route
corrupt streams.

The encoders exist for the same reason ``encode_png`` does: a
deterministic synthetic writer so round-trip tests and
``resize_images`` re-encode work in this container. ``encode_jpeg``
writes baseline JFIF with the ITU T.81 Annex K quantization +
Huffman tables (quality-scaled with the classic libjpeg formula),
4:4:4 or 4:2:0 sampling, and optional restart intervals.
``encode_jpeg_progressive`` writes a spectral-selection +
successive-approximation scan script carrying the SAME quantized
coefficients, so progressive decode is bit-identical to baseline
decode at equal quality — the round-trip tests pin exactly that.

Everything here is per-blob CPU work invoked from Arrow-batched
``mapInPandas`` kernels (``ops.multimodal``) — the distributed story
(byte-budget partitioning, batch sizing) lives there; this module is
deliberately plain numpy so it has no Spark dependency.

Reference parity note: the reference engine (thscharler/textindex)
has no media path at all — this module is part of the
training-data-pipeline extension surface (SURVEY.md §2.8), not a
reference port.
"""
from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- tables

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# ITU T.81 Annex K.1/K.2 example quantization tables (row-major)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# ITU T.81 Annex K.3-K.6 typical Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Flat AC table for the progressive encoder: the Annex K AC tables
# lack the EOBn symbols (r<<4 for 1 <= r <= 14) progressive scans
# emit, so the progressive writer ships its own table covering every
# 8-bit symbol — 0x00..0xFE at 9 bits, 0xFF at 10 (BITS counts are
# u8, so one length can hold at most 255 codes). Bloats the stream a
# little; this writer optimizes for decoder coverage, not size.
AC_FLAT_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
AC_FLAT_VALS = list(range(256))

# orthonormal 8x8 DCT-II basis: block = A @ coeff @ A.T inverts
# coeff = A.T @ block @ A (A[k,n] = c(k)/2 * cos((2n+1)kπ/16))
_A = np.zeros((8, 8))
for _k in range(8):
    _c = np.sqrt(0.125) if _k == 0 else 0.5
    for _n in range(8):
        _A[_k, _n] = _c * np.cos((2 * _n + 1) * _k * np.pi / 16.0)
_IDCT_L = _A.T.copy()  # pixels = A.T @ coeff @ A


def _build_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """Canonical Huffman (length, code) → symbol map (T.81 C.2)."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length)."""
    enc: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return enc


def _extend(v: int, s: int) -> int:
    return v - ((1 << s) - 1) if v < (1 << (s - 1)) else v


# ---------------------------------------------------------------- decode


class _BitReader:
    """MSB-first bit reader over an already de-stuffed entropy
    interval (0xFF00 → 0xFF removed, restart markers split out by the
    scan parser)."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy data")
            self.buf = self.data[self.pos]
            self.pos += 1
            self.nbits = 8
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad JPEG Huffman code")


def _parse_entropy(blob: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy-coded bytes from ``start`` → de-stuffed intervals split
    on restart markers; returns (intervals, pos_of_terminating_marker)."""
    intervals: list[bytes] = []
    cur = bytearray()
    i, n = start, len(blob)
    while i < n:
        b = blob[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = blob[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            intervals.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # any real marker terminates the scan
            break
    intervals.append(bytes(cur))
    return intervals, i


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Baseline (SOF0) or progressive (SOF2) JPEG → (H, W, 3) uint8
    RGB, or (H, W, 1) for grayscale streams. ValueError on other
    modes or corrupt data (uniform error contract with
    decode_ppm/decode_png).

    The contract is enforced at this boundary: any internal decode
    fault a corrupt stream can still provoke (index/zero-division in
    the MCU math) is re-raised as ValueError so the multimodal
    kernels route bad blobs to ok=False instead of failing the whole
    Spark stage."""
    try:
        return _decode_jpeg(blob)
    except (ValueError, NotImplementedError):
        raise
    except Exception as e:
        raise ValueError(f"corrupt JPEG stream ({type(e).__name__})") from e


def _decode_jpeg(blob: bytes) -> np.ndarray:
    if not blob or len(blob) < 4 or blob[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    w = h = None
    comps: list[dict] = []  # id, hs, vs, tq
    dri = 0
    i, n = 2, len(blob)
    scan: list[tuple[dict, np.ndarray]] | None = None
    progressive = False
    coef: list[np.ndarray] | None = None  # per-comp zigzag coeff stores
    while i + 4 <= n:
        if blob[i] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        while i + 1 < n and blob[i + 1] == 0xFF:  # fill bytes (B.1.1.2)
            i += 1
        marker = blob[i + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seglen = int.from_bytes(blob[i + 2 : i + 4], "big")
        seg = blob[i + 4 : i + 2 + seglen]
        if seglen < 2 or len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                      0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG mode (marker 0xFF{marker:02X}); "
                "only baseline (SOF0) and progressive (SOF2) Huffman "
                "modes are decoded here"
            )
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq:
                    vals = np.frombuffer(seg[p : p + 128], ">u2").astype(np.int64)
                    p += 128
                else:
                    vals = np.frombuffer(seg[p : p + 64], np.uint8).astype(np.int64)
                    p += 64
                table = np.zeros(64, np.int64)
                table[ZIGZAG] = vals  # stored in zigzag order
                qt[tq] = table
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                cnt = sum(bits)
                vals = list(seg[p + 17 : p + 17 + cnt])
                if len(bits) != 16 or len(vals) != cnt:
                    raise ValueError("truncated JPEG DHT segment")
                huff[(tc, th)] = _build_decode_table(bits, vals)
                p += 17 + cnt
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            progressive = marker == 0xC2
            if len(seg) < 6:
                raise ValueError("truncated JPEG SOF segment")
            if seg[0] != 8:
                raise ValueError("only 8-bit JPEG supported")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            if w == 0 or h == 0:
                raise ValueError("zero JPEG dimensions")
            nc = seg[5]
            if nc not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {nc}")
            if len(seg) < 6 + 3 * nc:
                raise ValueError("truncated JPEG SOF segment")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ValueError(f"bad JPEG sampling factors {hs}x{vs}")
                comps.append({"id": cid, "hs": hs, "vs": vs, "tq": tq})
        elif marker == 0xDD:  # DRI
            dri = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            if w is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            if ns < 1 or len(seg) < 1 + 2 * ns + 3:
                raise ValueError("truncated JPEG SOS segment")
            order = []
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                matches = [x for x in comps if x["id"] == cid]
                if not matches:
                    raise ValueError(f"JPEG SOS references unknown component {cid}")
                comp = matches[0]
                comp["td"], comp["ta"] = tt >> 4, tt & 0x0F
                order.append(comp)
            if progressive:
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                if coef is None:
                    hmax = max(x["hs"] for x in comps)
                    vmax = max(x["vs"] for x in comps)
                    mcux = (w + 8 * hmax - 1) // (8 * hmax)
                    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
                    coef = [
                        np.zeros((mcuy * x["vs"], mcux * x["hs"], 64), np.int32)
                        for x in comps
                    ]
                intervals, end = _parse_entropy(blob, i + 2 + seglen)
                _decode_prog_scan(
                    order, comps, coef, intervals,
                    ss, se, ahal >> 4, ahal & 0x0F, w, h, huff, dri,
                )
                i = end
                continue
            if len(order) != len(comps):
                raise ValueError("non-interleaved JPEG scans not supported")
            intervals, _end = _parse_entropy(blob, i + 2 + seglen)
            scan = _decode_scan(order, intervals, w, h, qt, huff, dri)
            break
        i += 2 + seglen
    if scan is None:
        if progressive and coef is not None:
            return _assemble(_reconstruct_progressive(comps, coef, w, h, qt), w, h)
        raise ValueError("no JPEG scan data")
    return _assemble(scan, w, h)


def _decode_scan(comps, intervals, w, h, qt, huff, dri):
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        bw, bh = mcux * c["hs"], mcuy * c["vs"]
        planes.append((c, np.zeros((bh * 8, bw * 8), np.float64)))
        if c["tq"] not in qt:
            raise ValueError(f"missing quant table {c['tq']}")
        if (0, c["td"]) not in huff or (1, c["ta"]) not in huff:
            raise ValueError("missing Huffman table")
    total_mcus = mcux * mcuy
    mcu = 0
    for iv, data in enumerate(intervals):
        reader = _BitReader(data)
        preds = {c["id"]: 0 for c in comps}
        end = min(total_mcus, mcu + dri) if dri else total_mcus
        while mcu < end:
            my, mx = divmod(mcu, mcux)
            for c, plane in planes:
                q = qt[c["tq"]]
                dct, act = huff[(0, c["td"])], huff[(1, c["ta"])]
                for by in range(c["vs"]):
                    for bx in range(c["hs"]):
                        coeff = np.zeros(64, np.float64)
                        s = reader.decode_huff(dct)
                        diff = _extend(reader.receive(s), s) if s else 0
                        preds[c["id"]] += diff
                        coeff[0] = preds[c["id"]] * q[0]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huff(act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            z = ZIGZAG[k]
                            coeff[z] = _extend(reader.receive(s), s) * q[z]
                            k += 1
                        block = _IDCT_L @ coeff.reshape(8, 8) @ _A
                        y0 = (my * c["vs"] + by) * 8
                        x0 = (mx * c["hs"] + bx) * 8
                        plane[y0 : y0 + 8, x0 : x0 + 8] = block
            mcu += 1
        if dri and mcu < total_mcus and iv + 1 >= len(intervals):
            raise ValueError("truncated JPEG: missing restart interval")
    if mcu < total_mcus:
        raise ValueError("truncated JPEG scan")
    return [
        (c, _finish_plane(plane, c, hmax, vmax, w, h)) for c, plane in planes
    ]


def _finish_plane(plane, c, hmax, vmax, w, h) -> np.ndarray:
    """Shared decode tail: level shift + clip, nearest upsample to the
    full-resolution grid, crop to (h, w)."""
    plane = np.clip(plane + 128.0, 0, 255)
    ry, rx = vmax // c["vs"], hmax // c["hs"]
    if ry > 1 or rx > 1:
        plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
    return plane[:h, :w]


def _decode_prog_scan(order, comps, coef, intervals, ss, se, ah, al,
                      w, h, huff, dri):
    """One progressive scan (T.81 Annex G decode): accumulate partial
    coefficients into per-component zigzag-order stores. DC scans may
    be interleaved (Ns > 1, MCU walk) or single-component; AC scans
    are single-component by spec and walk the component's own block
    grid row-major."""
    if not (0 <= ss <= se <= 63) or ah > 13 or al > 13:
        raise ValueError("bad progressive scan parameters")
    if ss == 0 and se != 0:
        raise ValueError("progressive scan mixes DC and AC bands")
    if ss > 0 and len(order) != 1:
        raise ValueError("progressive AC scan must be single-component")
    if ah and ah != al + 1:
        raise ValueError("bad successive-approximation step")
    if ss == 0:
        if ah == 0:
            for c in order:
                if (0, c["td"]) not in huff:
                    raise ValueError("missing Huffman table")
    elif (1, order[0]["ta"]) not in huff:
        raise ValueError("missing Huffman table")
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    cidx = {c["id"]: k for k, c in enumerate(comps)}
    if len(order) > 1:
        mcuy = (h + 8 * vmax - 1) // (8 * vmax)
        total = mcux * mcuy
    else:
        c0 = order[0]
        cbw = ((w * c0["hs"] + hmax - 1) // hmax + 7) // 8
        cbh = ((h * c0["vs"] + vmax - 1) // vmax + 7) // 8
        total = cbw * cbh
    done = 0
    for iv, data in enumerate(intervals):
        reader = _BitReader(data)
        preds = {c["id"]: 0 for c in order}
        eobrun = 0
        end = min(total, done + dri) if dri else total
        while done < end:
            if len(order) > 1:  # interleaved DC MCU
                my, mx = divmod(done, mcux)
                for c in order:
                    st = coef[cidx[c["id"]]]
                    for by in range(c["vs"]):
                        for bx in range(c["hs"]):
                            zz = st[my * c["vs"] + by, mx * c["hs"] + bx]
                            _prog_dc(reader, zz, preds, c, ah, al, huff)
            else:
                c = order[0]
                by, bx = divmod(done, cbw)
                zz = coef[cidx[c["id"]]][by, bx]
                if ss == 0:
                    _prog_dc(reader, zz, preds, c, ah, al, huff)
                else:
                    eobrun = _prog_ac(
                        reader, zz, ss, se, ah, al,
                        huff[(1, c["ta"])], eobrun,
                    )
            done += 1
        if dri and done < total and iv + 1 >= len(intervals):
            raise ValueError("truncated JPEG: missing restart interval")
    if done < total:
        raise ValueError("truncated JPEG scan")


def _prog_dc(reader, zz, preds, c, ah, al, huff):
    if ah == 0:  # first DC pass: baseline diff coding of dc >> al
        s = reader.decode_huff(huff[(0, c["td"])])
        diff = _extend(reader.receive(s), s) if s else 0
        preds[c["id"]] += diff
        zz[0] = preds[c["id"]] << al
    elif reader.read_bit():  # refinement: one bit per block
        zz[0] = int(zz[0]) | (1 << al)


def _prog_ac(reader, zz, ss, se, ah, al, act, eobrun):
    """AC band of one block; returns the remaining EOB run."""
    if ah:
        return _prog_ac_refine(reader, zz, ss, se, al, act, eobrun)
    if eobrun:  # block entirely inside a pending EOB run
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_huff(act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1  # EOBn: run of (1<<r)+ext blocks,
            if r:                  # current block included
                eobrun += reader.receive(r)
            return eobrun
        k += r
        if k > se:
            raise ValueError("JPEG AC index overflow")
        zz[k] = _extend(reader.receive(s), s) << al
        k += 1
    return 0


def _prog_ac_refine(reader, zz, ss, se, al, act, eobrun):
    """Successive-approximation AC refinement (T.81 G.1.2.3 decode /
    libjpeg decode_mcu_AC_refine shape): newly-nonzero coefficients
    arrive as ±1<<al with runs counted over zero-HISTORY positions;
    every nonzero-history position traversed (including the whole
    band of blocks inside an EOB run) consumes one correction bit."""
    p1, m1 = 1 << al, -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_huff(act)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:  # EOBn: finish this block in the tail below
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break
                # r == 15: ZRL — skip 16 zero-history positions
            else:
                if s != 1:
                    raise ValueError("bad JPEG refinement magnitude")
                val = p1 if reader.read_bit() else m1
            while k <= se:
                if zz[k] != 0:
                    if reader.read_bit() and (int(zz[k]) & p1) == 0:
                        zz[k] += p1 if zz[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if zz[k] != 0:
                if reader.read_bit() and (int(zz[k]) & p1) == 0:
                    zz[k] += p1 if zz[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct_progressive(comps, coef, w, h, qt):
    """Accumulated zigzag coefficients → dequantized planes (same
    output contract as ``_decode_scan``): vectorized dequant + IDCT
    over every block, then the shared upsample/crop."""
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    out = []
    for c, zz in zip(comps, coef):
        if c["tq"] not in qt:
            raise ValueError(f"missing quant table {c['tq']}")
        q = qt[c["tq"]].astype(np.float64)  # natural order
        bh, bw = zz.shape[:2]
        nat = np.zeros((bh, bw, 64), np.float64)
        nat[:, :, ZIGZAG] = zz.astype(np.float64)
        nat *= q[None, None, :]
        pix = np.einsum(
            "kn,yxnm,ml->yxkl", _IDCT_L, nat.reshape(bh, bw, 8, 8), _A
        )
        plane = pix.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        out.append((c, _finish_plane(plane, c, hmax, vmax, w, h)))
    return out


def _assemble(scan, w, h) -> np.ndarray:
    if len(scan) == 1:
        return scan[0][1].round().clip(0, 255).astype(np.uint8)[:, :, None]
    y = scan[0][1]
    cb = scan[1][1] - 128.0
    cr = scan[2][1] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return rgb.round().clip(0, 255).astype(np.uint8)


# ---------------------------------------------------------------- encode


class _BitWriter:
    __slots__ = ("out", "buf", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.buf = (self.buf << 1) | ((code >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                b = self.buf & 0xFF
                self.out.append(b)
                if b == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self.buf = 0
                self.nbits = 0

    def flush(self) -> None:
        while self.nbits:  # pad with 1-bits (T.81 F.1.2.3)
            self.write(1, 1)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


def _cat(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(
    bw: _BitWriter, coeff_q: np.ndarray, pred: int,
    dc_enc: dict, ac_enc: dict,
) -> int:
    zz = coeff_q[ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    s = _cat(diff)
    code, length = dc_enc[s]
    bw.write(code, length)
    if s:
        bits = diff if diff >= 0 else diff + (1 << s) - 1
        bw.write(bits, s)
    last_nz = int(np.nonzero(zz)[0].max()) if np.any(zz) else 0
    k = 1
    while k <= last_nz:
        run = 0
        while int(zz[k]) == 0:
            run += 1
            k += 1
        while run > 15:
            code, length = ac_enc[0xF0]
            bw.write(code, length)
            run -= 16
        v = int(zz[k])
        s = _cat(v)
        code, length = ac_enc[(run << 4) | s]
        bw.write(code, length)
        bits = v if v >= 0 else v + (1 << s) - 1
        bw.write(bits, s)
        k += 1
    if last_nz < 63:
        code, length = ac_enc[0x00]  # EOB
        bw.write(code, length)
    return dc


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) float plane (already level-shifted) → (H/8, W/8, 64)
    row-major quantized coefficients."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    coeff = np.einsum("kn,yxnm,ml->yxkl", _A, blocks, _A.T)
    qm = q.reshape(8, 8).astype(np.float64)
    return np.round(coeff / qm).astype(np.int64).reshape(by, bx, 64)


def _pad_to(img: np.ndarray, my: int, mx: int) -> np.ndarray:
    h, w = img.shape[:2]
    ph = (my - h % my) % my
    pw = (mx - w % mx) % mx
    if ph or pw:
        img = np.pad(img, ((0, ph), (0, pw)) + ((0, 0),) * (img.ndim - 2),
                     mode="edge")
    return img


def _plan_encode(img, quality, subsample):
    """Shared encoder front half (baseline + progressive writers):
    color convert, chroma subsample, MCU-aligned edge pad, FDCT +
    quantization. Returns (coeffs, samp, gray, qy, qc, w, h, mcux,
    mcuy) where coeffs[ci] is (blocks_y, blocks_x, 64) natural-order
    quantized coefficients on the component's full padded grid."""
    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2 or img.shape[2] == 1
    if img.ndim == 2:
        img = img[:, :, None]
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qy = _quality_scale(QT_LUMA, quality)
    qc = _quality_scale(QT_CHROMA, quality)
    if gray:
        planes = [img[:, :, 0]]
        samp = [(1, 1)]
        qts = [qy]
    else:
        r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # pad to even, 2x2 box-average chroma
            y2 = _pad_to(y[:, :, None], 2, 2)[:, :, 0]
            cb2 = _pad_to(cb[:, :, None], 2, 2)[:, :, 0]
            cr2 = _pad_to(cr[:, :, None], 2, 2)[:, :, 0]
            cb = cb2.reshape(cb2.shape[0] // 2, 2, cb2.shape[1] // 2, 2).mean((1, 3))
            cr = cr2.reshape(cr2.shape[0] // 2, 2, cr2.shape[1] // 2, 2).mean((1, 3))
            y = y2
            planes = [y, cb, cr]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
        qts = [qy, qc, qc]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    # pad each plane to its own MCU-aligned block grid
    coeffs = []
    for p, (hs, vs), q in zip(planes, samp, qts):
        # plane dims must cover ceil(w/8hmax)*8hs × ceil(h/8vmax)*8vs
        tw = ((w + 8 * hmax - 1) // (8 * hmax)) * 8 * hs
        th = ((h + 8 * vmax - 1) // (8 * vmax)) * 8 * vs
        pp = np.pad(
            p,
            ((0, max(0, th - p.shape[0])), (0, max(0, tw - p.shape[1]))),
            mode="edge",
        )[:th, :tw]
        coeffs.append(_fdct_quant(pp - 128.0, q))
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    return coeffs, samp, gray, qy, qc, w, h, mcux, mcuy


def _write_headers(sof_marker, samp, gray, qy, qc, w, h, dhts,
                   restart_interval):
    """Shared JFIF header block for both writers: SOI + APP0 + DQT
    (zigzag order on the wire) + SOF + DHT segments + optional DRI.
    Returns (out bytearray, segment writer) so the caller appends its
    SOS/entropy data with the same framing."""
    out = bytearray(b"\xff\xd8")  # SOI

    def segment(marker: int, payload: bytes) -> None:
        out.extend(b"\xff" + bytes([marker]))
        out.extend((len(payload) + 2).to_bytes(2, "big"))
        out.extend(payload)

    segment(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    segment(0xDB, bytes([0x00]) + bytes(int(v) for v in qy[ZIGZAG]))
    if not gray:
        segment(0xDB, bytes([0x01]) + bytes(int(v) for v in qc[ZIGZAG]))
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof.append(len(samp))
    for ci, (hs, vs) in enumerate(samp):
        sof.extend([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    segment(sof_marker, bytes(sof))
    for tc, th, bits, vals in dhts:
        segment(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    if restart_interval:
        segment(0xDD, int(restart_interval).to_bytes(2, "big"))
    return out, segment


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(H, W, 3) RGB or (H, W)/(H, W, 1) grayscale uint8 → baseline
    JFIF bytes. ``subsample=True`` writes 4:2:0 (2×2 luma MCUs);
    ``restart_interval`` > 0 writes a DRI segment and RSTn markers
    every that many MCUs — both exist primarily to pin the decoder's
    MCU-interleave and restart paths in tests."""
    coeffs, samp, gray, qy, qc, w, h, mcux, mcuy = _plan_encode(
        img, quality, subsample
    )
    ncomp = len(coeffs)

    dc_y_enc = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_y_enc = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c_enc = _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c_enc = _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)
    enc_tabs = [(dc_y_enc, ac_y_enc)] + [(dc_c_enc, ac_c_enc)] * (ncomp - 1)

    dhts = [(0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
            (1, 0, AC_LUMA_BITS, AC_LUMA_VALS)]
    if not gray:
        dhts += [(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
                 (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)]
    out, segment = _write_headers(
        0xC0, samp, gray, qy, qc, w, h, dhts, restart_interval
    )
    # SOS
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        sos.extend([ci + 1, 0x00 if ci == 0 else 0x11])
    sos.extend([0, 63, 0])
    segment(0xDA, bytes(sos))

    bw = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.flush()
            out.extend(bw.out)
            bw = _BitWriter()
            out.extend(b"\xff" + bytes([0xD0 + (rst % 8)]))
            rst += 1
            preds = [0] * ncomp
        my, mx = divmod(mcu, mcux)
        for ci, ((hs, vs), cf) in enumerate(zip(samp, coeffs)):
            dc_enc, ac_enc = enc_tabs[ci]
            for by in range(vs):
                for bx in range(hs):
                    block = cf[my * vs + by, mx * hs + bx]
                    preds[ci] = _encode_block(
                        bw, block, preds[ci], dc_enc, ac_enc
                    )
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


# ------------------------------------------------- progressive encode


def _flush_eobrun(bw: _BitWriter, ac_enc: dict, state: dict) -> None:
    """Emit the pending EOBn symbol (+ extension bits) and then the
    correction bits buffered across the run — the exact order the
    refinement decoder consumes them (EOBn first, then each run
    block's nonzero-history bits in block order)."""
    if state["eob"]:
        n = state["eob"].bit_length() - 1
        code, length = ac_enc[n << 4]
        bw.write(code, length)
        if n:
            bw.write(state["eob"] - (1 << n), n)
        state["eob"] = 0
    for bit in state["be"]:
        bw.write(bit, 1)
    state["be"] = []


def _enc_ac_first(bw, zz, ss, se, al, ac_enc, state) -> None:
    """First AC pass for one block's band: code sign(v)*(|v|>>al)
    with run/size symbols; all-zero bands accumulate into EOBn runs
    (T.81 G.1.2.2 / libjpeg encode_mcu_AC_first shape)."""
    vals = []
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = (abs(v) >> al)
        vals.append(-t if v < 0 else t)
    if not any(vals):
        state["eob"] += 1
        if state["eob"] == 0x7FFF:
            _flush_eobrun(bw, ac_enc, state)
        return
    _flush_eobrun(bw, ac_enc, state)
    last_nz = max(i for i, v in enumerate(vals) if v)
    r = 0
    for i in range(last_nz + 1):
        v = vals[i]
        if v == 0:
            r += 1
            continue
        while r > 15:
            code, length = ac_enc[0xF0]  # ZRL
            bw.write(code, length)
            r -= 16
        s = _cat(v)
        code, length = ac_enc[(r << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        r = 0
    if last_nz < se - ss:  # trailing zeros → this block joins an EOB run
        state["eob"] += 1
        if state["eob"] == 0x7FFF:
            _flush_eobrun(bw, ac_enc, state)


def _enc_ac_refine(bw, zz, ss, se, al, ac_enc, state) -> None:
    """AC refinement pass for one block's band (T.81 G.1.2.3 /
    libjpeg encode_mcu_AC_refine shape): newly-nonzero coefficients
    ((|v|>>al) == 1) emit run/1 symbols + a sign bit, with runs
    counted over zero-history positions only; already-nonzero
    positions buffer one correction bit (bit al of |v|) that goes out
    after the next emitted symbol — or rides the EOB-run buffer."""
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob_at = 0  # band offset just past the last newly-nonzero coef
    for i, t in enumerate(absv):
        if t == 1:
            eob_at = i + 1
    r, br = 0, []
    for i, t in enumerate(absv):
        if t == 0:
            r += 1
            continue
        while r > 15 and i < eob_at:  # ZRLs not foldable into the EOB
            _flush_eobrun(bw, ac_enc, state)
            code, length = ac_enc[0xF0]
            bw.write(code, length)
            r -= 16
            for bit in br:
                bw.write(bit, 1)
            br = []
        if t > 1:  # history-nonzero: correction bit only
            br.append(t & 1)
            continue
        _flush_eobrun(bw, ac_enc, state)
        code, length = ac_enc[(r << 4) | 1]
        bw.write(code, length)
        bw.write(1 if int(zz[ss + i]) >= 0 else 0, 1)
        for bit in br:
            bw.write(bit, 1)
        br = []
        r = 0
    if r > 0 or br:  # trailing zeros/bits → join an EOB run
        state["eob"] += 1
        state["be"].extend(br)
        if state["eob"] == 0x7FFF or len(state["be"]) > 900:
            _flush_eobrun(bw, ac_enc, state)


def encode_jpeg_progressive(
    img: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """(H, W, 3) RGB or (H, W)/(H, W, 1) grayscale uint8 →
    progressive (SOF2) JFIF bytes. Scan script: interleaved DC at
    Al=1, per-component AC bands 1-5 then 6-63 at Al=1, then the
    matching refinement scans down to Al=0 — so the stream exercises
    spectral selection, successive approximation (first + refine, DC
    + AC), EOB runs and ZRL, and carries the SAME quantized
    coefficients as ``encode_jpeg`` at equal quality (decode is
    bit-identical). AC scans use a flat all-symbol Huffman table
    because the Annex K tables lack EOBn symbols."""
    coeffs, samp, gray, qy, qc, w, h, mcux, mcuy = _plan_encode(
        img, quality, subsample
    )
    ncomp = len(coeffs)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    czz = [cf[:, :, ZIGZAG] for cf in coeffs]  # zigzag-order blocks

    dc_y_enc = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    dc_c_enc = _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_flat = _build_encode_table(AC_FLAT_BITS, AC_FLAT_VALS)
    dc_tabs = [dc_y_enc] + [dc_c_enc] * (ncomp - 1)

    dhts = [(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)]
    if not gray:
        dhts.append((0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS))
    dhts.append((1, 0, AC_FLAT_BITS, AC_FLAT_VALS))
    out, segment = _write_headers(
        0xC2, samp, gray, qy, qc, w, h, dhts, restart_interval
    )

    def emit_scan(sos_payload: bytes, n_units: int, encode_unit) -> None:
        """One entropy-coded scan with restart segmentation: flush
        the EOB run + bit buffer and emit RSTn at every interval,
        resetting DC predictors (decoder mirrors via _parse_entropy)."""
        segment(0xDA, sos_payload)
        bw = _BitWriter()
        state = {"eob": 0, "be": [], "pred": [0] * ncomp}
        rst = 0
        for u in range(n_units):
            if restart_interval and u and u % restart_interval == 0:
                _flush_eobrun(bw, ac_flat, state)
                bw.flush()
                out.extend(bw.out)
                out.extend(b"\xff" + bytes([0xD0 + (rst % 8)]))
                rst += 1
                bw = _BitWriter()
                state = {"eob": 0, "be": [], "pred": [0] * ncomp}
            encode_unit(bw, state, u)
        _flush_eobrun(bw, ac_flat, state)
        bw.flush()
        out.extend(bw.out)

    def dc_unit(ah: int, al: int):
        def enc(bw, state, mcu):
            my, mx = divmod(mcu, mcux)
            for ci, (hs, vs) in enumerate(samp):
                dc_enc = dc_tabs[ci]
                for by in range(vs):
                    for bx in range(hs):
                        dc = int(czz[ci][my * vs + by, mx * hs + bx, 0])
                        if ah == 0:
                            diff = (dc >> al) - state["pred"][ci]
                            state["pred"][ci] = dc >> al
                            s = _cat(diff)
                            code, length = dc_enc[s]
                            bw.write(code, length)
                            if s:
                                bw.write(
                                    diff if diff >= 0 else diff + (1 << s) - 1, s
                                )
                        else:
                            bw.write((dc >> al) & 1, 1)
        return enc

    def dc_sos(ah: int, al: int) -> bytes:
        sos = bytearray([ncomp])
        for ci in range(ncomp):
            sos.extend([ci + 1, (0 if ci == 0 else 1) << 4])
        sos.extend([0, 0, (ah << 4) | al])
        return bytes(sos)

    def ac_scan(ci: int, ss: int, se: int, ah: int, al: int) -> None:
        hs, vs = samp[ci]
        # single-component scans walk the component's OWN block grid
        # (only blocks covering real samples), not the padded MCU grid
        cbw = ((w * hs + hmax - 1) // hmax + 7) // 8
        cbh = ((h * vs + vmax - 1) // vmax + 7) // 8
        enc_block = _enc_ac_refine if ah else _enc_ac_first

        def enc(bw, state, u):
            by, bx = divmod(u, cbw)
            enc_block(bw, czz[ci][by, bx], ss, se, al, ac_flat, state)

        sos = bytes([1, ci + 1, 0x00, ss, se, (ah << 4) | al])
        emit_scan(sos, cbw * cbh, enc)

    # scan script: DC first (Al=1), AC bands first (Al=1), then the
    # refinement scans down to Al=0 (DC then AC, per T.81 G.1.1.1.1
    # ordering constraints: a band's first scan precedes its refines)
    emit_scan(dc_sos(0, 1), mcux * mcuy, dc_unit(0, 1))
    for ci in range(ncomp):
        ac_scan(ci, 1, 5, 0, 1)
        ac_scan(ci, 6, 63, 0, 1)
    emit_scan(dc_sos(1, 0), mcux * mcuy, dc_unit(1, 0))
    for ci in range(ncomp):
        ac_scan(ci, 1, 5, 1, 0)
        ac_scan(ci, 6, 63, 1, 0)

    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)
