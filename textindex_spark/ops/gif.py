"""GIF codec — stdlib + numpy only (LZW, palettes, animation).

REAL decode for GIF87a/GIF89a: variable-width LSB-first LZW,
global + local color tables, interlaced images, transparency, frame
delays and all three disposal methods — the full compositing model,
so ``decode_gif`` returns the same fully-composed RGB frames a
browser shows. The encoder writes a real LZW-compressed GIF89a
(graphic-control delays, optional loop extension) as the
deterministic synthetic writer for tests and ``resize_images``
re-encode; it requires ≤256 distinct colors across the animation
(a real quantizer needs an imaging library — callers with richer
frames re-encode as PNG instead).

GIF is the one *animation* container the standard library can fully
parse, which makes ``ops.multimodal.sample_frames`` real for it: the
frame-sampling kernel decodes actual frames at actual timestamps
instead of the deterministic fake it must still use for ffmpeg-class
video. Same per-blob/numpy contract as ``ops.jpeg`` — no Spark
dependency here; the distributed plumbing lives in
``ops.multimodal``.

Reference parity note: the reference engine (thscharler/textindex)
has no media path — this is training-data-pipeline extension
surface (SURVEY.md §2.8), not a reference port.
"""
from __future__ import annotations

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------- LZW


def _lzw_decode(min_code_size: int, data: bytes, max_pixels: int) -> np.ndarray:
    """GIF LZW (LSB-first, variable width, CLEAR/EOI) → index array."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # dictionary as (prefix_code, tail_byte); roots are implicit
    prefix = np.full(4096, -1, np.int32)
    tail = np.zeros(4096, np.uint8)
    next_code = eoi + 1
    out = np.empty(max_pixels, np.uint8)
    n_out = 0
    buf = nbits = 0
    pos = 0
    prev = -1
    stack = bytearray()
    while True:
        while nbits < width:
            if pos >= len(data):
                return out[:n_out]  # truncated: return what we have
            buf |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = buf & ((1 << width) - 1)
        buf >>= width
        nbits -= width
        if code == clear:
            next_code = eoi + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code == eoi:
            return out[:n_out]
        if prev < 0:
            if code >= clear:
                raise ValueError("bad GIF LZW start code")
            out[n_out] = code
            n_out += 1
            prev = code
            continue
        if code < next_code:
            cur = code
        elif code == next_code and next_code < 4096:
            # the KwKwK case: emit prev's string + its first byte
            cur = prev
        else:
            raise ValueError("bad GIF LZW code")
        stack.clear()
        c = cur
        while c >= clear:
            stack.append(tail[c])
            c = prefix[c]
        first = c
        stack.append(first)
        if code == next_code:
            stack.insert(0, first)
        ln = len(stack)
        if n_out + ln > max_pixels:
            ln = max_pixels - n_out
        for i in range(ln):
            out[n_out + i] = stack[-1 - i]
        n_out += ln
        if n_out >= max_pixels:
            return out
        if next_code < 4096:
            prefix[next_code] = prev
            tail[next_code] = stack[-1]  # first byte of current string
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code


def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    """Real LZW compression (dict growth, CLEAR on overflow)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    buf = nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    emit(clear, width)
    prev = -1
    for v in indices:
        v = int(v)
        if prev < 0:
            prev = v
            continue
        key = (prev, v)
        code = table.get(key)
        if code is not None:
            prev = code
            continue
        emit(prev, width)
        if next_code < 4096:
            table[key] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table.clear()
            width = min_code_size + 1
            next_code = eoi + 1
        prev = v
    if prev >= 0:
        emit(prev, width)
    emit(eoi, width)
    if nbits:
        out.append(buf & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------- decode


def decode_gif(blob: bytes) -> tuple[list[np.ndarray], list[int]]:
    """GIF bytes → (frames, delays_ms): fully composited (H, W, 3)
    uint8 RGB frames with per-frame delays in ms. Raises ValueError
    on anything that is not a well-formed GIF (uniform error contract
    with the other decoders)."""
    if not blob or len(blob) < 13 or blob[:4] != b"GIF8" or blob[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF stream")
    w = int.from_bytes(blob[6:8], "little")
    h = int.from_bytes(blob[8:10], "little")
    flags = blob[10]
    bg_idx = blob[11]
    pos = 13
    gct: np.ndarray | None = None
    if flags & 0x80:
        sz = 2 << (flags & 0x07)
        if pos + 3 * sz > len(blob):
            raise ValueError("truncated GIF global color table")
        gct = np.frombuffer(blob[pos : pos + 3 * sz], np.uint8).reshape(sz, 3)
        pos += 3 * sz
    if w == 0 or h == 0:
        raise ValueError("empty GIF canvas")

    if gct is not None and bg_idx < len(gct):
        canvas = np.tile(gct[bg_idx], (h, w, 1)).astype(np.uint8)
    else:
        canvas = np.zeros((h, w, 3), np.uint8)
    frames: list[np.ndarray] = []
    delays: list[int] = []
    # pending graphic-control state
    delay_ms = 0
    transparent = -1
    disposal = 0
    n = len(blob)
    while pos < n:
        b = blob[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if pos + 2 > n:
                raise ValueError("truncated GIF extension")
            label = blob[pos + 1]
            pos += 2
            if label == 0xF9:  # graphic control
                if pos + 6 > n or blob[pos] < 4:
                    raise ValueError("bad GIF graphic control block")
                packed = blob[pos + 1]
                disposal = (packed >> 2) & 0x07
                delay_ms = int.from_bytes(blob[pos + 2 : pos + 4], "little") * 10
                transparent = blob[pos + 4] if packed & 0x01 else -1
                pos += 1 + blob[pos]
            # skip (remaining) sub-blocks
            while pos < n and blob[pos]:
                pos += 1 + blob[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"bad GIF block 0x{b:02X}")
        # image descriptor
        if pos + 10 > n:
            raise ValueError("truncated GIF image descriptor")
        ix = int.from_bytes(blob[pos + 1 : pos + 3], "little")
        iy = int.from_bytes(blob[pos + 3 : pos + 5], "little")
        iw = int.from_bytes(blob[pos + 5 : pos + 7], "little")
        ih = int.from_bytes(blob[pos + 7 : pos + 9], "little")
        iflags = blob[pos + 9]
        pos += 10
        ct = gct
        if iflags & 0x80:
            sz = 2 << (iflags & 0x07)
            if pos + 3 * sz > n:
                raise ValueError("truncated GIF local color table")
            ct = np.frombuffer(blob[pos : pos + 3 * sz], np.uint8).reshape(sz, 3)
            pos += 3 * sz
        if ct is None:
            raise ValueError("GIF image without any color table")
        if iw == 0 or ih == 0:
            raise ValueError("empty GIF frame")
        if ix + iw > w or iy + ih > h:
            raise ValueError("GIF frame exceeds canvas")
        if pos >= n:
            raise ValueError("truncated GIF image data")
        min_code_size = blob[pos]
        pos += 1
        if not 2 <= min_code_size <= 11:
            raise ValueError(f"bad GIF LZW min code size {min_code_size}")
        chunks = []
        while pos < n and blob[pos]:
            ln = blob[pos]
            chunks.append(blob[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1  # block terminator
        idx = _lzw_decode(min_code_size, b"".join(chunks), iw * ih)
        if len(idx) < iw * ih:  # pad truncated data with background
            idx = np.concatenate([idx, np.zeros(iw * ih - len(idx), np.uint8)])
        grid = idx.reshape(ih, iw)
        if iflags & 0x40:  # interlaced → natural row order
            un = np.empty_like(grid)
            r = 0
            for start, step in _INTERLACE_PASSES:
                rows = range(start, ih, step)
                for y in rows:
                    un[y] = grid[r]
                    r += 1
            grid = un
        if int(grid.max(initial=0)) >= len(ct):
            raise ValueError("GIF pixel index outside color table")
        saved = canvas.copy() if disposal == 3 else None
        region = canvas[iy : iy + ih, ix : ix + iw]
        px = ct[grid]
        if transparent >= 0:
            mask = (grid != transparent)[:, :, None]
            region[...] = np.where(mask, px, region)
        else:
            region[...] = px
        frames.append(canvas.copy())
        delays.append(delay_ms)
        if disposal == 2:  # restore background
            # bg_idx indexes the GLOBAL color table (GIF89a §18) — a
            # frame-local table may be smaller than bg_idx
            bg = (
                gct[bg_idx]
                if gct is not None and bg_idx < len(gct)
                else np.zeros(3, np.uint8)
            )
            canvas[iy : iy + ih, ix : ix + iw] = bg
        elif disposal == 3 and saved is not None:
            canvas = saved
        delay_ms, transparent, disposal = 0, -1, 0
    if not frames:
        raise ValueError("GIF contains no image frames")
    return frames, delays


# ---------------------------------------------------------------- encode


def _frame_palette(frame: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """One frame → (palette ≤256×3, index grid). Lossless when the
    frame has ≤256 distinct colors; otherwise deterministic
    quantization: keep the 256 most frequent colors (count desc, RGB
    asc tiebreak) and map every other color to its nearest kept color
    (squared-RGB distance, lowest index on ties)."""
    h, w = frame.shape[:2]
    flat = frame.reshape(-1, 3)
    pal, inv, cnt = np.unique(
        flat, axis=0, return_inverse=True, return_counts=True
    )
    if len(pal) <= 256:
        return pal, inv.astype(np.uint8).reshape(h, w)
    # count-tie break by a deterministic color hash, NOT by RGB order:
    # an all-unique-color frame (every count 1) would otherwise keep
    # the 256 lexicographically smallest colors — one corner of the
    # cube — instead of a spread sample
    p32 = pal.astype(np.uint64)
    chash = (p32[:, 0] * 73856093) ^ (p32[:, 1] * 19349663) ^ (
        p32[:, 2] * 83492791
    )
    order = np.lexsort((chash, -cnt))  # count desc, then hash spread
    kept = pal[np.sort(order[:256])]
    k32 = kept.astype(np.int32)
    remap = np.empty(len(pal), np.uint8)
    for s in range(0, len(pal), 4096):  # bound the distance matrix
        blk = pal[s : s + 4096].astype(np.int32)
        d = ((blk[:, None, :] - k32[None, :, :]) ** 2).sum(-1)
        remap[s : s + 4096] = d.argmin(1).astype(np.uint8)
    return kept, remap[inv].reshape(h, w)


def encode_gif(
    frames: list[np.ndarray] | np.ndarray,
    delays_ms: list[int] | int = 100,
    loop: bool = True,
    interlace: bool = False,
) -> bytes:
    """(H, W, 3) uint8 frame list → GIF89a bytes (real LZW).

    Palette strategy, lossless-first: one GLOBAL table when the
    frames' combined distinct colors fit 256 (exact round-trip);
    otherwise per-frame LOCAL color tables (GIF89a allows one per
    image — real multi-palette animations decode to >256 combined
    colors, so a single-GCT encoder could never re-encode them); a
    frame that alone exceeds 256 colors is quantized
    deterministically to its 256 most frequent colors with
    nearest-RGB mapping (no imaging library)."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise ValueError("no frames")
    if isinstance(delays_ms, int):
        delays_ms = [delays_ms] * len(frames)
    h, w = frames[0].shape[:2]
    stack = np.concatenate([f.reshape(-1, 3) for f in frames])
    palette, inverse = np.unique(stack, axis=0, return_inverse=True)
    use_global = len(palette) <= 256
    out = bytearray(b"GIF89a")
    out.extend(w.to_bytes(2, "little") + h.to_bytes(2, "little"))
    if use_global:
        pbits = max(1, int(len(palette) - 1).bit_length())
        psize = 1 << pbits
        out.append(0x80 | (pbits - 1))  # GCT present
        out.extend([0, 0])  # background index, aspect
        pal = np.zeros((psize, 3), np.uint8)
        pal[: len(palette)] = palette
        out.extend(pal.tobytes())
    else:
        out.extend([0, 0, 0])  # no GCT: flags, bg, aspect
    if loop and len(frames) > 1:  # NETSCAPE2.0 loop-forever
        out.extend(b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00")
    off = 0
    for f, delay in zip(frames, delays_ms):
        if f.shape[:2] != (h, w):
            raise ValueError("all GIF frames must share the canvas size")
        if use_global:
            idx = inverse[off : off + h * w].astype(np.uint8).reshape(h, w)
            off += h * w
            fpal, pbits = None, max(1, int(len(palette) - 1).bit_length())
        else:
            fpal, idx = _frame_palette(f)
            pbits = max(1, int(len(fpal) - 1).bit_length())
        min_code = max(2, pbits)
        # graphic control: disposal=1 (leave), no transparency
        out.extend(b"\x21\xf9\x04\x04")
        out.extend((max(0, int(delay)) // 10).to_bytes(2, "little"))
        out.extend(b"\x00\x00")
        out.append(0x2C)
        out.extend(b"\x00\x00\x00\x00")
        out.extend(w.to_bytes(2, "little") + h.to_bytes(2, "little"))
        flags = 0x40 if interlace else 0x00
        if fpal is not None:
            out.append(flags | 0x80 | (pbits - 1))  # local color table
            lpal = np.zeros((1 << pbits, 3), np.uint8)
            lpal[: len(fpal)] = fpal
            out.extend(lpal.tobytes())
        else:
            out.append(flags)
        if interlace:
            rows = []
            for start, step in _INTERLACE_PASSES:
                rows.extend(range(start, h, step))
            idx = idx[rows]
        out.append(min_code)
        data = _lzw_encode(min_code, idx.reshape(-1))
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out.extend(chunk)
        out.append(0)
    out.append(0x3B)
    return bytes(out)
