"""GIF (87a/89a) codec in pure Python + numpy — no PIL.

Completes the web-crawl image-codec set (BMP/PNG/JPEG already real):
GIF is the remaining ubiquitous crawl format, and its LZW variant is
small enough to implement exactly — variable-width codes (LSB-first bit
packing), CLEAR/EOI handling, dictionary growth to 12 bits, deferred
clear. Supported: global and local color tables, multiple image frames
(animated GIFs — every frame is decoded), interlaced frames
(deinterlace pass), GCE/comment/application extension skipping.

The encoder (tests + payload synthesis only) writes single- or
multi-frame GIFs with a 256-entry palette and the always-9-bit LZW
stream (CLEAR emitted before every pixel code — valid per spec, keeps
the code width fixed), so decoder dictionary growth is exercised by the
decoder tests against *real-world-shaped* streams synthesized with the
growing-dictionary writer below.

Scale: decode runs inside Arrow-batched ``mapInPandas``
(multimodal.decode_gif) — embarrassingly parallel, no shuffle; one
payload never crosses executors.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# bit streams (GIF LZW is LSB-first, unlike JPEG's MSB-first huffman)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read(self, n: int) -> int:
        out = 0
        for i in range(n):
            if self.pos >= len(self.data):
                raise ValueError("LZW stream truncated")
            out |= ((self.data[self.pos] >> self.bit) & 1) << i
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.bit = 0

    def write(self, code: int, n: int) -> None:
        for i in range(n):
            self.cur |= ((code >> i) & 1) << self.bit
            self.bit += 1
            if self.bit == 8:
                self.out.append(self.cur)
                self.cur = 0
                self.bit = 0

    def finish(self) -> bytes:
        if self.bit:
            self.out.append(self.cur)
        return bytes(self.out)


# ---------------------------------------------------------------------------
# LZW


def lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """GIF LZW decompression to exactly ``n_pixels`` palette indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    rd = _BitReader(data)
    out = np.empty(n_pixels, dtype=np.uint8)
    npix = 0

    def reset() -> tuple[list[bytes | None], int]:
        table: list[bytes | None] = [bytes([i]) for i in range(clear)] + [None, None]
        return table, min_code_size + 1

    table, width = reset()
    prev: bytes | None = None
    while npix < n_pixels:
        code = rd.read(width)
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"bad LZW code {code}")
        take = min(len(entry), n_pixels - npix)
        out[npix : npix + take] = np.frombuffer(entry[:take], dtype=np.uint8)
        npix += take
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if npix != n_pixels:
        raise ValueError("LZW underrun")
    return out


def lzw_encode(min_code_size: int, pixels: "np.ndarray") -> bytes:
    """Real growing-dictionary GIF LZW encoder (greedy longest-match)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    wr = _BitWriter()

    def reset() -> tuple[dict[bytes, int], int, int]:
        return {bytes([i]): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, nxt, width = reset()
    wr.write(clear, width)
    buf = b""
    for p in pixels.astype(np.uint8).tobytes():
        cand = buf + bytes([p])
        if cand in table:
            buf = cand
            continue
        wr.write(table[buf], width)
        if nxt < 4096:
            table[cand] = nxt
            if nxt == (1 << width) and width < 12:
                width += 1
            nxt += 1
        else:
            wr.write(clear, width)
            table, nxt, width = reset()
        buf = bytes([p])
    if buf:
        wr.write(table[buf], width)
    wr.write(eoi, width)
    return wr.finish()


# ---------------------------------------------------------------------------
# container


def _sub_blocks(data: bytes) -> bytes:
    """Split payload into <=255-byte length-prefixed sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


_DEINTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_decode(buf: bytes) -> tuple[int, int, list[np.ndarray]]:
    """Decode every frame: returns (width, height, [frame (h, w, 3) RGB]).

    Frames are decoded independently at their own (left, top, w, h)
    placement onto the logical screen, composited over the previous frame
    (disposal methods beyond 'draw over' are not distinguished — fine for
    feature extraction). The Graphic Control Extension's transparency
    flag IS honored: pixels matching the frame's transparent color index
    are skipped during compositing, so they show the previous frame's
    pixels instead of the palette's opaque RGB (GIF89a spec §23)."""
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not GIF")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", buf[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(buf[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    screen = np.zeros((sh, sw, 3), dtype=np.uint8)
    frames: list[np.ndarray] = []
    transparent = None  # GCE transparent color index for the NEXT image
    while pos < len(buf):
        b = buf[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: parse GCE transparency, skip the rest
            label = buf[pos + 1]
            if label == 0xF9 and buf[pos + 2] >= 4:
                gce_flags = buf[pos + 3]
                transparent = buf[pos + 6] if gce_flags & 0x01 else None
            pos += 2
            while buf[pos] != 0:
                pos += 1 + buf[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected block 0x{b:02x}")
        left, top, w, h, iflags = struct.unpack("<HHHHB", buf[pos + 1 : pos + 10])
        pos += 10
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 7)
            ct = np.frombuffer(buf[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("no color table")
        min_code = buf[pos]
        pos += 1
        data = bytearray()
        while buf[pos] != 0:
            ln = buf[pos]
            data.extend(buf[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        pos += 1
        idx = lzw_decode(min_code, bytes(data), w * h).reshape(h, w)
        if iflags & 0x40:  # interlaced: rows arrive in 4 passes
            rows = []
            for start, step in _DEINTERLACE_PASSES:
                rows.extend(range(start, h, step))
            de = np.empty_like(idx)
            de[rows] = idx
            idx = de
        rgb = ct[np.minimum(idx, len(ct) - 1)]
        if transparent is not None:
            region = screen[top : top + h, left : left + w]
            opaque = idx != transparent
            region[opaque] = rgb[opaque]
        else:
            screen[top : top + h, left : left + w] = rgb
        transparent = None  # a GCE applies only to the image that follows
        frames.append(screen.copy())
    if not frames:
        raise ValueError("no frames")
    return sw, sh, frames


def gif_encode(
    frames: "list[np.ndarray]",
    palette: "np.ndarray",
    transparent_idx: "list[int | None] | None" = None,
) -> bytes:
    """Encode (h, w) palette-index frames with a shared global color
    table (palette: (n<=256, 3) uint8) as GIF89a. Test/synthesis path.
    ``transparent_idx[i]`` (optional, per frame) emits a Graphic Control
    Extension marking that palette index transparent for frame i."""
    h, w = frames[0].shape
    n = max(2, 1 << int(np.ceil(np.log2(max(len(palette), 2)))))
    pal = np.zeros((n, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    bits = max(int(np.log2(n)), 1)
    out = bytearray(b"GIF89a")
    out.extend(struct.pack("<HHBBB", w, h, 0x80 | (bits - 1), 0, 0))
    out.extend(pal.tobytes())
    min_code = max(bits, 2)
    for i, fr in enumerate(frames):
        t = transparent_idx[i] if transparent_idx else None
        if t is not None:
            # GCE: label 0xF9, block size 4, flags bit0 = transparency
            out.extend(struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0x01, 0, t, 0))
        out.extend(struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0))
        out.append(min_code)
        out.extend(_sub_blocks(lzw_encode(min_code, fr.ravel())))
    out.append(0x3B)
    return bytes(out)
