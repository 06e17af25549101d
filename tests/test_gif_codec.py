"""GIF codec pins: LZW round-trips, container walk, interlace, stage."""

from __future__ import annotations

import struct
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from sdc_spark.operators.gif import (
    _sub_blocks,
    gif_decode,
    gif_encode,
    lzw_decode,
    lzw_encode,
)


def test_lzw_roundtrip_shapes():
    rng = np.random.default_rng(11)
    for n, mcs in [(1, 2), (7, 3), (4096, 8), (70000, 8)]:
        px = rng.integers(0, 1 << mcs, n).astype(np.uint8)
        assert np.array_equal(lzw_decode(mcs, lzw_encode(mcs, px), n), px)
    # repetitive input exercises KwKwK and the 12-bit dictionary ceiling
    px = np.tile(np.arange(4, dtype=np.uint8), 5000)
    enc = lzw_encode(2, px)
    assert np.array_equal(lzw_decode(2, enc, px.size), px)
    assert len(enc) < px.size // 4  # it actually compresses


def test_container_multiframe_roundtrip():
    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (256, 3)).astype(np.uint8)
    frames = [rng.integers(0, 256, (9, 14)).astype(np.uint8) for _ in range(4)]
    w, h, out = gif_decode(gif_encode(frames, pal))
    assert (w, h, len(out)) == (14, 9, 4)
    for fr, o in zip(frames, out):
        assert np.array_equal(o, pal[fr])


def test_interlaced_frame():
    """Hand-built GIF89a with the interlace flag: rows stored in the 4
    interlace passes must come back in display order."""
    h, w = 11, 5
    pal = np.zeros((4, 3), np.uint8)
    pal[:, 0] = [0, 60, 120, 180]
    img = (np.arange(h, dtype=np.uint8) % 4)[:, None].repeat(w, axis=1)
    passes = [r for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)) for r in range(start, h, step)]
    stored = img[passes]  # pass order on the wire
    buf = bytearray(b"GIF89a")
    buf.extend(struct.pack("<HHBBB", w, h, 0x80 | 1, 0, 0))  # 4-entry GCT
    buf.extend(pal.tobytes())
    buf.extend(struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40))  # interlaced
    buf.append(2)  # min code size
    buf.extend(_sub_blocks(lzw_encode(2, stored.ravel())))
    buf.append(0x3B)
    _, _, out = gif_decode(bytes(buf))
    assert np.array_equal(out[0], pal[img])


def test_extension_blocks_skipped():
    pal = np.array([[9, 8, 7], [1, 2, 3]], np.uint8)
    frame = np.zeros((2, 2), np.uint8)
    buf = bytearray(gif_encode([frame], pal))
    # splice a GCE and a comment extension before the image descriptor
    idx = buf.index(0x2C, 13 + 6)
    ext = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0]) + bytes([0x21, 0xFE, 3]) + b"hi!" + b"\x00"
    buf[idx:idx] = ext
    w, h, out = gif_decode(bytes(buf))
    assert (w, h) == (2, 2) and np.array_equal(out[0][0, 0], pal[0])


def test_decode_gif_stage(spark):
    from sdc_spark.operators.multimodal import decode_gif

    pal = np.array([[10, 20, 30], [250, 0, 0]], np.uint8)
    good = gif_encode([np.zeros((3, 4), np.uint8), np.ones((3, 4), np.uint8)], pal)
    df = spark.createDataFrame([(0, good), (1, b"GIF89ajunk")], "id long, content binary")
    rows = {r.id: r for r in decode_gif(df).collect()}
    r = rows[0]
    assert (r.width, r.height, r.n_frames) == (4, 3, 2)
    assert (r.mean_r, r.mean_g, r.mean_b) == (130.0, 10.0, 15.0)
    assert rows[1].width is None


def test_gif_transparency_composites_previous_frame():
    """GCE transparency (GIF89a spec 23): transparent pixels in frame 2
    show frame 1's pixels, not the palette's opaque RGB at that index."""
    pal = np.array([[10, 20, 30], [200, 100, 50]], np.uint8)
    f1 = np.ones((2, 3), np.uint8)   # solid palette[1]
    f2 = np.zeros((2, 3), np.uint8)  # all index 0...
    f2[0, 0] = 1
    buf = gif_encode([f1, f2], pal, transparent_idx=[None, 0])
    _w, _h, frames = gif_decode(buf)
    # frame 1: solid color 1
    assert np.array_equal(frames[0][0, 0], pal[1])
    # frame 2: index-0 pixels are TRANSPARENT -> previous frame (color 1)
    # shows through everywhere; the lone opaque pixel is also color 1
    assert np.array_equal(frames[1], np.broadcast_to(pal[1], (2, 3, 3)))
    # same frames WITHOUT the GCE: index 0 is opaque palette RGB
    buf2 = gif_encode([f1, f2], pal)
    _w, _h, frames2 = gif_decode(buf2)
    assert np.array_equal(frames2[1][1, 2], pal[0])
