"""Pure-codec tests for operators/jpeg.py — pinned against an
INDEPENDENT brute-force O(N^4) DCT implementation (not the codec's own
matrix form), so encoder and decoder cannot share a bug."""

from __future__ import annotations

import numpy as np
import pytest

from sdc_spark.operators.jpeg import (
    QUANT_LUMA,
    _scale_quant,
    jpeg_decode,
    jpeg_encode,
)


def _ref_dct(block):
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        block[x, y]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            cu = np.sqrt(0.125) if u == 0 else 0.5
            cv = np.sqrt(0.125) if v == 0 else 0.5
            out[u, v] = cu * cv * s
    return out


def _ref_idct(coef):
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = np.sqrt(0.125) if u == 0 else 0.5
                    cv = np.sqrt(0.125) if v == 0 else 0.5
                    s += (
                        cu
                        * cv
                        * coef[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[x, y] = s
    return out


def test_gray_block_exact_vs_reference():
    """decode(encode(img)) must equal the analytically-computed
    quantization round-trip using the independent reference DCT."""
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (8, 8, 1)).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(img, quality=90))
    q = _scale_quant(QUANT_LUMA.reshape(8, 8), 90)
    coef = _ref_dct(img[..., 0].astype(float) - 128.0)
    exp = np.clip(
        np.round(_ref_idct(np.round(coef / q) * q) + 128.0), 0, 255
    ).astype(np.uint8)
    np.testing.assert_array_equal(dec[..., 0], exp)


def test_constant_color_lossless_at_q75():
    """quality 75 -> DC quant step 8 == DCT DC gain: constant blocks
    round-trip exactly, including edge-padded non-multiple-of-8 sizes."""
    for val, shape in ((0, (8, 8)), (77, (11, 17)), (255, (24, 9))):
        img = np.full((*shape, 3), val, np.uint8)
        dec = jpeg_decode(jpeg_encode(img, quality=75))
        assert dec.shape == (*shape, 3)
        np.testing.assert_array_equal(dec, img)


def test_multi_mcu_roundtrip_close():
    """Multi-MCU random image: lossy but bounded (q90, smooth-ish)."""
    rng = np.random.RandomState(7)
    base = rng.randint(60, 196, (5, 7, 3))
    img = np.repeat(np.repeat(base, 8, axis=0), 8, axis=1).astype(np.uint8)
    dec = jpeg_decode(jpeg_encode(img, quality=90))
    assert dec.shape == img.shape
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 2.0


def test_unsupported_and_malformed_raise():
    with pytest.raises(ValueError):
        jpeg_decode(b"\x89PNG\r\n\x1a\n")
    img = np.full((8, 8, 1), 10, np.uint8)
    buf = bytearray(jpeg_encode(img))
    # flip SOF0 -> SOF1 (extended sequential): must refuse, not mis-decode
    i = buf.find(b"\xff\xc0")
    buf[i + 1] = 0xC1
    with pytest.raises(ValueError, match="SOF0"):
        jpeg_decode(bytes(buf))
    # a baseline stream relabeled SOF2 is NOT valid progressive (its one
    # scan claims the full spectral band for a DC pass) — loud, not garbage
    buf2 = bytearray(jpeg_encode(img))
    i = buf2.find(b"\xff\xc0")
    buf2[i + 1] = 0xC2
    with pytest.raises(ValueError, match="Se=0"):
        jpeg_decode(bytes(buf2))


def test_progressive_decodes_identical_to_baseline():
    """Progressive and baseline encodings carry the SAME quantized
    coefficients (one entropy layout vs the other), so decoding both
    must give bit-identical pixels — this pins every progressive
    data-unit kind (DC first/refine, AC first + EOB runs, the G.1.2.3
    AC refinement walk) against the already-oracled baseline decoder."""
    from sdc_spark.operators.jpeg import jpeg_encode_progressive

    rng = np.random.default_rng(19)
    cases = [
        np.full((12, 9, 3), 77, np.uint8),
        rng.integers(0, 256, (17, 23, 3), dtype=np.uint8),
        rng.integers(0, 256, (8, 8, 1), dtype=np.uint8),  # grayscale
        np.tile(np.arange(32, dtype=np.uint8)[:, None, None] * 8, (1, 16, 3)),
    ]
    for px in cases:
        for q in (50, 75, 90):
            base = jpeg_decode(jpeg_encode(px, quality=q))
            prog_buf = jpeg_encode_progressive(px, quality=q)
            assert b"\xff\xc2" in prog_buf  # really SOF2
            assert prog_buf.count(b"\xff\xda") >= 4  # really multi-scan
            assert np.array_equal(base, jpeg_decode(prog_buf))


def test_progressive_constant_color_lossless_at_q75():
    """Same analytic invariant the graded query relies on: at q75 the DC
    quantization step equals the DCT DC gain, so a constant-color image
    round-trips EXACTLY through the progressive script too."""
    from sdc_spark.operators.jpeg import jpeg_encode_progressive

    for val in (0, 5, 77, 128, 254):
        px = np.full((10, 13, 3), val, np.uint8)
        out = jpeg_decode(jpeg_encode_progressive(px, quality=75))
        assert np.array_equal(out, px)


def test_420_baseline_roundtrip():
    """4:2:0 (the layout virtually every web photo uses): constant color
    survives chroma box-averaging exactly; a smooth image stays within
    tight tolerance; odd dims exercise the padded-MCU walk."""
    from sdc_spark.operators.jpeg import jpeg_encode

    px = np.full((20, 28, 3), 99, np.uint8)
    assert np.array_equal(jpeg_decode(jpeg_encode(px, quality=75, subsample=True)), px)
    yy, xx = np.mgrid[0:17, 0:23]
    smooth = np.clip(
        np.stack([128 + 50 * np.sin(yy / 10.0),
                  128 + 40 * np.cos(xx / 12.0),
                  np.full_like(yy, 100, dtype=float)], -1),
        0, 255,
    ).astype(np.uint8)
    out = jpeg_decode(jpeg_encode(smooth, quality=90, subsample=True))
    assert out.shape == smooth.shape
    assert np.abs(out.astype(int) - smooth.astype(int)).mean() < 3.0


def test_420_progressive_identical_to_baseline():
    """Progressive 4:2:0 vs baseline 4:2:0 bit-identity — exercises the
    subsampled interleaved DC MCU walk AND non-interleaved AC block
    grids smaller than the MCU-padded allocation (odd dims make the
    luma grid 3 blocks wide inside a 4-block allocation; regression for
    the floor-vs-ceil grid bug that dropped the last chroma block row
    on odd heights)."""
    from sdc_spark.operators.jpeg import jpeg_encode_progressive

    rng = np.random.default_rng(23)
    for shape in ((16, 16, 3), (17, 23, 3), (33, 18, 3), (9, 50, 3)):
        px = np.clip(rng.normal(128, 40, shape), 0, 255).astype(np.uint8)
        for q in (75, 90):
            base = jpeg_decode(jpeg_encode(px, quality=q, subsample=True))
            prog = jpeg_decode(jpeg_encode_progressive(px, quality=q, subsample=True))
            assert np.array_equal(base, prog), (shape, q)


def test_restart_intervals_roundtrip():
    """DRI/RSTn markers (resilience markers every camera/web encoder
    writes): streams with restart intervals 1/2/5 must decode identical
    to the marker-free stream — exercises byte re-alignment, RST
    consumption, and DC-predictor/EOB-run resets in BOTH the baseline
    MCU walk and every progressive scan kind."""
    from sdc_spark.operators.jpeg import jpeg_encode_progressive

    rng = np.random.default_rng(11)
    for shape in ((17, 23, 3), (8, 8, 1)):
        px = rng.integers(0, 256, shape, dtype=np.uint8)
        ref = jpeg_decode(jpeg_encode(px, quality=90))
        for ri in (1, 2, 5):
            rb = jpeg_encode(px, quality=90, restart_interval=ri)
            assert b"\xff\xdd" in rb  # DRI present
            assert np.array_equal(ref, jpeg_decode(rb))
            pb = jpeg_encode_progressive(px, quality=90, restart_interval=ri)
            assert np.array_equal(ref, jpeg_decode(pb))
    # subsampled progressive with restarts
    px = np.clip(rng.normal(128, 40, (33, 18, 3)), 0, 255).astype(np.uint8)
    ref = jpeg_decode(jpeg_encode(px, quality=90, subsample=True))
    pb = jpeg_encode_progressive(px, quality=90, subsample=True, restart_interval=3)
    assert np.array_equal(ref, jpeg_decode(pb))
    # subsampled BASELINE with restarts: restart_interval must thread
    # through the 4:2:0/4:2:2 branch (DRI emitted, RSTn per MCU), not be
    # silently dropped
    for sub in (True, "422"):
        ref = jpeg_decode(jpeg_encode(px, quality=90, subsample=sub))
        for ri in (1, 3):
            rb = jpeg_encode(px, quality=90, subsample=sub, restart_interval=ri)
            assert b"\xff\xdd" in rb  # DRI present
            assert np.array_equal(ref, jpeg_decode(rb))


def test_422_baseline_and_progressive():
    """4:2:2 (horizontal-only chroma halving, the video-derived layout):
    exercises ASYMMETRIC sampling factors (hmax=2, vmax=1) in the MCU
    walk, chroma upsample, and the progressive non-interleaved grids.
    Constant color exact at q75; progressive bit-identical to baseline
    on odd dims."""
    from sdc_spark.operators.jpeg import jpeg_encode_progressive

    c = np.full((13, 21, 3), 88, np.uint8)
    assert np.array_equal(jpeg_decode(jpeg_encode(c, quality=75, subsample="422")), c)
    assert np.array_equal(
        jpeg_decode(jpeg_encode_progressive(c, quality=75, subsample="422")), c
    )
    rng = np.random.default_rng(13)
    for shape in ((17, 23, 3), (33, 18, 3), (8, 9, 3)):
        px = np.clip(rng.normal(128, 40, shape), 0, 255).astype(np.uint8)
        base = jpeg_decode(jpeg_encode(px, quality=90, subsample="422"))
        prog = jpeg_decode(jpeg_encode_progressive(px, quality=90, subsample="422"))
        assert base.shape == px.shape
        assert np.array_equal(base, prog), shape


def test_progressive_truncation_and_corruption_never_hang():
    """Poison-pill precondition: truncated or bit-flipped progressive
    streams must raise (or decode partially) promptly — never loop — so
    the Spark decode stage's try/except yields null rows instead of a
    wedged executor. Sweeps ~40 truncation points and ~30 single-byte
    corruptions."""
    from sdc_spark.operators.jpeg import jpeg_encode_progressive

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    buf = jpeg_encode_progressive(px, quality=90)
    for cut in range(50, len(buf), max(1, len(buf) // 40)):
        try:
            jpeg_decode(buf[:cut])
        except Exception:
            pass  # raising is fine; hanging is the failure mode
    for i in range(600, len(buf), max(1, len(buf) // 30)):
        b2 = bytearray(buf)
        b2[i] ^= 0xFF
        try:
            jpeg_decode(bytes(b2))
        except Exception:
            pass


def test_arithmetic_coded_sof_raises_loudly_never_garbage():
    """Arithmetic-coded JPEGs (SOF9 sequential / SOF10 progressive — ~1%
    of real-world files) are deliberately unsupported: the decoder must
    raise the documented ValueError promptly at the SOF marker — never
    emit garbage pixels, never hang — so the Spark decode stage's
    poison-pill discipline turns them into null rows. Fuzz sweep: a
    valid baseline stream with its SOF retagged to every unsupported
    SOF code, then truncations and single-byte corruptions of the
    retagged stream (corruption must still fail loudly, not resurrect a
    'supported' path)."""
    rng = np.random.default_rng(17)
    px = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    buf = bytearray(jpeg_encode(px, quality=85))
    sof_at = buf.find(b"\xff\xc0")
    assert sof_at > 0

    import pytest

    for sof in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
        retag = bytearray(buf)
        retag[sof_at + 1] = sof
        with pytest.raises(ValueError, match="SOF0"):
            jpeg_decode(bytes(retag))
        # truncation anywhere must never outrun the loud SOF raise into
        # garbage output: any exception is fine, a return value is not
        for cut in range(40, len(retag), max(1, len(retag) // 20)):
            try:
                out = jpeg_decode(bytes(retag[:cut]))
            except Exception:
                continue
            raise AssertionError(
                f"SOF {sof:#x} truncated at {cut} decoded to {out.shape}"
            )
        for i in range(2, len(retag), max(1, len(retag) // 20)):
            flip = bytearray(retag)
            flip[i] ^= 0xFF
            try:
                out = jpeg_decode(bytes(flip))
            except Exception:
                continue
            # one flip may legitimately restore SOF0 at the tag byte
            if i != sof_at + 1:
                raise AssertionError(
                    f"SOF {sof:#x} corrupted at {i} decoded to {out.shape}"
                )
