"""Codec backend routing + bilinear resize reference semantics.

The numpy bilinear here is the REFERENCE implementation (half-pixel
centers, edge clamp); PIL is the opportunistic fast path. Backend
parity is asserted against SPEC-FORCED goldens (hand-built lossless
payloads whose decoded output any conformant decoder must reproduce):
the numpy floor asserts in every container, and the PIL/soundfile/pyav
paths assert against the same goldens wherever those libs import — so
the parity tests run (never skip) here AND grade the fast path on a
lib-equipped cluster."""

from __future__ import annotations

import numpy as np
import pytest

from sdc_spark.operators.codec_backend import (
    _pil,
    _pyav,
    _soundfile,
    audio_backend,
    backend,
    bilinear_resize,
    decode_audio_samples,
    decode_image_pixels,
    iter_video_luma,
    resize_pixels,
    video_backend,
)
from sdc_spark.operators.multimodal import encode_png, encode_y4m


def test_backend_resolves_numpy_without_pil(monkeypatch):
    monkeypatch.delenv("SDC_CODEC_BACKEND", raising=False)
    assert backend() in ("numpy", "pil")  # auto never raises
    monkeypatch.setenv("SDC_CODEC_BACKEND", "numpy")
    assert backend() == "numpy"
    monkeypatch.setenv("SDC_CODEC_BACKEND", "bogus")
    with pytest.raises(ValueError):
        backend()


def test_backend_pil_required_raises_when_missing(monkeypatch):
    monkeypatch.setenv("SDC_CODEC_BACKEND", "pil")
    if _pil() is None:
        with pytest.raises(RuntimeError):
            backend()
    else:
        assert backend() == "pil"


def test_bilinear_identity_is_exact_copy():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    out = bilinear_resize(px, 9, 5)
    assert np.array_equal(out, px.astype(np.float64))


def test_bilinear_constant_image_stays_constant():
    px = np.full((7, 11, 3), 93, dtype=np.uint8)
    out = bilinear_resize(px, 4, 3)
    assert out.shape == (3, 4, 3)
    assert np.allclose(out, 93.0, atol=1e-9)


def test_bilinear_half_downscale_gradient_exact_midpoints():
    # f(y) = 10 + 2y over 6 rows -> downscale to 3 samples at t=0.5:
    # exactly 10 + 4i + 1. A nearest-neighbor resampler gives 10+4i or
    # 10+4i+2 — this pins the interpolation weights.
    y = np.arange(6, dtype=np.float64)
    px = np.repeat((10 + 2 * y)[:, None], 4, axis=1)
    out = bilinear_resize(px, 4, 3)
    expect = np.repeat((11 + 4 * np.arange(3, dtype=np.float64))[:, None], 4, axis=1)
    assert np.array_equal(out, expect)


def test_bilinear_upscale_edge_clamp():
    px = np.array([[0.0, 100.0]])  # 1x2
    out = bilinear_resize(px, 4, 1)
    # centers at src_x = -0.25, 0.25, 0.75, 1.25 -> clamp edges
    assert np.allclose(out[0], [0.0, 25.0, 75.0, 100.0])


def test_resize_pixels_uint8_quantization(monkeypatch):
    monkeypatch.setenv("SDC_CODEC_BACKEND", "numpy")
    px = np.full((6, 6, 3), 200, dtype=np.uint8)
    out = resize_pixels(px, 3, 3)
    assert out.dtype == np.uint8 and out.shape == (3, 3, 3)
    assert np.all(out == 200)


def test_decode_image_pixels_sniffs_png(monkeypatch):
    monkeypatch.setenv("SDC_CODEC_BACKEND", "numpy")
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    got = decode_image_pixels(encode_png(px))
    assert np.array_equal(got, px)
    with pytest.raises(ValueError):
        decode_image_pixels(b"\x00\x01rubbish")


def _chunk(cid: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + cid
        + body
        + struct.pack(">I", zlib.crc32(cid + body))
    )


def test_decode_matches_hand_built_spec_png(monkeypatch):
    """Golden fixture independent of our own encoder: the PNG bytes are
    assembled BY HAND from the spec (chunk layout, IHDR fields, filter
    bytes, stdlib-zlib IDAT), with Sub/Up filters whose unfiltered
    pixels are computed on paper — so the numpy decoder is checked
    against the PNG specification, not against encode_png (which would
    be circular)."""
    import struct
    import zlib

    monkeypatch.setenv("SDC_CODEC_BACKEND", "numpy")
    # 2x3 RGB, bit depth 8: row 0 filter=1 (Sub), row 1 filter=2 (Up).
    # Row 0 raw: first pixel (10,20,30) literal (no left neighbor),
    # second/third pixels stored as deltas of +5 per channel.
    # Row 1 stored as deltas of +100 over row 0 (mod 256).
    row0 = bytes([1, 10, 20, 30, 5, 5, 5, 5, 5, 5])
    row1 = bytes([2] + [100] * 9)
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 2, 0, 0, 0)  # w=3 h=2 rgb
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(row0 + row1))
        + _chunk(b"IEND", b"")
    )
    expect = np.array(
        [
            [[10, 20, 30], [15, 25, 35], [20, 30, 40]],
            [[110, 120, 130], [115, 125, 135], [120, 130, 140]],
        ],
        dtype=np.uint8,
    )
    assert np.array_equal(decode_image_pixels(png), expect)


def test_force_numpy_overrides_env(monkeypatch):
    """force='numpy' must bypass the env entirely — even SDC_CODEC_BACKEND
    =pil on a PIL-less worker must not raise when a graded query pinned
    numpy (this is exactly the deployment the pin exists for, inverted)."""
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    buf = encode_png(px)
    monkeypatch.setenv("SDC_CODEC_BACKEND", "pil")
    got = decode_image_pixels(buf, force="numpy")
    assert np.array_equal(got, px)
    got2 = resize_pixels(px, 3, 2, force="numpy")
    assert got2.shape == (2, 3, 3)


def test_plans_pin_backend_on_backend_routed_calls():
    """Lint: every call in sdc_spark/plans/ to a codec-backend-routed
    operator must pin backend= explicitly — an oracled query whose
    result depends on the worker's site-packages would grade differently
    on a PIL-equipped cluster. AST-based so renames/formatting can't
    dodge it."""
    import ast
    import pathlib

    always_pin = {"decode_jpeg", "image_phash", "audio_features"}
    pin_when_real = {"decode_and_featurize", "resize_images", "sample_frames"}
    bad = []
    for path in pathlib.Path("sdc_spark/plans").glob("*.py"):
        tree = ast.parse(path.read_text())
        for node in ast.walk(tree):
            if not isinstance(node, ast.Call):
                continue
            name = getattr(node.func, "id", getattr(node.func, "attr", ""))
            kw = {k.arg for k in node.keywords}
            if name in always_pin and "backend" not in kw:
                bad.append(f"{path}:{node.lineno} {name} without backend=")
            if name in pin_when_real and "backend" not in kw:
                stub_false = any(
                    k.arg == "stub"
                    and isinstance(k.value, ast.Constant)
                    and k.value.value is False
                    for k in node.keywords
                )
                if stub_false:
                    bad.append(f"{path}:{node.lineno} {name} stub=False without backend=")
    assert not bad, "\n".join(bad)


def _spec_png_golden():
    """Hand-assembled spec PNG + its paper-computed pixels (same fixture
    family as test_decode_matches_hand_built_spec_png): PNG decode is
    LOSSLESS, so the golden is spec-forced — every conformant decoder
    (ours, PIL, anything) must emit exactly these pixels. That makes
    backend parity assertable WITHOUT the other backend installed: each
    backend is compared to the golden, not to each other."""
    import struct
    import zlib

    row0 = bytes([1, 10, 20, 30, 5, 5, 5, 5, 5, 5])  # Sub filter
    row1 = bytes([2] + [100] * 9)  # Up filter
    ihdr = struct.pack(">IIBBBBB", 3, 2, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(row0 + row1))
        + _chunk(b"IEND", b"")
    )
    expect = np.array(
        [
            [[10, 20, 30], [15, 25, 35], [20, 30, 40]],
            [[110, 120, 130], [115, 125, 135], [120, 130, 140]],
        ],
        dtype=np.uint8,
    )
    return png, expect


def test_every_image_backend_matches_spec_golden():
    """Backend parity via spec-forced golden, never skipped: the numpy
    floor asserts in every container; the PIL fast path asserts against
    the SAME golden wherever PIL is importable (a PIL-equipped cluster
    runs this test too — the parity claim is graded there, not assumed)."""
    png, expect = _spec_png_golden()
    assert np.array_equal(decode_image_pixels(png, force="numpy"), expect)
    if _pil() is not None:
        assert np.array_equal(decode_image_pixels(png, force="pil"), expect)


# -- audio / video backend probes (mirror the image ones) --------------------


def test_audio_video_backend_env_resolution(monkeypatch):
    monkeypatch.setenv("SDC_AUDIO_BACKEND", "numpy")
    assert audio_backend() == "numpy"
    monkeypatch.setenv("SDC_VIDEO_BACKEND", "numpy")
    assert video_backend() == "numpy"
    monkeypatch.setenv("SDC_AUDIO_BACKEND", "bogus")
    with pytest.raises(ValueError):
        audio_backend()
    monkeypatch.setenv("SDC_AUDIO_BACKEND", "soundfile")
    if _soundfile() is None:
        with pytest.raises(RuntimeError):
            audio_backend()
    monkeypatch.setenv("SDC_VIDEO_BACKEND", "pyav")
    if _pyav() is None:
        with pytest.raises(RuntimeError):
            video_backend()


def _wav_bytes(samples, rate=8000, ch=1):
    import struct

    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * 2 * ch, 2 * ch, 16)
    riff = 4 + (8 + len(fmt)) + (8 + len(data))
    return (
        b"RIFF" + struct.pack("<I", riff) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def test_decode_audio_samples_numpy_floor(monkeypatch):
    monkeypatch.setenv("SDC_AUDIO_BACKEND", "numpy")
    vals = [0, 1000, -1000, 32767, -32768, 5]
    samples, rate = decode_audio_samples(_wav_bytes(vals))
    assert rate == 8000 and samples.shape == (6, 1)
    assert samples[:, 0].tolist() == [float(v) for v in vals]
    # stereo de-interleave
    s2, _ = decode_audio_samples(_wav_bytes([1, 2, 3, 4], ch=2))
    assert s2.shape == (2, 2) and s2[:, 0].tolist() == [1.0, 3.0]
    with pytest.raises(ValueError):
        decode_audio_samples(b"ID3\x03mp3junk" * 8)


def test_iter_video_luma_numpy_floor(monkeypatch):
    monkeypatch.setenv("SDC_VIDEO_BACKEND", "numpy")
    y = np.stack([np.full((4, 6), 13 * k, np.uint8) for k in range(3)])
    planes = list(iter_video_luma(encode_y4m(y)))
    assert len(planes) == 3
    assert all(p.shape == (4, 6) for p in planes)
    assert [int(p[0, 0]) for p in planes] == [0, 13, 26]
    with pytest.raises(NotImplementedError, match="pyav"):
        list(iter_video_luma(b"\x00\x00\x01\xb3mpegjunk"))


def test_every_audio_backend_matches_spec_golden():
    """WAV (PCM16) is lossless and its byte layout is spec-forced, so the
    hand-built stream + its known samples are a golden EVERY conformant
    decoder must reproduce (soundfile floats rescale to the int16 raw
    scale). numpy floor asserts everywhere; the soundfile path asserts
    against the same golden wherever soundfile is importable — no skip."""
    vals = [0, 1000, -1000, 32767, -32768, 5]
    buf = _wav_bytes(vals)
    golden = np.array([[float(v)] for v in vals])
    a, ra = decode_audio_samples(buf, force="numpy")
    assert ra == 8000 and np.array_equal(a, golden)
    if _soundfile() is not None:
        b, rb = decode_audio_samples(buf, force="soundfile")
        assert rb == 8000
        assert np.allclose(b, golden)


def test_every_video_backend_matches_spec_golden():
    """Y4M mono is raw luma planes behind a textual header — the golden
    rasters are spec-forced (pyav's gray8 reformat of a mono stream is
    the Y plane unchanged). The Y4M bytes are assembled BY HAND from the
    public spec (not via encode_y4m, which would be circular with the
    numpy decoder). numpy floor asserts everywhere; pyav asserts against
    the same golden wherever importable — no skip."""
    golden = [np.full((4, 6), 20 * k, np.uint8) for k in range(3)]
    buf = b"YUV4MPEG2 W6 H4 F25:1 Ip A1:1 Cmono\n" + b"".join(
        b"FRAME\n" + g.tobytes() for g in golden
    )
    a = list(iter_video_luma(buf, force="numpy"))
    assert len(a) == 3
    for pa, g in zip(a, golden):
        assert np.array_equal(pa, g)
    if _pyav() is not None:
        b = list(iter_video_luma(buf, force="pyav"))
        assert len(b) == 3
        for pb, g in zip(b, golden):
            assert np.array_equal(pb, g)
