"""Codec backend routing + bilinear resize reference semantics.

The numpy bilinear here is the REFERENCE implementation (half-pixel
centers, edge clamp); PIL is the opportunistic fast path. Where both
backends exist their outputs are compared directly (skipped in this
container, which ships no PIL — the try-import IS the point of the
backend layer)."""

from __future__ import annotations

import numpy as np
import pytest

from sdc_spark.operators.codec_backend import (
    _pil,
    backend,
    bilinear_resize,
    decode_image_pixels,
    resize_pixels,
)
from sdc_spark.operators.multimodal import encode_png


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


@pytest.mark.skipif(_pil() is None, reason="PIL not installed in container")
def test_pil_and_numpy_backends_agree_on_lossless_decode(monkeypatch):
    # PNG decode is lossless in both backends -> identical pixels.
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(8, 5, 3), dtype=np.uint8)
    buf = encode_png(px)
    monkeypatch.setenv("SDC_CODEC_BACKEND", "numpy")
    a = decode_image_pixels(buf)
    monkeypatch.setenv("SDC_CODEC_BACKEND", "pil")
    b = decode_image_pixels(buf)
    assert np.array_equal(a, b)
