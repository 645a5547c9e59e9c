"""Fused native RGB encode transform (jpx_encode_transform_rgb).

The set_input_rgb path runs convert + pad + subsample + FDCT +
quantize + MCU ordering as one threaded native stripe pass; these
tests pin its byte-identity against the staged rgb_to_ycbcr +
set_input pipeline across sampling ratios, odd geometry, and every
encode() option family that consumes comp_blocks.
"""

import numpy as np
import pytest

from jpeglibrary_tpu.models.encoder import (
    JpegEncoder,
    _configure_rgb_encoder,
    encode_cmyk,
    encode_rgb,
)

pytest.importorskip("jpeglibrary_tpu.native.scanner")
from jpeglibrary_tpu.native import scanner as native_scanner  # noqa: E402

import jpeglibrary_tpu as jt  # noqa: E402


def _image(h, w, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 80 * np.sin(yy / 13.0) * np.cos(xx / 29.0)).astype(np.float32)
    img = np.stack([base, 0.7 * base + 30, 255 - base], axis=-1)
    img = img + rng.normal(0, 15, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def _staged(rgb, quality, subsampling, **kw):
    arithmetic = kw.pop("arithmetic", False)
    enc = _configure_rgb_encoder(quality, subsampling, **kw)
    enc.arithmetic = arithmetic
    enc.set_input(list(native_scanner.rgb_to_ycbcr(rgb)))
    return enc.encode()


@pytest.mark.parametrize("subsampling", ["420", "444", "422", "440", "411"])
@pytest.mark.parametrize("shape", [(64, 64), (57, 41), (129, 257), (16, 8)])
def test_fused_matches_staged(subsampling, shape):
    rgb = _image(*shape)
    assert encode_rgb(rgb, 75, subsampling=subsampling) == _staged(
        rgb, 75, subsampling
    )


@pytest.mark.parametrize(
    "kw",
    [
        {"optimize_coding": True},
        {"most_optimal_coding": True},
        {"restart_interval": 3},
        {"arithmetic": True},
        {"optimize_coding": True, "restart_interval": 2},
    ],
)
def test_fused_matches_staged_options(kw):
    rgb = _image(75, 90)
    assert encode_rgb(rgb, 75, **kw) == _staged(rgb, 75, "420", **kw)


def test_fused_tiny_and_single_pixel():
    for shape in [(1, 1), (1, 64), (64, 1), (7, 7)]:
        rgb = _image(*shape)
        assert encode_rgb(rgb, 85) == _staged(rgb, 85, "420")


def test_fused_roundtrip_decodes():
    # 4:4:4 — the synthetic pattern has saturated chroma noise that
    # 4:2:0 legitimately averages away; this checks transform fidelity,
    # not subsampling loss.
    rgb = _image(96, 112)
    data = encode_rgb(rgb, 92, subsampling="444")
    res = jt.decode(data)
    dec = np.asarray(res.to_rgb8()).astype(np.float64)
    mse = ((dec - rgb) ** 2).mean()
    assert 10 * np.log10(255.0**2 / mse) > 30


@pytest.mark.parametrize("quality", [1, 50, 100])
def test_fused_extreme_quality(quality):
    # q=100 (unit quant) maximizes coefficient magnitudes and bit
    # lengths; q=1 maximizes EOB/ZRL density. Noise maximizes 0xFF
    # stuffing frequency.
    rng = np.random.default_rng(21)
    rgb = rng.integers(0, 256, size=(80, 72, 3), dtype=np.uint8)
    data = encode_rgb(rgb, quality)
    assert data == _staged(rgb, quality, "420")
    assert jt.decode(data).width == 72


def test_fused_flat_image_eob_runs():
    rgb = np.full((96, 64, 3), 200, dtype=np.uint8)
    data = encode_rgb(rgb, 75)
    assert data == _staged(rgb, 75, "420")
    dec = np.asarray(jt.decode(data).to_rgb8())
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 2


@pytest.mark.parametrize("ri", [1, 2, 10_000])
def test_fused_restart_interval_edges(ri):
    # ri=1: RSTn after every MCU; ri > n_mcus: single segment with DRI.
    rgb = _image(48, 80, seed=22)
    data = encode_rgb(rgb, 75, restart_interval=ri)
    assert data == _staged(rgb, 75, "420", restart_interval=ri)
    assert jt.decode(data).height == 48


def test_set_input_rgb_fallback_for_nonstandard_layout():
    # 4 components -> the fused precondition fails; encode() converts
    # and rides the plane path instead of erroring.
    rgb = _image(32, 32)
    enc = JpegEncoder()
    from jpeglibrary_tpu.syntax.quantization import (
        scale_by_quality,
        standard_luminance_table,
    )
    from jpeglibrary_tpu.syntax import huffman_standard

    enc.set_quantization_table(scale_by_quality(standard_luminance_table(0), 75))
    enc.set_huffman_table(True, 0, huffman_standard.dc_luminance())
    enc.set_huffman_table(False, 0, huffman_standard.ac_luminance())
    # chroma carries the max sampling factor -> layout check fails
    enc.add_component(1, 0, 0, 0, 1, 1)
    enc.add_component(2, 0, 0, 0, 2, 2)
    enc.add_component(3, 0, 0, 0, 1, 1)
    assert not enc._fused_rgb_applies(np)
    enc.set_input_rgb(rgb)
    data = enc.encode()
    assert jt.decode(data).width == 32


# -- fused 4-component ink transform (jpx_encode_transform_cmyk) --


def _ink_image(h, w, seed=11):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (120 + 90 * np.sin(yy / 11.0) * np.cos(xx / 17.0)).astype(np.float32)
    ink = np.stack([base, 255 - base, 0.5 * base + 60, 0.25 * base], axis=-1)
    ink = ink + rng.normal(0, 12, ink.shape)
    return np.clip(ink, 0, 255).astype(np.uint8)


def _staged_ink(ink, monkeypatch, **kw):
    """encode_cmyk with the fused precondition forced off -> the
    staged convert + plane path inside encode()."""
    from jpeglibrary_tpu.models import encoder as encoder_mod

    monkeypatch.setattr(
        encoder_mod.JpegEncoder, "_fused_ink_applies", lambda self, xp: False
    )
    try:
        return encoder_mod.encode_cmyk(ink, **kw)
    finally:
        monkeypatch.undo()


@pytest.mark.parametrize("ycck", [False, True])
@pytest.mark.parametrize("shape", [(64, 64), (57, 41), (16, 8)])
def test_fused_ink_matches_staged(ycck, shape, monkeypatch):
    ink = _ink_image(*shape)
    kw = dict(quality=80, ycck=ycck)
    assert encode_cmyk(ink, **kw) == _staged_ink(ink, monkeypatch, **kw)


@pytest.mark.parametrize(
    "kw",
    [
        {"ycck": True, "subsampling": "444"},
        {"ycck": True, "subsampling": "422"},
        {"ycck": True, "optimize_coding": True},
        {"ycck": False, "optimize_coding": True},
        {"ycck": True, "restart_interval": 3},
        {"ycck": False, "restart_interval": 1},
    ],
)
def test_fused_ink_matches_staged_options(kw, monkeypatch):
    ink = _ink_image(75, 90)
    assert encode_cmyk(ink, quality=75, **kw) == _staged_ink(
        ink, monkeypatch, quality=75, **kw
    )


def test_fused_ink_roundtrip_decodes():
    ink = _ink_image(96, 112)
    data = encode_cmyk(ink, quality=92, ycck=True, subsampling="444")
    res = jt.decode(data)
    assert res.color_transform == "ycck"
    dec = np.asarray(res.to_cmyk8()).astype(np.float64)
    mse = ((dec - ink) ** 2).mean()
    assert 10 * np.log10(255.0**2 / mse) > 30


def test_fully_fused_ink_emitter_engages(monkeypatch):
    # Fixed-table encode_cmyk must ride jpx_encode_cmyk_baseline (one
    # native transform+emit pass), not the transform+segment pair.
    from jpeglibrary_tpu.native import scanner as native_scanner

    calls = []
    real = native_scanner.encode_cmyk_scan

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(native_scanner, "encode_cmyk_scan", spy)
    ink = _ink_image(48, 80)
    out = encode_cmyk(ink, quality=80, ycck=True)
    assert calls, "fused CMYK emitter did not engage"
    assert jt.decode(out).color_transform == "ycck"
