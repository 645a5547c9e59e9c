"""Byte-identity pins for the fused/parallel native encode paths.

Each new one-call native path must produce exactly the bytes of the
staged pipeline it replaced: the lossless diff+pack fast path vs the
numpy cats/raws pipeline, and the one-call arithmetic scan vs
per-segment emission joined with RSTn.
"""

import numpy as np
import pytest

pytest.importorskip("jpeglibrary_tpu.native.scanner")

import jpeglibrary_tpu as jt  # noqa: E402
from jpeglibrary_tpu.models import lossless as L  # noqa: E402
from jpeglibrary_tpu.native import scanner as ns  # noqa: E402


def _image(h, w, channels=3, seed=11, dtype=np.uint8, hi=256):
    rng = np.random.default_rng(seed)
    shape = (h, w) if channels == 1 else (h, w, channels)
    return rng.integers(0, hi, size=shape, dtype=dtype)


def _staged_lossless(planes, **kw):
    """encode_lossless with the native fast path disabled (falls back
    to the numpy cats/raws pipeline + native restart packer)."""
    real = ns.lossless_diffs_hist
    try:
        def _unavailable(*a, **k):
            raise ImportError("forced fallback")

        ns.lossless_diffs_hist = _unavailable
        return L.encode_lossless(planes, **kw)
    finally:
        ns.lossless_diffs_hist = real


@pytest.mark.parametrize("predictor", [1, 2, 3, 4, 5, 6, 7])
def test_lossless_fast_path_matches_staged(predictor):
    img = _image(45, 37)
    assert L.encode_lossless(img, predictor=predictor) == _staged_lossless(
        img, predictor=predictor
    )


@pytest.mark.parametrize("ri", [1, 5, 64])
@pytest.mark.parametrize("pt", [0, 3])
def test_lossless_fast_path_restart_and_pt(ri, pt):
    img = _image(30, 52, seed=12)
    kw = dict(predictor=6, point_transform=pt, restart_interval=ri)
    assert L.encode_lossless(img, **kw) == _staged_lossless(img, **kw)


def test_lossless_fast_path_12bit():
    img = _image(26, 31, channels=1, dtype=np.uint16, hi=1 << 12)
    kw = dict(precision=12, predictor=4)
    assert L.encode_lossless(img, **kw) == _staged_lossless(img, **kw)


def test_lossless_fast_path_roundtrip_exact():
    img = _image(41, 29, seed=13)
    data = L.encode_lossless(img, predictor=7, restart_interval=11)
    res = jt.decode(data)
    out = np.asarray(res.to_uint16_extended())[..., :3].astype(np.uint8)
    assert (out == img).all()


def _arith_comps(rgb):
    from jpeglibrary_tpu.syntax.quantization import (
        scale_by_quality,
        standard_chrominance_table,
        standard_luminance_table,
    )

    qY = scale_by_quality(standard_luminance_table(0), 75).elements
    qC = scale_by_quality(standard_chrominance_table(1), 75).elements
    bY, bCb, bCr = ns.encode_transform_rgb(rgb, 2, 2, [qY, qC, qC])
    mk = lambda b, per, tid: {
        "blocks": b, "per_mcu": per, "dc_id": tid, "ac_id": tid,
        "dc_l": 0, "dc_u": 1, "ac_kx": 5,
    }
    return [mk(bY, 4, 0), mk(bCb, 1, 1), mk(bCr, 1, 1)], bY.shape[0] // 4


@pytest.mark.parametrize("ri", [0, 1, 4, 19])
def test_arith_scan_matches_per_segment_join(ri):
    rgb = _image(64, 80, seed=14)
    comps, n_mcus = _arith_comps(rgb)
    whole = ns.encode_arith_scan(comps, n_mcus, ri)
    if ri <= 0:
        joined = ns.encode_arith_segment(comps, n_mcus)
    else:
        pieces, mcu, rst = [], 0, 0
        while mcu < n_mcus:
            n = min(ri, n_mcus - mcu)
            seg = [
                {**c, "blocks": c["blocks"][mcu * c["per_mcu"]:]}
                for c in comps
            ]
            pieces.append(ns.encode_arith_segment(seg, n))
            mcu += n
            if mcu < n_mcus:
                pieces.append(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) & 7
        joined = b"".join(pieces)
    assert whole == joined


def test_pack_lossless_restart_matches_per_segment():
    rng = np.random.default_rng(15)
    n = 3 * 700
    cats = rng.integers(0, 9, size=n).astype(np.uint8)
    raws = rng.integers(0, 1 << 16, size=n).astype(np.uint16)
    from jpeglibrary_tpu.models.huffman_builder import HuffmanTableBuilder

    tables = []
    for c in range(3):
        b = HuffmanTableBuilder()
        freq = np.bincount(cats[c::3], minlength=256).astype(np.int64)
        b.add_frequencies(freq)
        tables.append(b.build(optimal=True))
    pattern = np.array([0, 1, 2], dtype=np.uint8)
    step = 30 * 3
    whole = ns.pack_lossless_restart(cats, raws, tables, step, pattern=pattern)
    pieces = []
    for i, off in enumerate(range(0, n, step)):
        if off > 0:
            pieces.append(bytes([0xFF, 0xD0 + ((i - 1) & 7)]))
        pieces.append(
            ns.pack_lossless(cats[off:off + step], raws[off:off + step],
                             tables, pattern=pattern)
        )
    assert whole == b"".join(pieces)


def test_encode_segments_rst_matches_per_segment():
    """jpx_encode_segments_rst (whole restart-segmented scan, one call,
    threaded) must be byte-identical to per-segment encode_segment
    calls joined with RSTn."""
    rng = np.random.default_rng(23)
    n_mcus, ri = 37, 5
    comps = []
    from jpeglibrary_tpu.syntax import huffman_standard

    tabs = [
        (huffman_standard.dc_luminance(), huffman_standard.ac_luminance()),
        (huffman_standard.dc_chrominance(), huffman_standard.ac_chrominance()),
    ]
    for i, pm in enumerate((2, 1)):
        blocks = rng.integers(-30, 30, (n_mcus * pm, 64)).astype(np.int16)
        blocks[rng.random(blocks.shape) < 0.8] = 0
        dc, ac = tabs[i]
        comps.append({
            "blocks": np.ascontiguousarray(blocks), "per_mcu": pm,
            "dc_codes": dc.codes, "dc_sizes": dc.sizes,
            "ac_codes": ac.codes, "ac_sizes": ac.sizes,
        })
    whole = ns.encode_segment(comps, n_mcus, restart_interval=ri)
    pieces = []
    for k, m0 in enumerate(range(0, n_mcus, ri)):
        if k > 0:
            pieces.append(bytes([0xFF, 0xD0 + ((k - 1) & 7)]))
        seg = [
            {**c, "blocks": c["blocks"][m0 * c["per_mcu"]:]} for c in comps
        ]
        pieces.append(bytes(ns.encode_segment(seg, min(ri, n_mcus - m0))))
    assert bytes(whole) == b"".join(pieces)
