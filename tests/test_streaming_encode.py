"""Streaming (bufferless) encode: pull-based stripe input with carried
entropy-emission state — the reference's JpegBlockInputReader /
bufferless WriteScanData contract
(/root/reference/src/JpegLibrary/JpegBlockInputReader.cs:27,
 JpegEncoder.cs:662-741, tests/JpegLibrary.Benchmarks/EncoderBenchmark.cs).

Gates: bit-identical to the buffered path across configs, and peak
host memory < 1 RGB plane on a large synthetic input.
"""

import numpy as np
import pytest

import jpeglibrary_tpu as jt
from jpeglibrary_tpu.models.encoder import JpegEncoder, encode_rgb, encode_rgb_stream


@pytest.fixture(scope="module")
def rgb(assets_dir):
    return jt.decode((assets_dir / "baseline/lake.jpg").read_bytes()).to_rgb8()


@pytest.mark.parametrize("subsampling", ["420", "444"])
@pytest.mark.parametrize(
    "optimize,ri", [(False, 0), (False, 7), (True, 0), (True, 32)]
)
def test_stream_bit_identical(rgb, subsampling, optimize, ri, monkeypatch):
    # A stripe size that does NOT divide the image's MCU rows, so the
    # last stripe is partial and restart boundaries cross stripes.
    monkeypatch.setenv("JPX_ENCODE_STRIPE_MCU_ROWS", "5")
    h, w = rgb.shape[:2]
    buffered = encode_rgb(
        rgb, 80, subsampling=subsampling, optimize_coding=optimize,
        restart_interval=ri,
    )
    streamed = encode_rgb_stream(
        lambda y0, y1: rgb[y0:y1], w, h, 80, subsampling=subsampling,
        optimize_coding=optimize, restart_interval=ri,
    )
    assert streamed == buffered


def test_stream_odd_dimensions(rgb, monkeypatch):
    """Non-MCU-aligned width AND height: the padded edge blocks must
    match the buffered path's zero-fill exactly."""
    monkeypatch.setenv("JPX_ENCODE_STRIPE_MCU_ROWS", "3")
    crop = rgb[:333, :331]
    buffered = encode_rgb(crop, 75)
    streamed = encode_rgb_stream(lambda y0, y1: crop[y0:y1], 331, 333, 75)
    assert streamed == buffered
    out = jt.decode(streamed)
    assert (out.width, out.height) == (331, 333)


def test_stream_planes_reader(rgb, monkeypatch):
    """set_input_reader with per-component planes (grayscale-style
    single component)."""
    monkeypatch.setenv("JPX_ENCODE_STRIPE_MCU_ROWS", "4")
    from jpeglibrary_tpu.syntax import huffman_standard
    from jpeglibrary_tpu.syntax.quantization import (
        scale_by_quality, standard_luminance_table,
    )

    y = rgb[..., 0].copy()
    h, w = y.shape

    def make(buffered: bool) -> bytes:
        enc = JpegEncoder()
        enc.set_quantization_table(scale_by_quality(standard_luminance_table(0), 85))
        enc.set_huffman_table(True, 0, huffman_standard.dc_luminance())
        enc.set_huffman_table(False, 0, huffman_standard.ac_luminance())
        enc.add_component(1, 0, 0, 0, 1, 1)
        if buffered:
            enc.set_input([y])
        else:
            enc.set_input_reader(lambda y0, y1: [y[y0:y1]], w, h)
        return enc.encode()

    assert make(False) == make(True)


def test_stream_bounded_memory():
    """16.8 MP synthetic input generated row-window at a time: peak
    traced host memory during the streaming encode must stay below one
    RGB plane (H*W bytes), i.e. O(stripe) not O(image)."""
    import tracemalloc

    h, w = 4096, 4096  # 16.8 MP — the reference benchmark's workload size

    def reader(y0, y1):
        # Synthesize smooth rows on the fly; nothing image-sized ever
        # exists (smooth so the compressed OUTPUT — which any encoder
        # must hold — stays small and the measurement isolates the
        # pipeline's working memory). Lean temporaries: (rows+cols)//32
        # <= 255 for w, h <= 4096, so uint16 math + uint8 wraparound
        # reproduce the old uint32 formula without band-sized uint32
        # intermediates (the reader's own allocations would otherwise
        # dominate the measurement at larger default bands).
        rows = np.arange(y0, y1, dtype=np.uint16)[:, None]
        cols = np.arange(w, dtype=np.uint16)[None, :]
        base = ((rows + cols) // 32).astype(np.uint8)
        out = np.empty((y1 - y0, w, 3), np.uint8)
        for c in range(3):
            out[..., c] = base + np.uint8(40 * c)
        return out

    tracemalloc.start()
    tracemalloc.reset_peak()
    data = encode_rgb_stream(reader, w, h, 75)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    # < one 4096x4096 single-channel plane (16.8 MB); the full RGB
    # image would be 50 MB.
    assert peak < h * w, f"peak traced memory {peak} >= one plane {h * w}"

    out = jt.decode(data)
    assert (out.width, out.height) == (w, h)
    # Spot-check fidelity on the first stripe.
    got = out.to_rgb8()[:64].astype(np.int16)
    want = reader(0, 64).astype(np.int16)
    assert np.mean(np.abs(got - want)) < 6.0


def test_rgb_stream_fused_band_path_identity():
    """The fused band path (jpx_encode_rgb_band: one native call per
    MCU-row band, DC predictors + bit-register remainder carried
    across bands) must be byte-identical to the buffered fused encode
    for every subsampling, across band sizes that exercise both the
    single-chunk and the multi-chunk (threaded) band internals —
    including the multi-chunk carry hand-off (a race found in round 5:
    the outgoing predictor state was published by the last chunk while
    the first chunk was still reading the incoming one)."""
    import os

    import numpy as np

    from jpeglibrary_tpu.models.encoder import encode_rgb, encode_rgb_stream

    rng = np.random.default_rng(23)
    h, w = 530, 517
    rgb = np.clip(
        np.linspace(0, 255, w)[None, :, None] + rng.normal(0, 30, (h, w, 3)),
        0, 255,
    ).astype(np.uint8)
    for sub in ("420", "422", "444"):
        ref = encode_rgb(rgb, 75, subsampling=sub)
        for rows in ("1", "2", "32"):
            os.environ["JPX_ENCODE_STRIPE_MCU_ROWS"] = rows
            try:
                got = encode_rgb_stream(
                    lambda y0, y1: rgb[y0:y1], w, h, 75, subsampling=sub
                )
            finally:
                del os.environ["JPX_ENCODE_STRIPE_MCU_ROWS"]
            assert got == ref, (sub, rows)


def test_rgb_stream_fused_multichunk_carry():
    """The band encoder's threaded internals across band boundaries,
    at thread counts that produce EVERY chunking shape — including
    trailing EMPTY chunks (ceil-division: e.g. 16 MCU rows at T=12
    covers the band by chunk 7; a round-5 review found the outgoing
    predictor state was published by chunk index T-1, which an empty
    tail chunk never reached -> silent corruption on 9-15-thread
    hosts). Byte-identity against the whole-image fused scan for
    T in {1, 3, 4, 12}."""
    import numpy as np

    from jpeglibrary_tpu.models.encoder import (
        _configure_rgb_encoder, encode_rgb,
    )
    from jpeglibrary_tpu.native import scanner as ns

    rng = np.random.default_rng(29)
    h, w = 16 * 48, 512
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)

    enc = _configure_rgb_encoder(85, "420")
    qbi = {t.identifier: t for t in enc._quant_tables}
    quants = [qbi[c.quantization_table_id].elements for c in enc._components]
    tables = [
        (enc._huffman_tables[(True, c.dc_table_id)],
         enc._huffman_tables[(False, c.ac_table_id)])
        for c in enc._components
    ]
    ref = bytes(ns.encode_rgb_scan(rgb, 2, 2, quants, tables))
    for nt in (1, 3, 4, 12):
        be = ns.RgbBandEncoder(2, 2, quants, tables)
        parts = []
        for y0 in range(0, h, 256):  # 16 MCU rows per band
            y1 = min(h, y0 + 256)
            parts.append(
                bytes(be.encode_band(rgb[y0:y1], is_last=y1 == h,
                                     n_threads=nt))
            )
        assert b"".join(parts) == ref, nt
