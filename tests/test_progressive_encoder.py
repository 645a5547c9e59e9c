"""Progressive (SOF2) encoder — beyond-reference capability: full
spectral-selection + successive-approximation scripts must round-trip
coefficient-exact against the baseline encode of the same samples,
through both the native and pure-Python decoders."""

import numpy as np
import pytest

import jpeglibrary_tpu as jt
from jpeglibrary_tpu.models.progressive_encoder import (
    encode_progressive_gray,
    encode_progressive_rgb,
)


@pytest.fixture(scope="module")
def native_lib():
    from jpeglibrary_tpu.native import build

    try:
        return build.load_library()
    except ImportError as exc:
        pytest.skip(f"native scanner unavailable: {exc}")


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(21)


def _match(a, b):
    for k in a.coefficients:
        np.testing.assert_array_equal(a.coefficients[k], b.coefficients[k])


@pytest.mark.parametrize("quality", [50, 75, 95])
def test_roundtrip_vs_baseline(native_lib, rng, quality):
    img = rng.integers(0, 256, size=(56, 72, 3), dtype=np.uint8)
    base = jt.decode(jt.encode_rgb(img, quality))
    prog = jt.decode(encode_progressive_rgb(img, quality))
    _match(base, prog)


def test_python_decoder_agrees(native_lib, rng):
    img = rng.integers(0, 256, size=(40, 48, 3), dtype=np.uint8)
    data = encode_progressive_rgb(img, 75)
    _match(jt.decode(data), jt.decode(data, use_native=False))


def test_real_image_and_sizes(native_lib, assets_dir):
    rgb = jt.decode((assets_dir / "baseline/lake.jpg").read_bytes()).to_rgb8()
    prog = encode_progressive_rgb(rgb, 75)
    base = jt.encode_rgb(rgb, 75)
    _match(jt.decode(base), jt.decode(prog))
    assert len(prog) < len(base)  # optimal tables + progressive ordering


def test_444_and_gray(native_lib, rng):
    img = rng.integers(0, 256, size=(41, 33, 3), dtype=np.uint8)
    _match(
        jt.decode(jt.encode_rgb(img, 80, subsampling="444")),
        jt.decode(encode_progressive_rgb(img, 80, subsampling="444")),
    )
    g = rng.integers(0, 256, size=(37, 29), dtype=np.uint8)
    data = encode_progressive_gray(g, 75)
    _match(jt.decode(data), jt.decode(data, use_native=False))


@pytest.mark.parametrize("quality", [50, 75, 95])
def test_arithmetic_progressive_roundtrip(native_lib, rng, quality):
    """SOF10: the QM coder driven by the progressive script must be
    coefficient-exact vs baseline, through both decoders."""
    img = rng.integers(0, 256, size=(48, 56, 3), dtype=np.uint8)
    base = jt.decode(jt.encode_rgb(img, quality))
    data = encode_progressive_rgb(img, quality, arithmetic=True)
    _match(base, jt.decode(data))
    _match(base, jt.decode(data, use_native=False))


def test_arithmetic_progressive_smallest(native_lib, assets_dir):
    rgb = jt.decode((assets_dir / "baseline/lake.jpg").read_bytes()).to_rgb8()
    sof10 = encode_progressive_rgb(rgb, 75, arithmetic=True)
    _match(jt.decode(jt.encode_rgb(rgb, 75)), jt.decode(sof10))
    assert len(sof10) < len(encode_progressive_rgb(rgb, 75))  # beats SOF2
    assert len(sof10) < len(jt.encode_rgb(rgb, 75, arithmetic=True))  # beats SOF9


@pytest.mark.parametrize("arithmetic", [False, True])
@pytest.mark.parametrize("ri", [1, 5, 37])
def test_restart_intervals(native_lib, rng, arithmetic, ri):
    """Restart seams through the whole scan script: every emitter state
    resets per segment; native and Python decoders agree and match the
    baseline coefficients exactly."""
    img = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    base = jt.decode(jt.encode_rgb(img, 75))
    data = encode_progressive_rgb(img, 75, arithmetic=arithmetic, restart_interval=ri)
    _match(base, jt.decode(data))
    _match(base, jt.decode(data, use_native=False))


def test_external_decoder_reads_restart_stream(native_lib, rng):
    import io

    from PIL import Image

    img = rng.integers(0, 256, size=(48, 64, 3), dtype=np.uint8)
    data = encode_progressive_rgb(img, 75, restart_interval=1)
    assert np.asarray(Image.open(io.BytesIO(data)).convert("RGB")).shape == (48, 64, 3)


def test_external_decoder_reads_it(native_lib, assets_dir):
    """libjpeg (via PIL) must accept our progressive stream — external
    conformance evidence."""
    import io

    from PIL import Image

    rgb = jt.decode((assets_dir / "baseline/lake.jpg").read_bytes()).to_rgb8()
    prog = encode_progressive_rgb(rgb, 75)
    pil = np.asarray(Image.open(io.BytesIO(prog)).convert("RGB"))
    ours = jt.decode(prog).to_rgb8()
    mse = np.mean((pil.astype(float) - ours.astype(float)) ** 2)
    assert 10 * np.log10(255**2 / max(mse, 1e-9)) > 40


def test_native_restart_segments_match_per_chunk_calls():
    """The whole-scan emitters with restart_interval embed byte-aligned
    RSTn between fresh-state segments — byte-identical to per-chunk
    calls joined with RSTn (the contract the encoder relied on when it
    chunked scans in Python)."""
    from jpeglibrary_tpu.native import scanner as ns
    from jpeglibrary_tpu.models.huffman_builder import HuffmanTableBuilder

    rng = np.random.default_rng(17)
    n_blocks = 23
    blocks = np.ascontiguousarray(
        rng.integers(-40, 40, (n_blocks, 64)).astype(np.int16)
    )
    blocks[rng.random((n_blocks, 64)) < 0.7] = 0
    ri = 5

    def table_for(freq):
        b = HuffmanTableBuilder()
        b.add_frequencies(np.maximum(freq, 0) + (freq > 0))
        return b.build(optimal=True)

    # AC first
    freq = np.zeros(256, np.int64)
    ns.encode_prog_ac_first(blocks, 1, 63, 0, freq=freq, restart_interval=ri)
    tab = table_for(freq)
    whole = ns.encode_prog_ac_first(blocks, 1, 63, 0, table=tab,
                                    restart_interval=ri)
    pieces = []
    for k, lo in enumerate(range(0, n_blocks, ri)):
        if k > 0:
            pieces.append(bytes([0xFF, 0xD0 + ((k - 1) & 7)]))
        pieces.append(
            ns.encode_prog_ac_first(blocks[lo : lo + ri], 1, 63, 0, table=tab)
        )
    assert bytes(whole) == b"".join(bytes(p) for p in pieces)

    # AC refine (needs a prior-significance pattern: al=1 over the same data)
    freq2 = np.zeros(256, np.int64)
    ns.encode_prog_ac_refine(blocks, 1, 63, 0, freq=freq2, restart_interval=ri)
    tab2 = table_for(freq2)
    whole2 = ns.encode_prog_ac_refine(blocks, 1, 63, 0, table=tab2,
                                      restart_interval=ri)
    pieces2 = []
    for k, lo in enumerate(range(0, n_blocks, ri)):
        if k > 0:
            pieces2.append(bytes([0xFF, 0xD0 + ((k - 1) & 7)]))
        pieces2.append(
            ns.encode_prog_ac_refine(blocks[lo : lo + ri], 1, 63, 0, table=tab2)
        )
    assert bytes(whole2) == b"".join(bytes(p) for p in pieces2)

    # DC
    freq_dc = [np.zeros(256, np.int64)]
    ns.encode_prog_dc([blocks], [1], n_blocks, 0, 1, freqs=freq_dc,
                      restart_interval=ri)
    tdc = table_for(freq_dc[0])
    whole3 = ns.encode_prog_dc([blocks], [1], n_blocks, 0, 1, tables=[tdc],
                               restart_interval=ri)
    pieces3 = []
    for k, lo in enumerate(range(0, n_blocks, ri)):
        if k > 0:
            pieces3.append(bytes([0xFF, 0xD0 + ((k - 1) & 7)]))
        pieces3.append(
            ns.encode_prog_dc([blocks[lo : lo + ri]], [1],
                              min(ri, n_blocks - lo), 0, 1, tables=[tdc])
        )
    assert bytes(whole3) == b"".join(bytes(p) for p in pieces3)

    # arithmetic DC + AC
    whole4 = ns.encode_arith_prog_dc([blocks], [1], n_blocks, 0, 1, [0], 0, 1,
                                     restart_interval=ri)
    pieces4 = []
    for k, lo in enumerate(range(0, n_blocks, ri)):
        if k > 0:
            pieces4.append(bytes([0xFF, 0xD0 + ((k - 1) & 7)]))
        pieces4.append(
            ns.encode_arith_prog_dc([blocks[lo : lo + ri]], [1],
                                    min(ri, n_blocks - lo), 0, 1, [0], 0, 1)
        )
    assert bytes(whole4) == b"".join(bytes(p) for p in pieces4)

    whole5 = ns.encode_arith_prog_ac(blocks, 0, 5, 1, 63, 0, 0,
                                     restart_interval=ri)
    pieces5 = []
    for k, lo in enumerate(range(0, n_blocks, ri)):
        if k > 0:
            pieces5.append(bytes([0xFF, 0xD0 + ((k - 1) & 7)]))
        pieces5.append(
            ns.encode_arith_prog_ac(blocks[lo : lo + ri], 0, 5, 1, 63, 0, 0)
        )
    assert bytes(whole5) == b"".join(bytes(p) for p in pieces5)


def test_restart_progressive_pil_decodes():
    """PIL/libjpeg must accept our restart-interval progressive streams
    (whole-scan native emission with embedded RSTn)."""
    import io

    from PIL import Image

    rng = np.random.default_rng(18)
    rgb = np.clip(
        np.linspace(0, 255, 96)[None, :, None] + rng.normal(0, 14, (80, 96, 3)),
        0, 255,
    ).astype(np.uint8)
    data = encode_progressive_rgb(rgb, 85, restart_interval=7)
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    # fancy upsampling = libjpeg's default filter, what PIL applies;
    # <=3 is the established IDCT-rounding tolerance vs libjpeg
    # (tests/test_cross_validation._assert_close)
    ours = np.asarray(jt.decode(data).to_rgb8(upsample="fancy"))
    diff = np.abs(pil.astype(int) - ours.astype(int))
    assert diff.max() <= 3 and diff.mean() <= 0.2
