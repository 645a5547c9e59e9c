"""DNL (Define Number of Lines, T.81 B.2.5) support.

A SOF with a zero line count defers the image height to a DNL segment
at the end of the first scan; the static container walk resolves it
before any scan decodes (io.reader.resolve_dnl). The encoder side
emits such streams from an unknown-height stripe iterator
(JpegEncoder.set_input_stream / encode_rgb_stripes).

Beyond the reference: it only enumerates the DNL marker
(/root/reference/src/JpegLibrary/JpegMarker.cs) and its encoder
requires the height up front.
"""

import numpy as np
import pytest

import jpeglibrary_tpu as jt
from jpeglibrary_tpu.io import reader as io_reader
from jpeglibrary_tpu.models.decoder import JpegDecoder
from jpeglibrary_tpu.models.encoder import (
    JpegEncodeError,
    JpegEncoder,
    encode_rgb,
    encode_rgb_stripes,
)
from jpeglibrary_tpu.syntax.markers import Marker


def make_dnl_variant(data: bytes) -> bytes:
    """Rewrite a complete stream: SOF lines -> 0, DNL before EOI."""
    stream = io_reader.parse_stream(data)
    sof = next(
        s for s in stream.segments if 0xC0 <= s.marker <= 0xCF
        and s.marker not in (0xC4, 0xC8, 0xCC)
    )
    lines_off = sof.payload_start + 1  # precision byte, then 2-byte lines
    lines = (data[lines_off] << 8) | data[lines_off + 1]
    mutated = bytearray(data)
    mutated[lines_off] = 0
    mutated[lines_off + 1] = 0
    eoi = bytes(mutated).rfind(b"\xff\xd9")
    assert eoi > 0
    dnl = bytes([0xFF, 0xDC, 0x00, 0x04, (lines >> 8) & 0xFF, lines & 0xFF])
    return bytes(mutated[:eoi]) + dnl + bytes(mutated[eoi:])


@pytest.fixture(scope="module")
def lake(assets_dir):
    return (assets_dir / "baseline/lake.jpg").read_bytes()


def test_dnl_decode_matches_original(lake):
    dnl = make_dnl_variant(lake)
    ref = jt.decode(lake)
    got = jt.decode(dnl)
    assert got.height == ref.height
    assert np.array_equal(got.to_rgb8(), ref.to_rgb8())


def test_dnl_sparse_direct_falls_back(lake):
    # The fused native walk is ineligible for zero-lines SOFs
    # (scanner.cpp returns -10); sparse_direct must transparently take
    # the general path and still match.
    dnl = make_dnl_variant(lake)
    dec = JpegDecoder()
    dec.set_input(dnl)
    got = dec.decode(sparse_direct=True)
    assert np.array_equal(got.to_rgb8(), jt.decode(lake).to_rgb8())


def test_dnl_identify_reports_resolved_height(lake):
    dnl = make_dnl_variant(lake)
    dec = JpegDecoder()
    dec.set_input(dnl)
    info = dec.identify()
    assert info.height == jt.decode(lake).height


def test_dnl_missing_raises(lake):
    stream = io_reader.parse_stream(lake)
    sof = next(s for s in stream.segments if s.marker == Marker.SOF0)
    mutated = bytearray(lake)
    mutated[sof.payload_start + 1] = 0
    mutated[sof.payload_start + 2] = 0
    dec = JpegDecoder()
    dec.set_input(bytes(mutated))
    with pytest.raises(io_reader.JpegStreamError):
        dec.decode()


def test_dnl_optimizer_roundtrip(lake):
    dnl = make_dnl_variant(lake)
    optimized = jt.optimize(dnl)
    assert len(optimized) < len(dnl)
    # DNL is structural: it must survive the strip pass.
    assert any(
        s.marker == Marker.DNL
        for s in io_reader.parse_stream(optimized).segments
    )
    assert np.array_equal(
        jt.decode(optimized).to_rgb8(), jt.decode(lake).to_rgb8()
    )


@pytest.mark.parametrize("subsampling,ri", [("420", 0), ("420", 16), ("444", 0)])
def test_encode_rgb_stripes_dnl(lake, subsampling, ri):
    rgb = jt.decode(lake).to_rgb8()
    h, w = rgb.shape[:2]
    rows_per_mcu = 16 if subsampling == "420" else 8
    # 3 MCU rows per stripe; the final stripe is partial.
    step = 3 * rows_per_mcu

    def stripes():
        for y0 in range(0, h, step):
            yield rgb[y0 : min(h, y0 + step)]

    data = encode_rgb_stripes(
        stripes(), w, 80, subsampling=subsampling, restart_interval=ri
    )
    stream = io_reader.parse_stream(data)
    sof = next(s for s in stream.segments if s.marker == Marker.SOF0)
    assert (data[sof.payload_start + 1] << 8) | data[sof.payload_start + 2] == 0
    assert any(s.marker == Marker.DNL for s in stream.segments)

    got = jt.decode(data)
    assert got.height == h and got.width == w
    # Pixel-exact vs the buffered encoder with the same fixed tables.
    buffered = encode_rgb(rgb, 80, subsampling=subsampling, restart_interval=ri)
    assert np.array_equal(got.to_rgb8(), jt.decode(buffered).to_rgb8())


def test_encode_stripes_partial_mid_stripe_raises(lake):
    rgb = jt.decode(lake).to_rgb8()[:100]
    w = rgb.shape[1]

    def stripes():
        yield rgb[:20]  # partial MCU rows, not last
        yield rgb[20:]

    enc = JpegEncoder()
    from jpeglibrary_tpu.syntax.huffman_standard import (
        ac_chrominance, ac_luminance, dc_chrominance, dc_luminance,
    )
    from jpeglibrary_tpu.syntax.quantization import (
        scale_by_quality, standard_chrominance_table, standard_luminance_table,
    )

    enc.set_quantization_table(scale_by_quality(standard_luminance_table(0), 75))
    enc.set_quantization_table(scale_by_quality(standard_chrominance_table(1), 75))
    enc.set_huffman_table(True, 0, dc_luminance())
    enc.set_huffman_table(False, 0, ac_luminance())
    enc.set_huffman_table(True, 1, dc_chrominance())
    enc.set_huffman_table(False, 1, ac_chrominance())
    enc.add_component(1, 0, 0, 0, 2, 2)
    enc.add_component(2, 1, 1, 1, 1, 1)
    enc.add_component(3, 1, 1, 1, 1, 1)

    from jpeglibrary_tpu.ops import color as color_ops

    def ycc():
        for band in stripes():
            yield list(
                color_ops.rgb_to_ycbcr(
                    band[..., 0], band[..., 1], band[..., 2], xp=np
                )
            )

    enc.set_input_stream(ycc(), w)
    with pytest.raises(JpegEncodeError):
        enc.encode()


def test_dnl_through_fused_decode_rgb8():
    """A DNL-deferred-height stream must ride the fused one-call host
    path (resolve_dnl runs inside its eligibility pass) bit-identically
    to the staged decode."""
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    dnl = make_dnl_variant(encode_rgb(rgb, 85, restart_interval=2))
    from jpeglibrary_tpu.models.decoder import _decode_rgb8_fused

    assert _decode_rgb8_fused(dnl, "duplicate") is not None  # engages
    assert np.array_equal(jt.decode_rgb8(dnl), jt.decode(dnl).to_rgb8())
