"""Region-of-interest decode: jt.decode_region must equal the exact
crop of the full-image decode for every mode — via the native
restart-span-skipping fast path where eligible (baseline + DRI) and
the full-decode fallback everywhere else."""

import numpy as np
import pytest

import jpeglibrary_tpu as jt


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(11)


@pytest.fixture(scope="module")
def rgb(rng):
    h, w = 403, 517
    return np.clip(
        np.linspace(0, 255, w)[None, :, None] + rng.normal(0, 25, (h, w, 3)),
        0,
        255,
    ).astype(np.uint8)


RECTS = [
    (0, 0, 16, 16),
    (100, 50, 64, 64),
    (500, 390, 17, 13),  # bottom-right corner, partial MCU
    (7, 9, 33, 21),
    (256, 128, 128, 200),
    (0, 0, 517, 403),  # whole image
]


@pytest.mark.parametrize("interval", [1, 5, 64])
def test_restart_fast_path_exact(rgb, interval):
    data = jt.encode_rgb(rgb, 80, restart_interval=interval)
    full = jt.decode(data).to_rgb8()
    for (x, y, w, h) in RECTS:
        tile = jt.decode_region(data, x, y, w, h)
        assert tile.shape == (h, w, 3)
        assert np.array_equal(tile, full[y : y + h, x : x + w]), (x, y, w, h)


@pytest.mark.parametrize("sub", ["444", "422", "420"])
def test_subsampling_exact(rgb, sub):
    data = jt.encode_rgb(rgb, 80, subsampling=sub, restart_interval=7)
    full = jt.decode(data).to_rgb8()
    for (x, y, w, h) in RECTS[:4]:
        assert np.array_equal(
            jt.decode_region(data, x, y, w, h), full[y : y + h, x : x + w]
        )


def test_fancy_upsample_exact(rgb):
    # The triangular filter reads neighbor chroma across block edges;
    # the fast path adds an iMCU margin to reproduce interior tiles.
    data = jt.encode_rgb(rgb, 80, restart_interval=5)
    full = jt.decode(data).to_rgb8(upsample="fancy")
    for (x, y, w, h) in [(100, 50, 64, 64), (0, 0, 40, 40), (480, 380, 37, 23)]:
        tile = jt.decode_region(data, x, y, w, h, upsample="fancy")
        assert np.array_equal(tile, full[y : y + h, x : x + w]), (x, y, w, h)


def test_gray_exact(rng):
    g = rng.integers(0, 256, (130, 217), dtype=np.uint8)
    data = jt.encode_gray(g, 85, restart_interval=3)
    full = jt.decode(data).to_rgb8()
    tile = jt.decode_region(data, 10, 20, 100, 90)
    assert np.array_equal(tile, full[20:110, 10:110])


def test_no_restart_fallback(rgb):
    data = jt.encode_rgb(rgb, 80)  # no DRI -> full-decode fallback
    full = jt.decode(data).to_rgb8()
    assert np.array_equal(jt.decode_region(data, 33, 44, 55, 66), full[44:110, 33:88])


def test_progressive_fallback(rgb):
    from jpeglibrary_tpu.models.progressive_encoder import encode_progressive_rgb

    data = encode_progressive_rgb(rgb, 80)
    full = jt.decode(data).to_rgb8()
    assert np.array_equal(jt.decode_region(data, 10, 20, 30, 40), full[20:60, 10:40])


def test_lossless_fallback(rgb):
    data = jt.encode_lossless(rgb, predictor=1)
    full = jt.decode(data).to_rgb8()
    assert np.array_equal(jt.decode_region(data, 5, 6, 20, 10), full[6:16, 5:25])


def test_bounds_checked(rgb):
    data = jt.encode_rgb(rgb, 80, restart_interval=5)
    with pytest.raises(ValueError):
        jt.decode_region(data, 510, 0, 16, 16)  # x+w > width
    with pytest.raises(ValueError):
        jt.decode_region(data, 0, 400, 8, 8)  # y+h > height
    with pytest.raises(ValueError):
        jt.decode_region(data, -1, 0, 8, 8)
    with pytest.raises(ValueError):
        jt.decode_region(data, 0, 0, 0, 8)


def test_fixture_asset_tiles(assets_dir):
    # A real camera-style asset (the progressive restart fixture decodes
    # via fallback; the baseline one may or may not carry DRI) — the
    # contract is exact-crop equality regardless of path taken.
    path = assets_dir / "baseline/lake.jpg"
    data = path.read_bytes()
    full = jt.decode(data).to_rgb8()
    for (x, y, w, h) in [(0, 0, 32, 32), (500, 300, 100, 100), (1000, 700, 24, 68)]:
        assert np.array_equal(
            jt.decode_region(data, x, y, w, h), full[y : y + h, x : x + w]
        )


def test_truncated_restart_stream_partial_semantics(rgb):
    # Chop the stream mid-scan. Partial-decode semantics (documented in
    # decode_region): a tile whose covering spans are intact decodes
    # fine and equals the tolerant full decode's crop; a tile over the
    # truncated spans raises the same error family as a full decode.
    data = jt.encode_rgb(rgb, 80, restart_interval=5)
    cut = data[: int(len(data) * 0.5)]

    with pytest.raises(Exception):
        jt.decode(cut).to_rgb8()  # full decode sees the truncation

    # Every tile — intact area, truncation boundary, missing tail —
    # equals the tolerant full decode's crop (missing spans stay zero
    # coefficients = mid-gray, exactly like the tolerant path).
    tolerant = jt.decode(cut, tolerant=True).to_rgb8()
    for y in (0, 176, 216, 403 - 16):
        tile = jt.decode_region(cut, 0, y, 16, 16)
        assert np.array_equal(tile, tolerant[y : y + 16, :16]), y


# ---------------------------------------------------------------------------
# Round-4: progressive + lossless span-skipping fast paths
# ---------------------------------------------------------------------------


def _fast(data, x, y, w, h, upsample="duplicate"):
    from jpeglibrary_tpu.models import region as region_mod

    return region_mod._decode_region_fast(data, x, y, w, h, upsample, np)


@pytest.mark.parametrize("interval", [3, 64, 200])
def test_progressive_fast_path_exact(rgb, interval):
    from jpeglibrary_tpu.models.progressive_encoder import encode_progressive_rgb

    data = encode_progressive_rgb(rgb, 80, restart_interval=interval)
    full = jt.decode(data).to_rgb8()
    # the fast path must actually engage (SOF2 + DRI on every scan)
    assert _fast(data, 100, 50, 64, 64) is not None
    for (x, y, w, h) in RECTS:
        tile = jt.decode_region(data, x, y, w, h)
        assert np.array_equal(tile, full[y : y + h, x : x + w]), (
            interval, x, y, w, h,
        )


def test_progressive_fast_path_fancy_and_gray(rgb, rng):
    from jpeglibrary_tpu.models.progressive_encoder import (
        encode_progressive_gray,
        encode_progressive_rgb,
    )

    data = encode_progressive_rgb(rgb, 80, restart_interval=17)
    full = jt.decode(data).to_rgb8(upsample="fancy")
    for (x, y, w, h) in [(100, 50, 64, 64), (0, 0, 40, 40), (480, 380, 37, 23)]:
        tile = jt.decode_region(data, x, y, w, h, upsample="fancy")
        assert np.array_equal(tile, full[y : y + h, x : x + w]), (x, y, w, h)

    g = rng.integers(0, 256, (130, 217), dtype=np.uint8)
    gdata = encode_progressive_gray(g, 85, restart_interval=9)
    gfull = jt.decode(gdata).to_rgb8()
    assert _fast(gdata, 10, 20, 100, 90) is not None
    assert np.array_equal(
        jt.decode_region(gdata, 10, 20, 100, 90), gfull[20:110, 10:110]
    )


def test_progressive_fast_path_truncation_semantics(rgb):
    # Tiles whose covering spans are intact decode even when the stream
    # is truncated elsewhere (partial-decode semantics, like baseline).
    from jpeglibrary_tpu.models.progressive_encoder import encode_progressive_rgb

    data = encode_progressive_rgb(rgb, 80, restart_interval=5)
    cut = data[: int(len(data) * 0.7)]
    tolerant = jt.decode(cut, tolerant=True).to_rgb8()
    tile = jt.decode_region(cut, 0, 0, 32, 32)
    assert np.array_equal(tile, tolerant[:32, :32])


@pytest.mark.parametrize("rows_per_span", [1, 4])
def test_lossless_fast_path_exact(rgb, rows_per_span):
    w_img = rgb.shape[1]
    data = jt.encode_lossless(
        rgb, predictor=1, restart_interval=rows_per_span * w_img
    )
    full = jt.decode(data).to_rgb8()
    assert _fast(data, 100, 50, 64, 64) is not None
    for (x, y, w, h) in RECTS:
        tile = jt.decode_region(data, x, y, w, h)
        assert np.array_equal(tile, full[y : y + h, x : x + w]), (
            rows_per_span, x, y, w, h,
        )


def test_lossless_fast_path_gating(rgb):
    w_img = rgb.shape[1]
    # predictor != 1 references the previous span's last row -> fallback
    d2 = jt.encode_lossless(rgb, predictor=2, restart_interval=w_img)
    assert _fast(d2, 100, 50, 64, 64) is None
    full2 = jt.decode(d2).to_rgb8()
    assert np.array_equal(jt.decode_region(d2, 5, 6, 20, 10), full2[6:16, 5:25])
    # non-row-aligned interval -> fallback
    d3 = jt.encode_lossless(rgb, predictor=1, restart_interval=100)
    assert _fast(d3, 100, 50, 64, 64) is None
    full3 = jt.decode(d3).to_rgb8()
    assert np.array_equal(jt.decode_region(d3, 5, 6, 20, 10), full3[6:16, 5:25])


@pytest.mark.parametrize("progressive", [False, True])
def test_arithmetic_fast_path_exact(rgb, progressive):
    # RSTn fully resets the arithmetic coder + statistics bins, so the
    # same banded fast path covers SOF9/SOF10.
    if progressive:
        from jpeglibrary_tpu.models.progressive_encoder import encode_progressive_rgb

        data = encode_progressive_rgb(rgb, 80, arithmetic=True, restart_interval=24)
    else:
        data = jt.encode_rgb(rgb, 80, arithmetic=True, restart_interval=24)
    full = jt.decode(data).to_rgb8()
    assert _fast(data, 100, 50, 64, 64) is not None
    for (x, y, w, h) in RECTS[:5]:
        tile = jt.decode_region(data, x, y, w, h)
        assert np.array_equal(tile, full[y : y + h, x : x + w]), (
            progressive, x, y, w, h,
        )


def test_arithmetic_gray_fast_path(rng):
    g = rng.integers(0, 256, (130, 217), dtype=np.uint8)
    d = jt.encode_gray(g, 85, arithmetic=True, restart_interval=6)
    full = jt.decode(d).to_rgb8()
    assert _fast(d, 10, 20, 100, 90) is not None
    assert np.array_equal(jt.decode_region(d, 10, 20, 100, 90), full[20:110, 10:110])


def test_progressive_fast_path_dri_redeclared_between_scans(rgb):
    """DRI segments may appear between scans (T.81 B.2.4.4); the
    banded fast path tracks the interval in force at each SOS. Splice
    a (legal, same-value) DRI re-declaration before a later SOS so the
    per-scan tracking actually walks multiple DRI segments."""
    from jpeglibrary_tpu.io.reader import parse_stream
    from jpeglibrary_tpu.models.progressive_encoder import encode_progressive_rgb
    from jpeglibrary_tpu.syntax.markers import Marker

    data = encode_progressive_rgb(rgb, 80, restart_interval=8)
    sos_offsets = [
        seg.offset
        for seg in parse_stream(data).segments
        if seg.marker == Marker.SOS
    ]
    assert len(sos_offsets) >= 3
    dri = bytes([0xFF, 0xDD, 0x00, 0x04, 0x00, 8])  # re-declare ri=8
    pos = sos_offsets[2]
    spliced = data[:pos] + dri + data[pos:]
    full = jt.decode(spliced).to_rgb8()
    assert np.array_equal(full, jt.decode(data).to_rgb8())
    assert _fast(spliced, 100, 50, 64, 64) is not None
    for (x, y, w, h) in RECTS[:4]:
        tile = jt.decode_region(spliced, x, y, w, h)
        assert np.array_equal(tile, full[y : y + h, x : x + w]), (x, y, w, h)


def _splice_dri_change(rgb, *, arithmetic, ri_a=10, ri_b=8):
    """Build a VALID stream whose DRI changes between scans: scans
    before the first refinement scan come from an encoding at ri_a,
    the refinement scans (and their tables) from an encoding of the
    SAME image at ri_b, with a DRI re-declaration spliced between
    (T.81 B.2.4.4). The coefficients are identical in both encodings,
    so the splice decodes exactly like either original."""
    from jpeglibrary_tpu.io.reader import parse_stream
    from jpeglibrary_tpu.models.progressive_encoder import encode_progressive_rgb
    from jpeglibrary_tpu.syntax.frame import ScanHeader
    from jpeglibrary_tpu.syntax.markers import Marker

    a = encode_progressive_rgb(
        rgb, 80, arithmetic=arithmetic, restart_interval=ri_a
    )
    b = encode_progressive_rgb(
        rgb, 80, arithmetic=arithmetic, restart_interval=ri_b
    )

    sa = parse_stream(a)
    sb = parse_stream(b)
    sos_a = [seg for seg in sa.segments if seg.marker == Marker.SOS]
    sos_b = [seg for seg in sb.segments if seg.marker == Marker.SOS]
    assert len(sos_a) == len(sos_b)
    k = next(
        i
        for i, seg in enumerate(sos_a)
        if ScanHeader.parse(
            seg.payload(a)
        ).successive_approximation_bit_position_high
        > 0
    )
    assert k > 0

    parts = [a[: sos_a[k].offset]]
    if not arithmetic:
        # The b-encoding's Huffman tables differ (DC diffs reset at
        # different restart boundaries); re-declare them for its scans.
        dht_b = next(seg for seg in sb.segments if seg.marker == Marker.DHT)
        parts.append(
            b[dht_b.offset : dht_b.offset + 4 + len(dht_b.payload(b))]
        )
    parts.append(bytes([0xFF, 0xDD, 0x00, 0x04, (ri_b >> 8) & 0xFF, ri_b & 0xFF]))
    parts.append(b[sos_b[k].offset :])  # scans k.. + EOI
    spliced = b"".join(parts)

    full = jt.decode(spliced).to_rgb8()
    # The splice really is the same image (coefficients identical).
    assert np.array_equal(full, jt.decode(a).to_rgb8())
    return spliced, full


@pytest.mark.parametrize("arithmetic", [False, True])
def test_banded_fast_path_dri_change_before_refinement(rgb, arithmetic):
    """Advisor round-4 finding: with DRI legally CHANGING between
    scans, per-scan snapping let a refinement scan decode leading units
    whose first-pass history was never decoded into the band planes,
    desyncing correction-bit / arithmetic-context decoding. The banded
    path now snaps every scan to one shared MCU-row alignment whenever
    any scan refines (Ah > 0)."""
    spliced, full = _splice_dri_change(rgb, arithmetic=arithmetic)
    assert _fast(spliced, 100, 50, 64, 64) is not None
    for (x, y, w, h) in RECTS[:5] + [(40, 80, 240, 64)]:
        tile = jt.decode_region(spliced, x, y, w, h)
        assert np.array_equal(tile, full[y : y + h, x : x + w]), (
            arithmetic, x, y, w, h,
        )


def _spliced_sof9_noninterleaved(rng, ri=40):
    """A valid SOF9 stream with THREE NON-interleaved sequential scans
    (one per 1x1 component), assembled from three grayscale SOF9
    encodes of the planes: at 1x1 sampling a grayscale scan's
    frame-MCU walk is identical to the non-interleaved scan's walk in
    the merged frame (the reference decodes Ns=1 sequential scans with
    the frame-grid walk, JpegArithmeticSequentialScanDecoder.cs:85-140),
    so the scan bodies byte-transplant with only the SOS component
    selector patched."""
    from jpeglibrary_tpu.io.reader import parse_stream
    from jpeglibrary_tpu.syntax.markers import Marker

    h, w = 96, 160
    planes = [
        np.clip(
            np.linspace(0, 255, w)[None, :] + rng.normal(0, 25, (h, w)),
            0, 255,
        ).astype(np.uint8)
        for _ in range(3)
    ]
    grays = [
        jt.encode_gray(p, 80, arithmetic=True, restart_interval=ri)
        for p in planes
    ]

    def seg_bytes(data, marker):
        for seg in parse_stream(data).segments:
            if seg.marker == marker:
                return data[seg.offset : seg.offset + 4 + len(seg.payload(data))]
        return b""

    sof = bytearray(
        [0xFF, 0xC9, 0, 17, 8, h >> 8, h & 255, w >> 8, w & 255, 3,
         1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    parts = [
        b"\xff\xd8",
        seg_bytes(grays[0], Marker.DQT),
        seg_bytes(grays[0], Marker.DAC),
        bytes(sof),
        seg_bytes(grays[0], Marker.DRI),
    ]
    for ci, g in enumerate(grays):
        st = parse_stream(g)
        sos = next(seg for seg in st.segments if seg.marker == Marker.SOS)
        body = bytearray(g[sos.offset : g.rfind(b"\xff\xd9")])
        assert body[4] == 1  # Ns
        body[5] = ci + 1  # component selector
        parts.append(bytes(body))
    parts.append(b"\xff\xd9")
    return b"".join(parts)


def test_sof9_noninterleaved_scans_native_and_region(rng):
    """Non-interleaved sequential arithmetic scans (round-4 review ask
    #6): the native walker must match the pure-Python decoder bit-exact
    and the banded region fast path must engage and equal the
    full-decode crop."""
    from jpeglibrary_tpu.models.decoder import JpegDecoder

    spliced = _spliced_sof9_noninterleaved(rng)
    d1 = JpegDecoder(); d1.set_input(spliced)
    r_native = d1.decode(use_native=True)
    d2 = JpegDecoder(); d2.set_input(spliced)
    r_python = d2.decode(use_native=False)
    for c in range(3):
        assert np.array_equal(
            r_native.coefficients[c], r_python.coefficients[c]
        ), c
    full = r_native.to_rgb8()
    assert _fast(spliced, 24, 16, 64, 48) is not None
    for (x, y, w, h) in [(24, 16, 64, 48), (0, 0, 16, 16), (130, 70, 30, 26)]:
        tile = jt.decode_region(spliced, x, y, w, h)
        assert np.array_equal(tile, full[y : y + h, x : x + w]), (x, y, w, h)
