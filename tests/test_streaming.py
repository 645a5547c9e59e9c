"""Bounded-memory stripe streaming decode (models.streaming): stitched
stripes must equal the full-image decode exactly, without the full RGB
image ever materializing inside the pipeline."""

import numpy as np
import pytest

import jpeglibrary_tpu as jt


@pytest.fixture(scope="module")
def native_lib():
    from jpeglibrary_tpu.native import build

    try:
        return build.load_library()
    except ImportError as exc:
        pytest.skip(f"native scanner unavailable: {exc}")


@pytest.mark.parametrize(
    "rel,stripe_rows",
    [
        ("baseline/lake.jpg", 8),
        ("baseline/lake.jpg", 7),   # uneven final stripe
        ("baseline/cramps.jpg", 16),  # grayscale, odd height (607)
    ],
)
def test_stripes_match_full_decode(assets_dir, native_lib, rel, stripe_rows):
    from jpeglibrary_tpu.models.streaming import decode_rgb_stripes

    data = (assets_dir / rel).read_bytes()
    full = jt.decode(data).to_rgb8()  # [H, W, 3] host reference

    rows = []
    next_y = 0
    for y0, stripe in decode_rgb_stripes(
        data, stripe_mcu_rows=stripe_rows, device=False
    ):
        assert y0 == next_y
        rows.append(np.moveaxis(stripe, 0, -1))  # [h, W, 3]
        next_y += stripe.shape[1]
    stitched = np.concatenate(rows, axis=0)
    assert stitched.shape == full.shape
    # CPU jit contracts mul+add into FMA (+-1 LSB vs the numpy host
    # path); compare against the jitted full-image transform instead,
    # which must be bit-identical.
    from jpeglibrary_tpu.models.decoder import JpegDecoder

    d = JpegDecoder()
    d.set_input(data)
    ref = np.moveaxis(
        np.asarray(d.decode(sparse_direct=True).to_rgb8_device()), 0, -1
    )
    np.testing.assert_array_equal(stitched, ref)
    # and the host path stays within 1 LSB
    assert np.max(np.abs(stitched.astype(int) - full.astype(int))) <= 1


def test_streaming_bounded_memory_large_asset(assets_dir, native_lib):
    """HETissueSlide-class input: the stream's working set (sparse
    payload + one stripe) stays well under one full RGB plane, and the
    stitched output equals the full-image jitted decode exactly."""
    from jpeglibrary_tpu.models.decoder import JpegDecoder
    from jpeglibrary_tpu.models.streaming import decode_rgb_stripes

    data = (assets_dir / "baseline/HETissueSlide.jpg").read_bytes()
    d = JpegDecoder()
    d.set_input(data)
    res = d.decode(sparse_direct=True, wire="v1")
    rgb_plane_bytes = res.width * res.height * 3
    payload_bytes = res.packed_mcu.nbytes
    stripe_rows = 16
    stripe_bytes = 3 * stripe_rows * 8 * res.geometry.max_v * res.width
    assert payload_bytes + stripe_bytes < rgb_plane_bytes, (
        payload_bytes, stripe_bytes, rgb_plane_bytes,
    )

    ref = np.asarray(res.to_rgb8_device())
    rows = []
    for _, stripe in decode_rgb_stripes(data, stripe_mcu_rows=stripe_rows,
                                        device=False):
        rows.append(stripe)
    stitched = np.concatenate(rows, axis=1)
    np.testing.assert_array_equal(stitched, ref)


def test_stripes_v1_wire_fallback(assets_dir, native_lib, monkeypatch):
    """JPX_WIRE=1 pins the v1 MCU-entry payload; the streaming walk must
    take the v1 branch and produce pixels identical to the v2 branch."""
    from jpeglibrary_tpu.models.streaming import decode_rgb_stripes

    data = (assets_dir / "baseline/lake.jpg").read_bytes()
    v2 = [np.asarray(s) for _, s in
          decode_rgb_stripes(data, stripe_mcu_rows=8, device=False)]
    monkeypatch.setenv("JPX_WIRE", "1")
    v1 = [np.asarray(s) for _, s in
          decode_rgb_stripes(data, stripe_mcu_rows=8, device=False)]
    assert len(v1) == len(v2)
    for a, b in zip(v1, v2):
        np.testing.assert_array_equal(a, b)


def test_streaming_consumer_callback(assets_dir, native_lib):
    from jpeglibrary_tpu.models.streaming import decode_rgb_streaming

    data = (assets_dir / "baseline/lake.jpg").read_bytes()
    seen = []
    decode_rgb_streaming(
        data, lambda y0, s: seen.append((y0, s.shape)), stripe_mcu_rows=16
    )
    assert seen and seen[0][0] == 0


def test_streaming_rejects_progressive(assets_dir, native_lib):
    from jpeglibrary_tpu.models.streaming import decode_rgb_stripes

    data = (assets_dir / "huffman_progressive/progress.jpg").read_bytes()
    with pytest.raises(ValueError):
        next(decode_rgb_stripes(data))


LOSSLESS_FIXTURES = [f"huffman_lossless/lossless{i}_s22.jpg" for i in range(1, 8)]


@pytest.mark.parametrize("rel", LOSSLESS_FIXTURES)
def test_lossless_rows_bit_exact(assets_dir, native_lib, rel):
    """The bounded-memory lossless row stream must reproduce the batch
    decoder's sample planes bit-exactly on all 7 predictor fixtures
    (subsampled _s22 interleave)."""
    from jpeglibrary_tpu.models.streaming import decode_lossless_rows

    data = (assets_dir / rel).read_bytes()
    full = jt.decode(data)  # batch path: full sample planes

    got = {ci: [] for ci in full.samples}
    for _y0, panels in decode_lossless_rows(data, mcu_rows=3):
        for ci, p in panels.items():
            got[ci].append(p)
    for ci, plane in full.samples.items():
        stitched = np.concatenate(got[ci], axis=0)
        # panels cover the padded MCU grid; crop to the plane's rows
        np.testing.assert_array_equal(stitched[: plane.shape[0]], plane)


@pytest.mark.parametrize("predictor", [1, 4, 7])
def test_lossless_rows_restart_interval(native_lib, predictor):
    """Row streaming across restart-span boundaries (spans end mid-row):
    must match the batch decode bit-exactly."""
    from jpeglibrary_tpu.models.lossless import encode_lossless
    from jpeglibrary_tpu.models.streaming import decode_lossless_rows

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (53, 41, 3), dtype=np.uint8)
    # 37 MCUs per restart interval: not a divisor of the 41-pixel rows
    data = encode_lossless(img, predictor=predictor, restart_interval=37)
    full = jt.decode(data)
    got = {ci: [] for ci in full.samples}
    for _y0, panels in decode_lossless_rows(data, mcu_rows=5):
        for ci, p in panels.items():
            got[ci].append(p)
    for ci, plane in full.samples.items():
        np.testing.assert_array_equal(np.concatenate(got[ci], axis=0), plane)


def test_lossless_rows_bounded_memory(native_lib):
    """A 12 MP lossless image decodes through the row stream with peak
    traced memory far below one sample plane set — the 16-row-ring
    capability (JpegPartialScanlineAllocator.cs:11,60)."""
    import tracemalloc

    from jpeglibrary_tpu.models.lossless import encode_lossless
    from jpeglibrary_tpu.models.streaming import decode_lossless_rows

    h, w = 3072, 4096
    rows = (np.arange(h, dtype=np.uint32)[:, None] // 16).astype(np.uint8)
    img = np.broadcast_to(rows, (h, w)).copy()
    data = encode_lossless(img, predictor=1)
    del img, rows

    tracemalloc.start()
    tracemalloc.reset_peak()
    count = 0
    checksum = 0
    for _y0, panels in decode_lossless_rows(data, mcu_rows=16):
        count += panels[0].shape[0]
        checksum += int(panels[0].sum())
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert count == h
    # int16 plane would be 25 MB; one 16-row panel is 128 KB
    assert peak < 4 * w * 16 * 2 * 8, f"peak {peak} not O(rows)"

    full = jt.decode(data)
    assert checksum == int(full.samples[0].sum())


@pytest.mark.parametrize(
    "h,w,sub,ri",
    [
        (41, 57, "420", 0),    # odd dims, partial tail stripe
        (64, 48, "422", 7),    # max_v=1 grid, restart seams mid-stripe
        (129, 96, "444", 11),  # 1x1 sampling, odd height
        (24, 200, "420", 3),   # fewer MCU rows than one stripe
    ],
)
def test_stripes_random_geometries(native_lib, h, w, sub, ri):
    """The v2 stripe walk must stitch bit-exact to the jitted full
    decode across sampling layouts, odd dimensions, restart seams, and
    images shorter than one stripe."""
    import jpeglibrary_tpu as jt
    from jpeglibrary_tpu.models.decoder import JpegDecoder
    from jpeglibrary_tpu.models.streaming import decode_rgb_stripes

    rng = np.random.default_rng(h * 1000 + w)
    img = np.clip(
        np.linspace(0, 255, w)[None, :, None]
        + rng.normal(0, 20, (h, w, 3)),
        0, 255,
    ).astype(np.uint8)
    data = jt.encode_rgb(img, 80, subsampling=sub, restart_interval=ri)

    d = JpegDecoder()
    d.set_input(data)
    res = d.decode(sparse_direct=True)
    assert res.packed_mcu2 is not None  # the walk must ride v2
    ref = np.asarray(res.to_rgb8_device())

    rows = [s for _, s in decode_rgb_stripes(data, stripe_mcu_rows=4,
                                             device=False)]
    stitched = np.concatenate(rows, axis=1)
    np.testing.assert_array_equal(stitched, ref)
