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
    res = d.decode(sparse_direct=True)
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
