"""Merged decode+sparse-pack fast path (sparse_direct): the native
scanner emits the 4-byte wire entries straight from the symbol loop in
MCU decode order (native/scanner.cpp jpx_decode_baseline_scan_sparse),
and the device transform un-interleaves with a reshape+transpose
(ops/pipeline.jitted_transform_mcu). These tests pin bit-exactness
against the dense path and the fallback behavior for ineligible
streams."""

import numpy as np
import pytest

import jpeglibrary_tpu as jt
from jpeglibrary_tpu.models.decoder import JpegDecoder

BASELINE_CASES = [
    "baseline/cramps.jpg",  # grayscale, 1x1 single component
    "baseline/lake.jpg",
    "baseline/HETissueSlide.jpg",
]


@pytest.fixture(scope="module")
def native_lib():
    from jpeglibrary_tpu.native import build

    try:
        return build.load_library()
    except ImportError as exc:
        pytest.skip(f"native scanner unavailable: {exc}")


def _decode_pair(data):
    d1 = JpegDecoder()
    d1.set_input(data)
    dense = d1.decode()
    d2 = JpegDecoder()
    d2.set_input(data)
    sparse = d2.decode(sparse_direct=True)
    return dense, sparse


@pytest.mark.parametrize("rel", BASELINE_CASES, ids=BASELINE_CASES)
def test_sparse_direct_matches_dense(assets_dir, native_lib, rel):
    dense, sparse = _decode_pair((assets_dir / rel).read_bytes())
    # the merged path now defaults to the v2 split-stream wire
    assert sparse.packed_mcu is not None or sparse.packed_mcu2 is not None
    # coefficients densify lazily from the payload; must be bit-exact
    for k in dense.coefficients:
        np.testing.assert_array_equal(dense.coefficients[k], sparse.coefficients[k])


def test_sparse_direct_restart_segments(assets_dir, native_lib):
    """Restart spans emit in parallel regions and compact with boundary
    delta patches — must still be bit-exact."""
    from jpeglibrary_tpu.models.encoder import encode_rgb

    rgb = jt.decode((assets_dir / "baseline/lake.jpg").read_bytes()).to_rgb8()
    data = encode_rgb(rgb, 75, restart_interval=5)
    dense, sparse = _decode_pair(data)
    assert sparse.packed_mcu is not None or sparse.packed_mcu2 is not None
    for k in dense.coefficients:
        np.testing.assert_array_equal(dense.coefficients[k], sparse.coefficients[k])


def test_sparse_direct_device_transform(assets_dir, native_lib):
    """The MCU-order device unpack produces the same pixels as the
    plane-order delta unpack (identical post-reconstruction program)."""
    data = (assets_dir / "baseline/lake.jpg").read_bytes()
    dense, sparse = _decode_pair(data)
    out_dense = np.asarray(dense.to_rgb8_device(sparse=True))
    out_mcu = np.asarray(sparse.to_rgb8_device())
    np.testing.assert_array_equal(out_dense, out_mcu)


def test_sparse_direct_falls_back_for_progressive(assets_dir, native_lib):
    data = (assets_dir / "huffman_progressive/progress.jpg").read_bytes()
    d = JpegDecoder()
    d.set_input(data)
    res = d.decode(sparse_direct=True)
    assert res.packed_mcu is None  # ineligible: not baseline
    ref = jt.decode(data)
    for k in ref.coefficients:
        np.testing.assert_array_equal(ref.coefficients[k], res.coefficients[k])


def test_grouped_stream_matches_ungrouped(assets_dir, native_lib):
    """decode_stream_rgb(group=k) stacks same-shape payloads into one
    vmapped dispatch — outputs must be identical to per-image dispatch,
    including across mixed geometries (fallback path)."""
    from jpeglibrary_tpu.parallel.batch import decode_stream_rgb

    datas = [
        (assets_dir / p).read_bytes()
        for p in (
            "baseline/lake.jpg",
            "baseline/cramps.jpg",
            "baseline/lake.jpg",
            "huffman_progressive/progress.jpg",
            "baseline/lake.jpg",
            "baseline/lake.jpg",
        )
    ]
    a = [np.asarray(x) for x in decode_stream_rgb(datas, group=1)]
    b = [
        np.asarray(x)
        for x in decode_stream_rgb(
            datas, group=4, scan_workers=2, device_workers=2
        )
    ]
    assert len(a) == len(b) == len(datas)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_sparse_direct_host_pixels(assets_dir, native_lib):
    """Host output paths (planes/to_rgb8) work off the lazy dense
    reconstruction and match the dense decode exactly."""
    data = (assets_dir / "baseline/cramps.jpg").read_bytes()
    dense, sparse = _decode_pair(data)
    np.testing.assert_array_equal(dense.to_rgb8(), sparse.to_rgb8())
    np.testing.assert_array_equal(
        dense.to_uint16_extended(), sparse.to_uint16_extended()
    )


def test_sparse_direct_long_flat_head_boundary_escape(native_lib):
    """Regression: a restart span whose first nonzero coefficient sits at
    MCU-order position >= 65535 needs boundary escape entries at the very
    start of the compacted payload.  The first non-empty span's region
    begins at offset 0 with no slack, so the escapes must be written
    AFTER the body memmove (writing them first clobbered the span's
    leading entries).  Repro: 4:2:0 (384 coefs/MCU), restart interval
    180 MCUs (180*384 = 69120 > 65535), flat-gray head covering the
    first ~175 MCUs so the first entry lands past position 65535."""
    from jpeglibrary_tpu.models.encoder import encode_rgb

    rng = np.random.default_rng(7)
    h, w = 18 * 16, 20 * 16  # 18x20 = 360 MCUs at 4:2:0
    rgb = np.full((h, w, 3), 128, dtype=np.uint8)
    # First nonzero block: MCU row 8, col 15 -> MCU index 175 (span 0).
    rgb[128:144, 240:256] = 0
    # Dense noise over the last 4 MCU rows (covers span 1 + boundary patch).
    rgb[14 * 16 :] = rng.integers(0, 256, (4 * 16, w, 3), dtype=np.uint8)
    data = encode_rgb(rgb, 90, restart_interval=180)
    dense, sparse = _decode_pair(data)
    assert sparse.packed_mcu is not None or sparse.packed_mcu2 is not None
    for k in dense.coefficients:
        np.testing.assert_array_equal(dense.coefficients[k], sparse.coefficients[k])


def test_speculative_single_span_multicomponent(assets_dir, native_lib, monkeypatch):
    """No-restart multi-component baseline: the speculative single-pass
    sparse decode (thread chunks self-sync on canonical bit positions,
    always-emitted DC entries + tracked DC indices for the predictor
    fixup) must be bit-exact vs the sequential scan."""
    monkeypatch.setenv("JPX_SCAN_THREADS", "4")
    from jpeglibrary_tpu.models.encoder import encode_rgb

    rgb = jt.decode((assets_dir / "baseline/lake.jpg").read_bytes()).to_rgb8()
    # Tile to make the stream long enough for >= 2 sync chunks (the
    # speculative path requires >= 64 KiB per chunk).
    big = np.concatenate([np.concatenate([rgb, rgb[:, ::-1]], axis=1)] * 2, axis=0)
    for subsampling in ("420", "444"):
        data = encode_rgb(big, 85, subsampling=subsampling)  # no restarts
        monkeypatch.setenv("JPX_SPECULATIVE", "0")
        seq, _ = (None, None)
        d = JpegDecoder(); d.set_input(data)
        seq = d.decode(sparse_direct=True)
        monkeypatch.setenv("JPX_SPECULATIVE", "1")
        d = JpegDecoder(); d.set_input(data)
        spec = d.decode(sparse_direct=True)
        assert spec.packed_mcu is not None or spec.packed_mcu2 is not None
        for k in seq.coefficients:
            np.testing.assert_array_equal(
                seq.coefficients[k], spec.coefficients[k], err_msg=subsampling
            )


def test_speculative_flat_head_boundary(native_lib, monkeypatch):
    """Speculative chunks over a long all-flat head must stitch with
    boundary escape entries exactly like the restart compaction."""
    monkeypatch.setenv("JPX_SCAN_THREADS", "4")
    from jpeglibrary_tpu.models.encoder import encode_rgb

    rng = np.random.default_rng(11)
    h, w = 44 * 16, 40 * 16
    rgb = np.full((h, w, 3), 128, dtype=np.uint8)
    rgb[h // 2 :] = rng.integers(0, 256, (h - h // 2, w, 3), dtype=np.uint8)
    data = encode_rgb(rgb, 90)  # no restarts
    monkeypatch.setenv("JPX_SPECULATIVE", "0")
    d = JpegDecoder(); d.set_input(data)
    seq = d.decode(sparse_direct=True)
    monkeypatch.setenv("JPX_SPECULATIVE", "1")
    d = JpegDecoder(); d.set_input(data)
    spec = d.decode(sparse_direct=True)
    for k in seq.coefficients:
        np.testing.assert_array_equal(seq.coefficients[k], spec.coefficients[k])
