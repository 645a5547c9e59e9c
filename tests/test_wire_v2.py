"""v2 split-stream sparse wire format: the device payload that halves
the host->device transfer bytes (native.scanner.decode_image_sparse2).
Differential-tested against the v1 wire at every level: raw payload
densification, DecodeResult host reconstruction, and the device
transform through the single-image and grouped pipelines."""

import os

import numpy as np
import pytest

import jpeglibrary_tpu as jt
from jpeglibrary_tpu.native import scanner as ns

pytestmark = pytest.mark.skipif(
    os.environ.get("JPX_NO_NATIVE") == "1", reason="native scanner disabled"
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(17)


@pytest.fixture(scope="module")
def rgb(rng):
    h, w = 211, 333
    return np.clip(
        np.linspace(0, 255, w)[None, :, None] + rng.normal(0, 30, (h, w, 3)),
        0,
        255,
    ).astype(np.uint8)


def _densify_v1(payload, nb):
    p = payload.reshape(-1, 2)
    deltas = p[:, 0].astype(np.int64) & 0xFFFF
    vals = p[:, 1].astype(np.int32)
    pos = np.cumsum(deltas) - 1
    dense = np.zeros(nb * 64, dtype=np.int32)
    np.add.at(dense, pos, vals)
    return dense


def _densify_v2(payload, nb):
    k = payload.shape[0]
    bn = (k - 3 * nb) * 8 // 17
    be = bn // 64
    assert 3 * nb + 2 * bn + 8 * be == k
    dc = payload[: 2 * nb].view(np.int16).astype(np.int32)
    cnt = payload[2 * nb : 3 * nb].astype(np.int64)
    acpos = payload[3 * nb : 3 * nb + bn].astype(np.int64)
    acval = payload[3 * nb + bn : 3 * nb + 2 * bn].view(np.int8).astype(np.int32)
    exc = payload[3 * nb + 2 * bn :].view(np.int32).reshape(be, 2)
    block_id = np.repeat(np.arange(nb, dtype=np.int64), cnt)
    n_ac = block_id.shape[0]
    dense = np.zeros(nb * 64, dtype=np.int32)
    np.add.at(dense, block_id * 64 + acpos[:n_ac], acval[:n_ac])
    np.add.at(dense, exc[:, 0].astype(np.int64), exc[:, 1])
    dense[::64] += dc
    return dense


def _check_payload_pair(data):
    r1 = ns.decode_image_sparse(data)
    r2 = ns.decode_image_sparse2(data)
    assert r1 is not None and r2 is not None
    p1, _f, geo, _q, _a = r1
    p2 = r2[0]
    bpm = sum(c.h * c.v for c in geo.components)
    nb = geo.mcus_per_line * geo.mcus_per_column * bpm
    assert np.array_equal(_densify_v1(p1, nb), _densify_v2(p2, nb))
    # the point of v2: meaningfully fewer wire bytes
    assert p2.nbytes < 0.75 * p1.nbytes
    return p1.nbytes, p2.nbytes


@pytest.mark.parametrize("sub", ["444", "422", "420"])
@pytest.mark.parametrize("interval", [0, 7])
def test_payload_equivalence(rgb, sub, interval):
    data = jt.encode_rgb(rgb, 80, subsampling=sub, restart_interval=interval)
    _check_payload_pair(data)


def test_payload_equivalence_gray(rng):
    g = rng.integers(0, 256, (190, 257), dtype=np.uint8)
    _check_payload_pair(jt.encode_gray(g, 85))


def test_exception_path_high_quality(rgb):
    """q95 4:4:4 produces |AC| > 127 values (measured ~0.5% density on
    natural images): the clamp + residual exception machinery must
    reproduce them exactly."""
    data = jt.encode_rgb(rgb, 95, subsampling="444")
    r2 = ns.decode_image_sparse2(data)
    assert r2 is not None
    payload, _f, geo, _q, _a = r2
    bpm = sum(c.h * c.v for c in geo.components)
    nb = geo.mcus_per_line * geo.mcus_per_column * bpm
    k = payload.shape[0]
    bn = (k - 3 * nb) * 8 // 17
    be = bn // 64
    exc = payload[3 * nb + 2 * bn :].view(np.int32).reshape(be, 2)
    assert np.any(exc[:, 1] != 0), "expected |AC|>127 exceptions at q95"
    _check_payload_pair(data)


def test_host_reconstruction_matches_staged(rgb):
    data = jt.encode_rgb(rgb, 80, restart_interval=5)
    r2 = jt.decode(data, sparse_direct=True)
    assert r2.packed_mcu2 is not None
    staged = jt.decode(data)
    for ci in staged.coefficients:
        assert np.array_equal(r2.coefficients[ci], staged.coefficients[ci])
    assert np.array_equal(r2.to_rgb8(), staged.to_rgb8())


def test_device_transform_parity(rgb):
    jax = pytest.importorskip("jax")
    data = jt.encode_rgb(rgb, 80)
    r2 = jt.decode(data, sparse_direct=True)
    assert r2.packed_mcu2 is not None
    os.environ["JPX_WIRE"] = "1"
    try:
        r1 = jt.decode(data, sparse_direct=True)
    finally:
        del os.environ["JPX_WIRE"]
    assert r1.packed_mcu is not None and r1.packed_mcu2 is None
    a = np.asarray(r1.to_rgb8_device())
    b = np.asarray(r2.to_rgb8_device())
    assert np.array_equal(a, b)
    # scaled thumbnail program rides the same payload
    a8 = np.asarray(r1.to_rgb8_device(scale=0.5))
    b8 = np.asarray(r2.to_rgb8_device(scale=0.5))
    assert np.array_equal(a8, b8)


def test_grouped_stream_parity(rgb):
    pytest.importorskip("jax")
    from jpeglibrary_tpu.parallel.batch import decode_stream_rgb

    datas = [
        jt.encode_rgb(rgb, 80),
        jt.encode_rgb(rgb[::-1].copy(), 80),
        jt.encode_rgb(rgb[:, ::-1].copy(), 80),
    ]
    v2 = [np.asarray(x) for x in decode_stream_rgb(datas, group=3)]
    os.environ["JPX_WIRE"] = "1"
    try:
        v1 = [np.asarray(x) for x in decode_stream_rgb(datas, group=3)]
    finally:
        del os.environ["JPX_WIRE"]
    for a, b in zip(v1, v2):
        assert np.array_equal(a, b)


def test_fuzz_differential(rng, rgb):
    """Randomized content sweep: v1 and v2 payloads must densify
    identically for arbitrary natural-ish and noise content across
    subsampling/restart shapes."""
    for i in range(12):
        h = int(rng.integers(17, 200))
        w = int(rng.integers(17, 200))
        if i % 3 == 0:
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)  # noise
        else:
            img = np.clip(
                np.linspace(0, 255, w)[None, :, None]
                + rng.normal(0, 40, (h, w, 3)),
                0,
                255,
            ).astype(np.uint8)
        sub = ["444", "422", "420"][i % 3]
        ri = [0, 1, 3, 11][i % 4]
        q = [60, 75, 90, 97][i % 4]
        data = jt.encode_rgb(img, q, subsampling=sub, restart_interval=ri)
        _check_payload_pair(data)


def test_global_batch_rebucket_mixed_content(rng):
    """decode_batch_rgb_global on the v2 wire: images with DIFFERENT
    AC buckets (smooth vs noise content) re-bucket to one shared width
    (stream offsets move with Bn — naive zero-padding would corrupt
    the layout) and every image decodes bit-identically to its
    single-image decode."""
    jax = pytest.importorskip("jax")
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device test mesh")
    from jpeglibrary_tpu.parallel import decode_batch_rgb_global
    from jpeglibrary_tpu.native import scanner as ns

    h, w = 64, 96
    smooth = np.clip(
        np.linspace(0, 255, w)[None, :, None] + rng.normal(0, 4, (h, w, 3)),
        0, 255,
    ).astype(np.uint8)
    noise = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    datas = [jt.encode_rgb(smooth, 60), jt.encode_rgb(noise, 95)] * 4
    r_a = jt.decode(datas[0], sparse_direct=True)
    r_b = jt.decode(datas[1], sparse_direct=True)
    assert r_a.packed_mcu2 is not None and r_b.packed_mcu2 is not None
    assert r_a.packed_mcu2.shape != r_b.packed_mcu2.shape  # rebucketing real
    batch = decode_batch_rgb_global(datas)
    jax.block_until_ready(batch)
    for i, d in enumerate(datas):
        ref = jt.decode(d).to_rgb8()
        got = np.moveaxis(np.asarray(batch[i]), 0, -1)
        assert np.array_equal(got, ref), i


def test_stripe_splitter_v2(rng, rgb):
    """split_payload2_stripes: each stripe's v2 payload must densify to
    exactly the corresponding block rows of the whole payload (incl.
    the |AC|>127 exceptions landing in the right stripe, rebased)."""
    from jpeglibrary_tpu.models.streaming import split_payload2_stripes

    data = jt.encode_rgb(rgb, 95, subsampling="444")  # exceptions present
    res = jt.decode(data, sparse_direct=True)
    assert res.packed_mcu2 is not None
    geo = res.geometry
    bpm = sum(c.h * c.v for c in geo.components)
    nb = geo.mcus_per_line * geo.mcus_per_column * bpm
    whole = _densify_v2(res.packed_mcu2, nb)
    stripes, _geo, _q, heights = split_payload2_stripes(res, 3)
    bpr = geo.mcus_per_line * bpm
    nb_stripe = 3 * bpr
    for i in range(stripes.shape[0]):
        got = _densify_v2(stripes[i], nb_stripe)
        b_lo = i * nb_stripe
        n = min(nb_stripe, nb - b_lo) * 64
        assert np.array_equal(got[:n], whole[b_lo * 64 : b_lo * 64 + n]), i
        assert not got[n:].any()


def test_staged_path_v2(rng):
    """Streams the fused whole-image walk declines (DNL deferred
    height) still get the v2 wire via the per-scan merged decode, with
    JPX_WIRE=1 pinning v1 there too."""
    from jpeglibrary_tpu.models.encoder import encode_rgb_stripes

    img = np.clip(
        np.linspace(0, 255, 96)[None, :, None] + rng.normal(0, 25, (80, 96, 3)),
        0, 255,
    ).astype(np.uint8)
    data = encode_rgb_stripes(iter([img[:32], img[32:64], img[64:]]), 96, 80)
    r = jt.decode(data, sparse_direct=True)
    assert r.packed_mcu2 is not None and r.packed_mcu is None
    ref = jt.decode(data)
    for c in ref.coefficients:
        assert np.array_equal(r.coefficients[c], ref.coefficients[c]), c
    os.environ["JPX_WIRE"] = "1"
    try:
        r1 = jt.decode(data, sparse_direct=True)
    finally:
        del os.environ["JPX_WIRE"]
    assert r1.packed_mcu is not None and r1.packed_mcu2 is None
