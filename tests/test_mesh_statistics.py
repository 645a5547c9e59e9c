"""Distributed 2-pass encoder statistics: the device/psum histogram
path (parallel.sharding.mesh_symbol_frequencies + full_step) must be
bit-identical to the host gather (ops.encode_stage
.dc_ac_symbol_frequencies) — the SURVEY §2.4 comm-backend requirement,
mirroring JpegEncoder.GatherBlockStatistics (JpegEncoder.cs:551-601)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import jpeglibrary_tpu as jt
from jpeglibrary_tpu.ops import encode_stage


def _real_blocks(assets_dir, rel="baseline/lake.jpg"):
    """Per-component MCU-ordered quantized blocks from a real image."""
    r = jt.decode((assets_dir / rel).read_bytes())
    out = []
    for c in r.geometry.components:
        out.append(
            encode_stage.mcu_order_blocks(r.coefficients[c.component_index], c.h, c.v)
        )
    return out


def test_device_histograms_match_host(assets_dir):
    for blocks in _real_blocks(assets_dir):
        dc_ref, ac_ref = encode_stage.dc_ac_symbol_frequencies(blocks)
        dc_dev, ac_dev = jax.jit(
            lambda b: encode_stage.symbol_histograms_device(b, jnp)
        )(blocks[None].astype(np.int32))
        np.testing.assert_array_equal(dc_ref, np.asarray(dc_dev).astype(np.int64))
        np.testing.assert_array_equal(ac_ref, np.asarray(ac_dev).astype(np.int64))


def test_device_histograms_masking():
    """Zero-padded blocks beyond n_valid must contribute nothing."""
    rng = np.random.default_rng(3)
    blocks = rng.integers(-300, 300, size=(97, 64), dtype=np.int32)
    dc_ref, ac_ref = encode_stage.dc_ac_symbol_frequencies(blocks)
    padded = np.zeros((1, 104, 64), dtype=np.int32)
    padded[0, :97] = blocks
    dc_dev, ac_dev = jax.jit(
        lambda b, nv: encode_stage.symbol_histograms_device(b, jnp, n_valid=nv)
    )(padded, jnp.asarray([97]))
    np.testing.assert_array_equal(dc_ref, np.asarray(dc_dev).astype(np.int64))
    np.testing.assert_array_equal(ac_ref, np.asarray(ac_dev).astype(np.int64))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_mesh_symbol_frequencies_match_host(assets_dir):
    from jpeglibrary_tpu.parallel.sharding import make_mesh, mesh_symbol_frequencies

    mesh = make_mesh(8, stripe=1)
    for blocks in _real_blocks(assets_dir):
        dc_ref, ac_ref = encode_stage.dc_ac_symbol_frequencies(blocks)
        dc, ac = mesh_symbol_frequencies(blocks, mesh)
        np.testing.assert_array_equal(dc_ref, dc)
        np.testing.assert_array_equal(ac_ref, ac)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_encoder_mesh_statistics_byte_identical(assets_dir):
    """2-pass optimize-coding encode with mesh statistics produces the
    exact same JPEG bytes as the host-statistics encode."""
    from jpeglibrary_tpu.models.encoder import JpegEncoder, encode_rgb
    from jpeglibrary_tpu.parallel.sharding import make_mesh

    rgb = jt.decode((assets_dir / "baseline/lake.jpg").read_bytes()).to_rgb8()

    def enc(mesh):
        import jpeglibrary_tpu.models.encoder as enc_mod

        e = JpegEncoder()
        e.mesh = mesh
        from jpeglibrary_tpu.syntax.quantization import (
            scale_by_quality,
            standard_chrominance_table,
            standard_luminance_table,
        )

        e.set_quantization_table(scale_by_quality(standard_luminance_table(0), 75))
        e.set_quantization_table(scale_by_quality(standard_chrominance_table(1), 75))
        for is_dc in (True, False):
            e.set_huffman_table(is_dc, 0)
            e.set_huffman_table(is_dc, 1)
        e.add_component(1, 0, 0, 0, 2, 2)
        e.add_component(2, 1, 1, 1, 1, 1)
        e.add_component(3, 1, 1, 1, 1, 1)
        from jpeglibrary_tpu.ops import color as color_ops

        y, cb, cr = color_ops.rgb_to_ycbcr(rgb[..., 0], rgb[..., 1], rgb[..., 2])
        e.set_input([y, cb, cr])
        return e.encode()

    host = enc(None)
    mesh = enc(make_mesh(8, stripe=1))
    assert host == mesh


def test_full_step_histograms_are_true_symbol_stats():
    """full_step's luma histograms must equal the host symbol gather
    applied to the requantized coefficients it returns."""
    import sys

    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    rgb, requant_y, hists = jax.jit(fn)(*args)
    requant_y = np.asarray(requant_y)
    dc_sum = np.zeros(256, dtype=np.int64)
    ac_sum = np.zeros(256, dtype=np.int64)
    for img in requant_y:
        blocks = encode_stage.mcu_order_blocks(img, 2, 2)
        dc, ac = encode_stage.dc_ac_symbol_frequencies(blocks)
        dc_sum += dc
        ac_sum += ac
    np.testing.assert_array_equal(dc_sum, np.asarray(hists[0]).astype(np.int64))
    np.testing.assert_array_equal(ac_sum, np.asarray(hists[1]).astype(np.int64))
