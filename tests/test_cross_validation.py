"""Cross-validation against libjpeg (via PIL): a parameter grid of
independently produced JPEGs must decode to the same pixels within IDCT
rounding tolerance.

Two legitimate, bounded divergences exist:

- IDCT rounding: our IDCT is bit-exact to the REFERENCE's float AAN
  dataflow (ops/dct.py); libjpeg's islow integer IDCT rounds
  differently -> per-sample +-1, rarely 3 at sharp edges.
- Chroma upsampling: libjpeg defaults to "fancy" (triangular)
  upsampling; this framework reproduces the reference's DUPLICATION
  upsample (JpegBlockAllocator.Flush / PartialScanlineAllocator,
  PARITY.md #19-20). On 4:2:0/4:2:2 content the two filters differ by
  design, concentrated at chroma edges (tens of levels at a hard
  edge), so subsampled cases get edge-shaped tolerances while 4:4:4
  and grayscale are held to IDCT-rounding tightness.

Anything beyond these bounds flags a real defect (wrong dequant,
predictor, upsample phase, color constants...). The committed golden
fixtures pin bit-exactness vs the reference; this grid pins behavior on
arbitrary third-party streams.
"""

import io

import numpy as np
import pytest

import jpeglibrary_tpu as jt

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _scene(h, w, seed=0):
    """Mixed-content test card: gradients + texture + sharp edges."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    r = (xx * 255 / max(w - 1, 1)).astype(np.float64)
    g = (yy * 255 / max(h - 1, 1)).astype(np.float64)
    b = 128 + 96 * np.sin(xx / 7.0) * np.cos(yy / 5.0)
    img = np.stack([r, g, b], axis=-1)
    img += rng.normal(0, 6, img.shape)
    img[h // 3 : h // 3 + 4, :, :] = 255  # horizontal edge
    img[:, w // 4 : w // 4 + 3, :] = 0    # vertical edge
    return np.clip(img, 0, 255).astype(np.uint8)


def _pil_bytes(arr, **save_kwargs):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", **save_kwargs)
    return buf.getvalue()


def _assert_close(ours, theirs, context, subsampled=False):
    diff = np.abs(ours.astype(np.int32) - theirs.astype(np.int32))
    if subsampled:
        # Duplication-vs-fancy upsampling: big only at chroma edges.
        assert diff.mean() <= 4.0, (context, diff.mean())
        assert np.percentile(diff, 99) <= 24, (context,)
        assert diff.max() <= 80, (context, diff.max())
    else:
        # IDCT rounding only.
        assert diff.max() <= 3, (context, diff.max())
        assert diff.mean() <= 0.2, (context, diff.mean())


GRID = [
    # (quality, subsampling, progressive, restart, size)
    (95, 0, False, 0, (64, 80)),      # 4:4:4
    (75, 1, False, 0, (56, 72)),      # 4:2:2
    (75, 2, False, 0, (120, 136)),    # 4:2:0
    (50, 2, False, 8, (77, 93)),      # odd size + restarts
    (30, 2, False, 0, (48, 48)),      # heavy quantization
    (85, 2, True, 0, (96, 112)),      # progressive
    (60, 0, True, 4, (41, 67)),       # progressive 4:4:4 + restarts + odd
    (92, 1, True, 0, (80, 64)),       # progressive 4:2:2
]


@pytest.mark.parametrize("quality,subsampling,progressive,restart,size", GRID)
def test_pil_grid_agrees(quality, subsampling, progressive, restart, size):
    h, w = size
    img = _scene(h, w, seed=quality + restart)
    kwargs = dict(quality=quality, subsampling=subsampling)
    if progressive:
        kwargs["progressive"] = True
    if restart:
        kwargs["restart_marker_blocks"] = restart
    try:
        data = _pil_bytes(img, **kwargs)
    except TypeError:
        # Older PIL without restart_marker_blocks: skip the restart dims
        kwargs.pop("restart_marker_blocks", None)
        data = _pil_bytes(img, **kwargs)

    ours = jt.decode(data).to_rgb8()
    theirs = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    _assert_close(ours, theirs, (quality, subsampling, progressive, restart),
                  subsampled=subsampling != 0)


def test_pil_grayscale_agrees():
    img = _scene(70, 66, seed=9)[..., 0]
    data = _pil_bytes(img, quality=80)
    ours = jt.decode(data).to_uint8()[..., 0]
    theirs = np.asarray(Image.open(io.BytesIO(data)).convert("L"))
    _assert_close(ours, theirs, "grayscale")


def test_pil_decodes_our_encoder_grid():
    """The reverse direction: libjpeg must read OUR streams and agree."""
    img = _scene(88, 104, seed=17)
    for quality, optimize in ((75, False), (90, True)):
        data = jt.encode_rgb(img, quality, optimize_coding=optimize)
        theirs = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        ours = jt.decode(data).to_rgb8()
        _assert_close(ours, theirs, ("encode", quality, optimize),
                      subsampled=True)  # encode_rgb default 4:2:0


def test_pil_decodes_our_progressive_and_transcodes():
    img = _scene(72, 96, seed=23)
    from jpeglibrary_tpu.models.progressive_encoder import encode_progressive_rgb

    prog = encode_progressive_rgb(img, 80)
    theirs = np.asarray(Image.open(io.BytesIO(prog)).convert("RGB"))
    ours = jt.decode(prog).to_rgb8()
    _assert_close(ours, theirs, "progressive encoder", subsampled=True)

    # Transcoded streams must keep pixel identity THROUGH libjpeg too.
    base = jt.encode_rgb(img, 70)
    opt = jt.transcode(base, "optimal")
    a = np.asarray(Image.open(io.BytesIO(base)).convert("RGB"))
    b = np.asarray(Image.open(io.BytesIO(opt)).convert("RGB"))
    np.testing.assert_array_equal(a, b)


class TestFancyUpsampling:
    """to_rgb8(upsample="fancy") is bit-exact to libjpeg's default
    triangular filter, so subsampled streams cross-validate at
    IDCT-rounding tightness — no upsample-divergence tolerance."""

    @pytest.mark.parametrize("subsampling", [0, 1, 2])
    def test_matches_pil_tight(self, subsampling):
        img = _scene(120, 136, seed=7)
        data = _pil_bytes(img, quality=75, subsampling=subsampling)
        theirs = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        ours = jt.decode(data).to_rgb8(upsample="fancy")
        diff = np.abs(ours.astype(np.int32) - theirs.astype(np.int32))
        assert diff.max() <= 3 and diff.mean() <= 0.2

    def test_progressive_matches_pil_tight(self):
        img = _scene(96, 112, seed=8)
        data = _pil_bytes(img, quality=85, subsampling=2, progressive=True)
        theirs = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        ours = jt.decode(data).to_rgb8(upsample="fancy")
        diff = np.abs(ours.astype(np.int32) - theirs.astype(np.int32))
        assert diff.max() <= 3 and diff.mean() <= 0.2

    def test_444_identical_to_duplicate(self):
        # No subsampling -> the filter never runs: both modes must be
        # byte-identical (fancy only changes chroma interpolation).
        img = _scene(64, 72, seed=9)
        data = _pil_bytes(img, quality=80, subsampling=0)
        r = jt.decode(data)
        assert np.array_equal(
            r.to_rgb8(upsample="fancy"), r.to_rgb8(upsample="duplicate")
        )

    def test_odd_dimensions(self):
        img = _scene(77, 93, seed=10)
        data = _pil_bytes(img, quality=70, subsampling=2)
        theirs = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        ours = jt.decode(data).to_rgb8(upsample="fancy")
        diff = np.abs(ours.astype(np.int32) - theirs.astype(np.int32))
        assert diff.max() <= 3

    def test_unknown_mode_rejected(self):
        img = _scene(16, 16, seed=11)
        data = _pil_bytes(img, quality=80)
        with pytest.raises(ValueError):
            jt.decode(data).to_rgb8(upsample="bicubic")

    def test_device_path_matches_host(self):
        # The fused device transform's fancy variant must agree with
        # the host writer exactly (same integer ops, XLA-fused).
        img = _scene(80, 96, seed=12)
        data = _pil_bytes(img, quality=75, subsampling=2)
        r = jt.decode(data)
        host = r.to_rgb8(upsample="fancy")
        dev = np.moveaxis(
            np.asarray(r.to_rgb8_device(sparse=True, upsample="fancy")), 0, -1
        )
        assert np.array_equal(host, dev)
