"""Differential fuzzing of the NON-baseline native scanners against
their pure-Python twins (the baseline fused path has its own harness,
tests/test_fuzz_fused.py): progressive, lossless, and arithmetic
streams, mutated by truncation / byte flips / garbage, must never
crash either path, must agree on ok-vs-error disposition, and must
produce identical planes on success — exactly where threaded C++ with
corrupt inputs would otherwise diverge silently."""

import io

import numpy as np
import pytest

from jpeglibrary_tpu.models.decoder import JpegDecoder


@pytest.fixture(scope="module")
def native_lib():
    from jpeglibrary_tpu.native import build

    try:
        return build.load_library()
    except ImportError as exc:
        pytest.skip(f"native scanner unavailable: {exc}")


@pytest.fixture(scope="module")
def small_rgb():
    rng = np.random.default_rng(7)
    base = rng.integers(0, 64, (8, 8, 3), dtype=np.uint8)
    img = np.kron(base, np.ones((10, 9, 1), dtype=np.uint8))  # smooth 80x72
    return (img + rng.integers(0, 8, img.shape, dtype=np.uint8)).astype(np.uint8)


def _make_streams(small_rgb):
    """One small asset per scanner family (restart + no-restart where
    the native path threads differently)."""
    from PIL import Image

    from jpeglibrary_tpu.models.arithmetic_lossless import (
        encode_lossless_arithmetic,
    )
    from jpeglibrary_tpu.models.encoder import encode_rgb
    from jpeglibrary_tpu.models.lossless import encode_lossless
    from jpeglibrary_tpu.models.progressive_encoder import encode_progressive_rgb

    buf = io.BytesIO()
    Image.fromarray(small_rgb).save(
        buf, "JPEG", quality=80, progressive=True, subsampling=2
    )
    return {
        "progressive": encode_progressive_rgb(small_rgb, 80, restart_interval=4),
        "progressive_pil": buf.getvalue(),
        "lossless": encode_lossless(small_rgb, predictor=4),
        "lossless_restart": encode_lossless(
            small_rgb, predictor=6, restart_interval=16
        ),
        "arithmetic": encode_rgb(small_rgb, 80, arithmetic=True),
        "arithmetic_restart": encode_rgb(
            small_rgb, 80, arithmetic=True, restart_interval=4
        ),
        "arith_lossless": encode_lossless_arithmetic(
            small_rgb.astype(np.int32), predictor=4
        ),
        "arith_lossless_restart": encode_lossless_arithmetic(
            small_rgb.astype(np.int32), predictor=6, restart_interval=16
        ),
    }


def _outcome(data, use_native):
    d = JpegDecoder()
    d.set_input(data)
    try:
        res = d.decode(use_native=use_native)
        planes = res.coefficients if res.coefficients is not None else res.samples
        return ("ok", {k: v.copy() for k, v in planes.items()})
    except Exception as exc:
        return ("err", type(exc).__name__)


def _check_agreement(mutated, context):
    kind_n, out_n = _outcome(mutated, True)
    kind_p, out_p = _outcome(mutated, False)
    assert kind_n == kind_p, (context, kind_n, out_n, kind_p, out_p)
    if kind_n == "ok":
        for k in out_p:
            np.testing.assert_array_equal(out_n[k], out_p[k], err_msg=str(context))
    return kind_n


@pytest.fixture(scope="module")
def streams(native_lib, small_rgb):
    return _make_streams(small_rgb)


MODES = [
    "progressive",
    "progressive_pil",
    "lossless",
    "lossless_restart",
    "arithmetic",
    "arithmetic_restart",
    "arith_lossless",
    "arith_lossless_restart",
]


@pytest.mark.parametrize("mode", MODES)
def test_fuzz_truncations(streams, mode):
    data = streams[mode]
    rng = np.random.default_rng(11)
    for _ in range(20):
        cut = int(rng.integers(2, len(data)))
        _check_agreement(data[:cut], (mode, "trunc", cut))


@pytest.mark.parametrize("mode", MODES)
def test_fuzz_byte_flips(streams, mode):
    data = streams[mode]
    rng = np.random.default_rng(13)
    agree_ok = 0
    for i in range(30):
        mutated = bytearray(data)
        for _ in range(int(rng.integers(1, 4))):
            pos = int(rng.integers(2, len(mutated)))
            mutated[pos] = int(rng.integers(0, 256))
        if _check_agreement(bytes(mutated), (mode, "flip", i)) == "ok":
            agree_ok += 1
    assert agree_ok > 0  # some mutations must still decode


@pytest.mark.parametrize(
    "mode", ["progressive", "lossless", "arithmetic", "arith_lossless"]
)
def test_fuzz_garbage_ecs(streams, mode):
    """Replace the tail (entropy data) with random garbage: both paths
    must agree and never crash."""
    data = streams[mode]
    rng = np.random.default_rng(17)
    # find SOS and corrupt after it
    sos = data.find(b"\xff\xda")
    assert sos > 0
    head = data[: sos + 14]
    for i in range(12):
        tail = bytes(rng.integers(0, 256, size=int(rng.integers(8, 512)), dtype=np.uint8))
        _check_agreement(head + tail + b"\xff\xd9", (mode, "garbage", i))


def test_fabricated_marker_splits_span(streams):
    """A byte flip that fabricates a marker mid-ECS splits a span; both
    scanners must raise ("Expect restart marker.") rather than decode
    the fragments as restart segments (found by an extended fuzz sweep:
    the SOF11 restart-parallel path accepted the split)."""
    data = bytearray(bytes(streams["arith_lossless_restart"]))
    # Plant a fake RST-less marker inside the first entropy span: find a
    # non-FF, non-00 byte pair past the SOS and overwrite with FF D8
    # (SOI — never valid mid-scan).
    from jpeglibrary_tpu.io.reader import parse_stream

    st = parse_stream(bytes(data))
    sos_scan = st.scans[0] if hasattr(st, "scans") and st.scans else None
    span0 = (sos_scan.spans if sos_scan is not None else st.segments)[0]
    start = span0.start + 8
    data[start] = 0xFF
    data[start + 1] = 0xC4  # DHT marker fabricated mid-span
    kind_n = _outcome(bytes(data), True)[0]
    kind_p = _outcome(bytes(data), False)[0]
    assert kind_n == kind_p == "err"


def test_fuzz_region_banded_paths(assets_dir):
    """Round-4 banded region fast paths (SOF2/SOF9/SOF3) on mutated
    streams: never crash, and whenever the FULL decode succeeds the
    tile must equal its crop exactly (corruption outside the covered
    spans may legitimately make the tile succeed where the full decode
    raises — that is the documented partial-decode semantics)."""
    import jpeglibrary_tpu as jt
    from jpeglibrary_tpu.models.progressive_encoder import encode_progressive_rgb

    rgb = jt.decode((assets_dir / "baseline/lake.jpg").read_bytes()).to_rgb8()
    small = rgb[:160, :224]
    streams = [
        encode_progressive_rgb(small, 85, restart_interval=6),
        jt.encode_rgb(small, 85, arithmetic=True, restart_interval=6),
        jt.encode_lossless(small, predictor=1, restart_interval=224),
    ]
    rng = np.random.default_rng(21)
    verified = 0
    for i in range(90):
        base = streams[i % len(streams)]
        m = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            m[int(rng.integers(2, len(m)))] ^= 1 << int(rng.integers(0, 8))
        m = bytes(m)
        try:
            full = jt.decode(m).to_rgb8()
        except Exception:
            try:
                jt.decode_region(m, 3, 4, 8, 8)  # may succeed or raise;
            except Exception:
                pass  # either way it must not crash the process
            continue
        # Rect inside the MUTATED stream's dimensions (a corrupt SOF
        # can shrink the frame; out-of-bounds rects raise by contract).
        hh, ww = full.shape[:2]
        x, y = int(rng.integers(0, max(1, ww - 1))), int(rng.integers(0, max(1, hh - 1)))
        w, h = int(rng.integers(1, ww - x + 1)), int(rng.integers(1, hh - y + 1))
        tile = jt.decode_region(m, x, y, w, h)
        np.testing.assert_array_equal(tile, full[y : y + h, x : x + w])
        verified += 1
    assert verified >= 5


def test_fuzz_optimizer_transcode_faithful(assets_dir):
    """Optimizer/transcoder on mutated streams: never crash, and
    whenever the INPUT decodes, the re-coded output must decode to
    identical pixels (a broken input may pass through faithfully —
    the transcoder only re-codes entropy, like the reference)."""
    import jpeglibrary_tpu as jt

    rgb = jt.decode((assets_dir / "baseline/lake.jpg").read_bytes()).to_rgb8()
    small = rgb[:128, :160]
    base = jt.encode_rgb(small, 85, restart_interval=5)
    rng = np.random.default_rng(31)
    verified = 0
    for i in range(80):
        m = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            m[int(rng.integers(2, len(m)))] ^= 1 << int(rng.integers(0, 8))
        m = bytes(m)
        fn = (lambda: jt.optimize(m)) if i % 2 else (
            lambda: jt.transcode(m, "optimized")
        )
        try:
            out = fn()
        except Exception:
            continue
        try:
            in_rgb = jt.decode(m).to_rgb8()
        except Exception:
            continue  # broken input passed through faithfully
        out_rgb = jt.decode(bytes(out)).to_rgb8()
        np.testing.assert_array_equal(in_rgb, out_rgb)
        verified += 1
    assert verified >= 5


def test_fuzz_hierarchical_never_crashes():
    """Hierarchical (Annex J) pyramids on mutated streams: every
    failure must be a canonical JPEG error family (a Kraft-infeasible
    DHT previously escaped as a raw uint16 OverflowError from the
    Python canonical-code builder)."""
    import jpeglibrary_tpu as jt
    from jpeglibrary_tpu.models.hierarchical import encode_hierarchical

    rng0 = np.random.default_rng(1)
    img = np.clip(
        np.linspace(0, 255, 96)[None, :, None] + rng0.normal(0, 20, (80, 96, 3)),
        0, 255,
    ).astype(np.uint8)
    streams = [
        encode_hierarchical(img, levels=2),
        encode_hierarchical(img, levels=2, base="dct", refinement="dct"),
        encode_hierarchical(img, levels=2, arithmetic=True),
    ]
    rng = np.random.default_rng(55)
    n_ok = 0
    for i in range(90):
        base = streams[i % len(streams)]
        m = bytearray(base)
        if i % 6 == 0:
            m = m[: int(rng.integers(2, len(m)))]
        else:
            for _ in range(int(rng.integers(1, 5))):
                m[int(rng.integers(2, len(m)))] ^= 1 << int(rng.integers(0, 8))
        try:
            jt.decode(bytes(m)).to_rgb8()
            n_ok += 1
        except Exception as e:
            name = type(e).__name__
            assert name.startswith("Jpeg") or name == "ValueError", (i, name)
    assert n_ok >= 5
