"""Fuzz the fused native decode path (container walk + table build +
scan in C) against mutated/truncated streams: it must never crash, and
for every input either fall back cleanly, raise the same error family
as the general path, or produce the identical result."""

import numpy as np
import pytest

import jpeglibrary_tpu as jt
from jpeglibrary_tpu.models.decoder import JpegDecoder


@pytest.fixture(scope="module")
def native_lib():
    from jpeglibrary_tpu.native import build

    try:
        return build.load_library()
    except ImportError as exc:
        pytest.skip(f"native scanner unavailable: {exc}")


def _decode_outcome(data, **kw):
    d = JpegDecoder()
    d.set_input(data)
    try:
        res = d.decode(**kw)
        coeffs = (
            {k: v.copy() for k, v in res.coefficients.items()}
            if res.coefficients is not None
            else None
        )
        return ("ok", coeffs)
    except Exception as exc:
        return ("err", type(exc).__name__)


def test_fuzz_truncations(native_lib, assets_dir):
    data = (assets_dir / "baseline/lake.jpg").read_bytes()
    rng = np.random.default_rng(1)
    for _ in range(40):
        cut = int(rng.integers(2, len(data)))
        mutated = data[:cut]
        kind_f, out_f = _decode_outcome(mutated, sparse_direct=True)
        kind_d, out_d = _decode_outcome(mutated, sparse_direct=False)
        # same success/failure disposition; identical coefficients on success
        assert kind_f == kind_d, (cut, kind_f, out_f, kind_d, out_d)
        if kind_f == "ok" and out_f is not None and out_d is not None:
            for k in out_d:
                np.testing.assert_array_equal(out_f[k], out_d[k])


def test_fuzz_byte_flips(native_lib, assets_dir):
    data = bytearray((assets_dir / "baseline/lake.jpg").read_bytes())
    rng = np.random.default_rng(2)
    agree = 0
    for _ in range(60):
        mutated = bytearray(data)
        for _ in range(int(rng.integers(1, 4))):
            pos = int(rng.integers(2, len(mutated)))
            mutated[pos] = int(rng.integers(0, 256))
        mutated = bytes(mutated)
        kind_f, out_f = _decode_outcome(mutated, sparse_direct=True)
        kind_d, out_d = _decode_outcome(mutated, sparse_direct=False)
        # Both paths must survive; dispositions may differ only in
        # which error they raise for corrupt entropy data, never in
        # ok-vs-error or in decoded coefficients.
        assert kind_f == kind_d, (kind_f, out_f, kind_d, out_d)
        if kind_f == "ok" and out_f is not None and out_d is not None:
            for k in out_d:
                np.testing.assert_array_equal(out_f[k], out_d[k])
            agree += 1
    assert agree > 0  # some mutations must still decode


def test_fuzz_random_garbage(native_lib):
    rng = np.random.default_rng(3)
    for _ in range(40):
        n = int(rng.integers(0, 4096))
        blob = bytes(rng.integers(0, 256, size=n, dtype=np.uint8))
        _decode_outcome(blob, sparse_direct=True)  # must not crash
        # bias toward plausible container starts
        _decode_outcome(b"\xff\xd8" + blob, sparse_direct=True)


def test_infeasible_dht_counts_no_crash(native_lib):
    """A corrupt DHT count that stays within the segment but is
    canonically infeasible (e.g. 186 codes of one short length) made
    the fused walk's lookahead fill write far past the table — a
    segfault found by an extended fuzz sweep. The native walk must
    reject the table and agree with the pure decoder's error."""
    import jpeglibrary_tpu as jt

    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    data = bytearray(jt.encode_rgb(rgb, 80, restart_interval=8))
    # find the DHT segment and inflate the first count byte
    from jpeglibrary_tpu.io.reader import parse_stream

    for seg in parse_stream(bytes(data)).segments:
        if seg.marker == 0xC4:
            data[seg.payload_start + 3] ^= 0xBB  # a BITS count
            break
    kind_f, _ = _decode_outcome(bytes(data), sparse_direct=True)
    kind_d, _ = _decode_outcome(bytes(data), sparse_direct=False)
    kind_p = None
    from jpeglibrary_tpu.models.decoder import JpegDecoder

    d = JpegDecoder()
    d.set_input(bytes(data))
    try:
        d.decode(use_native=False)
        kind_p = "ok"
    except Exception:
        kind_p = "err"
    assert kind_f == kind_d == kind_p


def _rgb8_outcome(fn):
    try:
        return ("ok", fn())
    except Exception as exc:
        return ("err", type(exc).__name__)


def test_fuzz_decode_rgb8_one_call(native_lib, assets_dir):
    """The round-4 one-call fused decode (jpx_decode_rgb_fused) must
    match the staged scan+transform path on mutated/truncated restart
    streams: identical RGB on success, same error family on failure,
    and never a crash."""
    rgb0 = jt.decode((assets_dir / "baseline/lake.jpg").read_bytes()).to_rgb8()
    base = jt.encode_rgb(rgb0[:256, :320], 85, restart_interval=4)
    rng = np.random.default_rng(7)
    checked_ok = 0
    for i in range(120):
        mutated = bytearray(base)
        if i % 3 == 0:
            mutated = mutated[: int(rng.integers(2, len(mutated)))]
        else:
            for _ in range(int(rng.integers(1, 4))):
                pos = int(rng.integers(2, len(mutated)))
                mutated[pos] ^= 1 << int(rng.integers(0, 8))
        mutated = bytes(mutated)
        kind_f, out_f = _rgb8_outcome(lambda: jt.decode_rgb8(mutated))
        kind_s, out_s = _rgb8_outcome(lambda: jt.decode(mutated).to_rgb8())
        assert kind_f == kind_s, (i, kind_f, out_f if kind_f == "err" else "",
                                  kind_s, out_s if kind_s == "err" else "")
        if kind_f == "ok":
            np.testing.assert_array_equal(out_f, out_s)
            checked_ok += 1
        else:
            assert out_f == out_s, (i, out_f, out_s)
    assert checked_ok >= 3  # corpus sanity: some mutations must decode


def test_fuzz_transform_rot90(native_lib, assets_dir):
    """jpx_zz_block_permute rides inside jt.transform: mutated inputs
    must either transform successfully (and the output re-decode) or
    raise cleanly — never crash."""
    rgb0 = jt.decode((assets_dir / "baseline/lake.jpg").read_bytes()).to_rgb8()
    base = jt.encode_rgb(rgb0[:128, :160], 85)
    rng = np.random.default_rng(8)
    n_ok = 0
    for i in range(60):
        mutated = bytearray(base)
        for _ in range(int(rng.integers(1, 3))):
            pos = int(rng.integers(2, len(mutated)))
            mutated[pos] ^= 1 << int(rng.integers(0, 8))
        try:
            out = jt.transform(bytes(mutated), "rot90")
        except Exception:
            continue
        jt.decode(out).to_rgb8()  # output must be decodable
        n_ok += 1
    assert n_ok >= 3


def test_fuzz_truncations_restart_stream(native_lib, assets_dir):
    """Truncations of a RESTART stream (round-5 fuzz finding: a stream
    truncated to its first surviving span made the sparse single-span
    branch decode the WHOLE image's MCU budget from it — running into
    the 1-padding and raising where the dense per-span task list
    tolerates the truncation). Disposition and coefficients must match
    the dense path for every cut."""
    from jpeglibrary_tpu.models.encoder import encode_rgb

    rgb = jt.decode((assets_dir / "baseline/lake.jpg").read_bytes()).to_rgb8()
    data = encode_rgb(rgb[:200, :300], 75, restart_interval=3)
    rng = np.random.default_rng(2)
    cuts = [int(rng.integers(2, len(data))) for _ in range(40)]
    # the exact shape of the round-5 finding: cut just past an RSTn
    cuts += [data.find(b"\xff\xd0") + 2]
    for cut in cuts:
        mutated = data[:cut]
        kind_f, out_f = _decode_outcome(mutated, sparse_direct=True)
        kind_d, out_d = _decode_outcome(mutated, sparse_direct=False)
        assert kind_f == kind_d, (cut, kind_f, out_f, kind_d, out_d)
        if kind_f == "ok" and out_f is not None and out_d is not None:
            for k in out_d:
                np.testing.assert_array_equal(out_f[k], out_d[k])
