"""APPn/COM marker extension hooks: the registry equivalent of the
reference's protected virtual ProcessMarkerForDecode /
ProcessMarkerForIdentification (JpegDecoder.cs:114, :558), plus the
optimizer's keep-predicate refinement of Optimize(strip)."""

import numpy as np
import pytest

import jpeglibrary_tpu as jt
from jpeglibrary_tpu.models.decoder import JpegDecoder
from jpeglibrary_tpu.syntax.markers import Marker


def _with_metadata(assets_dir):
    """lake.jpg re-encoded with an APP1 (EXIF-style) and a COM segment
    spliced in after SOI."""
    data = (assets_dir / "baseline/lake.jpg").read_bytes()
    assert data[:2] == b"\xff\xd8"
    app1_payload = b"Exif\x00\x00fake-exif-body"
    com_payload = b"a comment"

    def seg(marker, payload):
        length = len(payload) + 2
        return bytes([0xFF, marker, length >> 8, length & 0xFF]) + payload

    return (
        data[:2]
        + seg(Marker.APP1, app1_payload)
        + seg(Marker.COM, com_payload)
        + data[2:],
        app1_payload,
        com_payload,
    )


def test_decode_marker_hook_receives_app1(assets_dir):
    data, app1, com = _with_metadata(assets_dir)
    seen = []
    dec = JpegDecoder()
    dec.register_marker_handler(Marker.APP1, lambda m, p, off: seen.append((m, p, off)))
    dec.register_marker_handler(Marker.COM, lambda m, p, off: seen.append((m, p, off)))
    dec.set_input(data)
    res = dec.decode()
    assert (Marker.APP1, app1, 2) in seen
    assert [p for m, p, _ in seen if m == Marker.COM] == [com]
    # pixels unaffected by the metadata
    ref = jt.decode((assets_dir / "baseline/lake.jpg").read_bytes())
    np.testing.assert_array_equal(res.to_rgb8(), ref.to_rgb8())


def test_identify_marker_hook(assets_dir):
    data, app1, _ = _with_metadata(assets_dir)
    seen = []
    dec = JpegDecoder()
    dec.register_marker_handler(Marker.APP1, lambda m, p, off: seen.append(p))
    dec.set_input(data)
    info = dec.identify()
    # lake.jpg carries its own APP1 EXIF; our spliced one must be among
    # the payloads delivered.
    assert app1 in seen
    assert info.width == 1024


def test_optimizer_keep_predicate(assets_dir):
    from jpeglibrary_tpu.models.optimizer import JpegOptimizer

    data, app1, com = _with_metadata(assets_dir)

    def run(strip, keep=None):
        opt = JpegOptimizer()
        opt.set_input(data)
        opt.scan()
        return opt.optimize(strip=strip, keep=keep)

    stripped = run(True)
    kept = run(False)
    selective = run(True, keep=lambda m, p: m == Marker.APP1)

    assert app1 not in stripped and com not in stripped
    assert app1 in kept and com in kept
    assert app1 in selective and com not in selective
    # all three decode to identical pixels
    ref = jt.decode(data).to_rgb8()
    for out in (stripped, kept, selective):
        np.testing.assert_array_equal(jt.decode(out).to_rgb8(), ref)
